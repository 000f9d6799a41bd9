"""Loss tests against torch-CPU oracles transcribing the reference formulas."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from cmr_agent_tpu.ops import (
    focal_loss, circle_loss, softmax_cross_entropy, lovasz_hinge,
)


def _torch_focal(logits_bcn, target_bn, alpha, gamma=2.0, eps=1e-8):
    """Reference models/focal_loss.py:55-112 (kornia) in torch CPU."""
    input_soft = F.softmax(logits_bcn, dim=1) + eps
    shape = target_bn.shape
    one_hot = torch.zeros(shape[0], logits_bcn.shape[1], *shape[1:])
    one_hot = one_hot.scatter_(1, target_bn.unsqueeze(1), 1.0) + 1e-6
    weight = torch.pow(-input_soft + 1.0, gamma)
    focal = -alpha * weight * torch.log(input_soft)
    return torch.sum(one_hot * focal, dim=1).mean()


def test_focal_loss_matches_kornia_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 2, 37)).astype(np.float32)  # [B, C, N]
    labels = rng.integers(0, 2, size=(2, 37))
    want = _torch_focal(torch.tensor(logits), torch.tensor(labels), alpha=0.75)
    # ours is channels-last
    got = focal_loss(jnp.array(np.moveaxis(logits, 1, -1)),
                     jnp.array(labels), alpha=0.75)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _torch_circle(img_feat_bfn, pc_feat_bfn, dist_map, dist_thres=1.0,
                  pos_margin=0.1, neg_margin=1.4, log_scale=10.0):
    """Reference models/MultiHeadModel.py:141-178 in torch CPU."""
    mask = (dist_map <= dist_thres).float()
    pos_mask, neg_mask = mask, 1 - mask
    dists = torch.sqrt(torch.sum(
        (pc_feat_bfn.unsqueeze(-1) - img_feat_bfn.unsqueeze(-2)) ** 2, dim=1))
    pos = dists - 1e5 * neg_mask
    pos_weight = torch.clamp((pos - pos_margin).detach(), min=0)
    lse_pr = torch.logsumexp(log_scale * (pos - pos_margin) * pos_weight, dim=-1)
    lse_pc = torch.logsumexp(log_scale * (pos - pos_margin) * pos_weight, dim=-2)
    neg = dists + 1e5 * pos_mask
    neg_weight = torch.clamp((neg_margin - neg).detach(), min=0)
    lse_nr = torch.logsumexp(log_scale * (neg_margin - neg) * neg_weight, dim=-1)
    lse_nc = torch.logsumexp(log_scale * (neg_margin - neg) * neg_weight, dim=-2)
    loss_col = F.softplus(lse_pr + lse_nr) / log_scale
    loss_row = F.softplus(lse_pc + lse_nc) / log_scale
    return torch.mean(loss_col + loss_row)


def test_circle_loss_matches_reference():
    rng = np.random.default_rng(1)
    n, f = 24, 8
    img = rng.normal(size=(2, f, n)).astype(np.float32)
    pc = rng.normal(size=(2, f, n)).astype(np.float32)
    img = img / np.linalg.norm(img, axis=1, keepdims=True)
    pc = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    dmap = np.abs(rng.normal(size=(2, n, n)) * 2).astype(np.float32)
    want = _torch_circle(torch.tensor(img), torch.tensor(pc), torch.tensor(dmap))
    got, dists = circle_loss(jnp.array(np.moveaxis(img, 1, -1)),
                             jnp.array(np.moveaxis(pc, 1, -1)),
                             jnp.array(dmap))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    assert dists.shape == (2, n, n)


def test_softmax_cross_entropy_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(10, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(10,))
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    got = softmax_cross_entropy(jnp.array(logits), jnp.array(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_lovasz_hinge_perfect_prediction_is_zero():
    labels = jnp.array([1.0, 0.0, 1.0, 0.0])
    logits = jnp.array([10.0, -10.0, 10.0, -10.0])
    assert float(lovasz_hinge(logits, labels)) < 1e-3
