"""Weight-converter tests: name-map coverage + transform roundtrip.

The real reference checkpoints are stripped from the mirror
(.MISSING_LARGE_BLOBS), so these tests build a synthetic torch state_dict
whose keys come from the name map and whose values are inverse-transformed
flax leaves; a strict conversion must exactly reproduce the flax template
(coverage both ways + correct layout transforms).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmr_agent_tpu.config import tiny_config
from cmr_agent_tpu.models import MultiHeadModel, CMRAgent, IterModel
from cmr_agent_tpu.train.convert import (
    multihead_name_map, agent_name_map, itermodel_name_map, apply_name_map,
    T_DENSE, T_CONV2D, T_CONV3D,
    _flatten,
)

CFG = tiny_config()


def _inverse_transform(tag, w):
    if tag == T_DENSE:
        return np.ascontiguousarray(w.T)          # [I,O] -> [O,I]
    if tag == T_CONV2D:
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
    if tag == T_CONV3D:
        return np.ascontiguousarray(
            np.transpose(w, (3, 2, 0, 1))[:, :, None])
    return np.asarray(w)


def _fake_torch_sd(entries, template):
    flat = {c: _flatten(template.get(c, {})) for c in ("params", "batch_stats")}
    rng = np.random.default_rng(0)
    sd = {}
    for tk, coll, fp, tag in entries:
        leaf = np.asarray(flat[coll][fp])
        # fill with random values to make the roundtrip meaningful
        vals = rng.normal(size=leaf.shape).astype(np.float32)
        sd[tk] = _inverse_transform(tag, vals)
    return sd


def _roundtrip(entries, template):
    sd = _fake_torch_sd(entries, template)
    out = apply_name_map(entries, sd, template)
    # every leaf assigned, shapes equal
    for coll in ("params", "batch_stats"):
        want = _flatten(template.get(coll, {}))
        got = _flatten(out[coll])
        assert set(want) == set(got)
        for k in want:
            assert np.asarray(got[k]).shape == np.asarray(want[k]).shape
    return sd, out


def test_multihead_map_total_coverage():
    batch = {
        "img": jnp.zeros((1, CFG.cropped_img_h, CFG.cropped_img_w, 3)),
        "pc": jnp.zeros((1, CFG.num_pt, 3)),
        "node": jnp.zeros((1, CFG.num_node, 3)),
        "pt2node": jnp.zeros((1, CFG.num_pt), jnp.int32),
    }
    template = MultiHeadModel(CFG).init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False, with_loss=False)
    sd, out = _roundtrip(multihead_name_map(CFG), template)

    # spot-check a layout transform: a conv2d kernel [kh,kw,I,O]
    flat = _flatten(out["params"])
    k = ("encoder_decoder/encoder/img_transformer/mini_resnet/"
         "ResidualBlock2D_0/Conv_0/kernel")
    tk = ("encoder_decoder.encoder.img_transformer.embeddings.mini_resnet."
          "residual_learning.0.conv_layers.0.weight")
    np.testing.assert_allclose(np.asarray(flat[k]),
                               np.transpose(sd[tk], (2, 3, 1, 0)))

    # strictness: extra torch key raises
    sd_extra = dict(sd, **{"bogus.weight": np.zeros(3)})
    with pytest.raises(KeyError):
        apply_name_map(multihead_name_map(CFG), sd_extra, template)
    # missing torch key raises
    sd_missing = dict(sd)
    sd_missing.pop(tk)
    with pytest.raises(KeyError):
        apply_name_map(multihead_name_map(CFG), sd_missing, template)


def test_agent_map_total_coverage():
    h, w, f = CFG.image_h, CFG.image_w, CFG.embed_dim
    template = CMRAgent(CFG).init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, h, w, 2 * f)), jnp.zeros((1, CFG.num_pt, 5)),
        train=False)
    sd, out = _roundtrip(agent_name_map(CFG), template)
    # dense transpose check on a policy head
    flat = _flatten(out["params"])
    np.testing.assert_allclose(np.asarray(flat["policy_r_0/kernel"]),
                               sd["policy_r.0.weight"].T)


def test_itermodel_map_total_coverage():
    rng = np.random.default_rng(1)
    N, h, w, f, nl = CFG.num_pt, CFG.image_h, CFG.image_w, CFG.embed_dim, \
        CFG.nlabel
    state = {
        "pc_i": jnp.zeros((1, N, 3)),
        "K": jnp.eye(3)[None],
        "pc_geo_feat": jnp.zeros((1, N, f)),
        "img_geo_feat": jnp.zeros((1, h, w, f)),
        "pc_overlap_pred": jnp.ones((1, N), bool),
        "pc_is_in_cam_scores": jnp.ones((1, N)),
        "img_overlap_pred": jnp.ones((1, h, w)),
        "matrix_accumulated": jnp.eye(4)[None],
        "R_amplitude": jnp.ones((1,)),
        "T_amplitude": jnp.ones((1,)),
    }
    template = IterModel(CFG).init({"params": jax.random.key(0)}, state,
                                   train=False, with_loss=False)
    _roundtrip(itermodel_name_map(CFG), template)
