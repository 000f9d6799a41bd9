"""Fused eval dense stacks: parameter-tree and output parity.

The fused branch (layers.py fused-eval-stacks note) declares parameters
through holder modules and computes via ops.pallas_kernels.fused_dense_chain.
These tests force that branch on CPU via CMR_FUSED_STACK_INTERPRET=1 and
assert (a) the variable tree is IDENTICAL to the unfused branch — same
paths, shapes and init values — and (b) eval outputs match the unfused
module applied to the same variables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmr_agent_tpu.models.layers import MiniPointNet, ResDenseBlock
from cmr_agent_tpu.models.agent import CMRAgent, _ResDenseSplitBlock
from cmr_agent_tpu.config import tiny_config


@pytest.fixture(scope="module")
def tiny_cfg():
    return tiny_config()


def _tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("module,shape", [
    (MiniPointNet(16), (2, 100, 3)),
    (ResDenseBlock(16), (2, 100, 8)),    # projected shortcut
    (ResDenseBlock(16), (2, 100, 16)),   # identity shortcut
])
def test_stack_init_tree_and_output_parity(module, shape, monkeypatch):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                    jnp.float32)
    v_unfused = module.init(jax.random.key(7), x, False)
    monkeypatch.setenv("CMR_FUSED_STACK_INTERPRET", "1")
    v_fused = module.init(jax.random.key(7), x, False)
    _tree_equal(v_unfused, v_fused)

    got = module.apply(v_unfused, x, False)
    monkeypatch.delenv("CMR_FUSED_STACK_INTERPRET")
    want = module.apply(v_unfused, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_split_block_parity(monkeypatch):
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(2, 120, 16)), jnp.float32)
    pooled = jnp.asarray(rng.normal(size=(2, 1, 16)), jnp.float32)
    blk = _ResDenseSplitBlock(16)
    v = blk.init(jax.random.key(3), feat, pooled, False)
    monkeypatch.setenv("CMR_FUSED_STACK_INTERPRET", "1")
    v_f = blk.init(jax.random.key(3), feat, pooled, False)
    _tree_equal(v, v_f)
    got = blk.apply(v, feat, pooled, False)
    monkeypatch.delenv("CMR_FUSED_STACK_INTERPRET")
    want = blk.apply(v, feat, pooled, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_full_agent_eval_parity(tiny_cfg, monkeypatch):
    cfg = tiny_cfg
    agent = CMRAgent(cfg)
    rng = np.random.default_rng(2)
    b, f = 2, cfg.embed_dim
    s2d = jnp.asarray(rng.normal(size=(b, cfg.image_h, cfg.image_w, 2 * f)),
                      jnp.float32)
    s3d = jnp.asarray(rng.normal(size=(b, cfg.num_pt, 5)), jnp.float32)
    v = agent.init({"params": jax.random.key(0)}, s2d, s3d, train=False)
    monkeypatch.setenv("CMR_FUSED_STACK_INTERPRET", "1")
    v_f = agent.init({"params": jax.random.key(0)}, s2d, s3d, train=False)
    _tree_equal(v, v_f)
    got = agent.apply(v, s2d, s3d, train=False)
    monkeypatch.delenv("CMR_FUSED_STACK_INTERPRET")
    want = agent.apply(v, s2d, s3d, train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_train_path_unchanged_by_fused_flag(monkeypatch):
    """train=True always takes the unfused branch (batch statistics)."""
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 64, 8)),
                    jnp.float32)
    m = MiniPointNet(16)
    v = m.init(jax.random.key(0), x, True)
    want, stats = m.apply(v, x, True, mutable=["batch_stats"])
    monkeypatch.setenv("CMR_FUSED_STACK_INTERPRET", "1")
    got, stats_f = m.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _tree_equal(stats, stats_f)


def test_chain_cn_matches_reference():
    from cmr_agent_tpu.ops.pallas_kernels import (
        fused_dense_chain_cn, _dense_chain_cn_reference)
    rng = np.random.default_rng(5)
    B, N = 2, 300
    x = jnp.asarray(rng.normal(size=(B, 8, N)), jnp.float32)   # [B, C, N]
    Ws = (jnp.asarray(rng.normal(size=(8, 16)), jnp.float32),
          jnp.asarray(rng.normal(size=(16, 24)), jnp.float32))
    bs = (jnp.asarray(rng.normal(size=(16,)), jnp.float32),
          jnp.asarray(rng.normal(size=(B, 24)), jnp.float32))  # per-batch
    pooled = jnp.asarray(rng.normal(size=(B, 16)), jnp.float32)

    got = fused_dense_chain_cn(x, Ws, bs, pooled=pooled,
                               slopes=(0.2, None),
                               residual="identity_split", final_slope=0.2,
                               out_max=True, tile=128, interpret=True)
    want = _dense_chain_cn_reference(x, Ws, bs, None, None, pooled,
                                     slopes=(0.2, None),
                                     residual="identity_split",
                                     final_slope=0.2, out_max=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)

    def loss_f(fn):
        def f(x_, ws_, bs_, p_):
            out = fn(x_, ws_, bs_, None, None, p_,
                     slopes=(0.2, None), residual="identity_split",
                     final_slope=0.2, out_max=False)
            return jnp.sum(out ** 2)
        return f

    fused = lambda *a, **k: fused_dense_chain_cn(
        a[0], a[1], a[2], a[3], a[4], a[5], tile=128, interpret=True, **k)
    g1 = jax.grad(loss_f(fused), argnums=(0, 1, 2, 3))(x, Ws, bs, pooled)
    g2 = jax.grad(loss_f(_dense_chain_cn_reference),
                  argnums=(0, 1, 2, 3))(x, Ws, bs, pooled)
    # the fused forward differs from the reference by f32 accumulation
    # order (~5e-6); the quadratic loss doubles that into the cotangent
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def test_agent_cn_layout_parity(tiny_cfg, monkeypatch):
    """CMRAgent on a channel-major observation == row-major (fused forced)."""
    cfg = tiny_cfg
    agent = CMRAgent(cfg)
    rng = np.random.default_rng(6)
    b, f = 2, cfg.embed_dim
    s2d = jnp.asarray(rng.normal(size=(b, cfg.image_h, cfg.image_w, 2 * f)),
                      jnp.float32)
    s3d = jnp.asarray(rng.normal(size=(b, cfg.num_pt, 5)), jnp.float32)
    v = agent.init({"params": jax.random.key(0)}, s2d, s3d, train=False)

    want = agent.apply(v, s2d, s3d, train=False)
    monkeypatch.setenv("CMR_FUSED_STACK_INTERPRET", "1")
    got = agent.apply(v, s2d, jnp.swapaxes(s3d, 1, 2), train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_observation_cn_layout_matches_nc():
    from cmr_agent_tpu.env.environment import observation_from_pose
    rng = np.random.default_rng(7)
    b, n, f, h, w = 2, 256, 8, 4, 16
    state = {
        "pc": jnp.asarray(rng.normal(size=(b, n, 3)) * 5, jnp.float32),
        "K": jnp.asarray(np.tile(np.array(
            [[8.0, 0, 8], [0, 8, 2], [0, 0, 1]], np.float32), (b, 1, 1))),
        "pc_overlap_pred": jnp.asarray(rng.random((b, n)) < 0.5),
        "pc_geo_feat": jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32),
        "img_geo_feat": jnp.asarray(rng.normal(size=(b, h, w, f)),
                                    jnp.float32),
    }
    pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    for bearing in (False, True):
        o2, o3 = observation_from_pose(state, pose, h, w,
                                       use_pallas=False,
                                       bearing_channels=bearing)
        o2c, o3c = observation_from_pose(state, pose, h, w,
                                         use_pallas=False,
                                         bearing_channels=bearing,
                                         obs3d_layout="cn")
        np.testing.assert_allclose(np.asarray(o2c), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(o3c, 1, 2)),
                                   np.asarray(o3), rtol=1e-5, atol=1e-5)
