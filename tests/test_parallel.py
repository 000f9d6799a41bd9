"""Parallelism tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cmr_agent_tpu.config import micro_config, tiny_config
from cmr_agent_tpu.data import SyntheticDataset, collate
from cmr_agent_tpu.parallel import make_mesh, replicate, batch_sharding
from cmr_agent_tpu.parallel.mesh import shard_geo_batch
from cmr_agent_tpu.parallel.sp import (linear_attention_message,
                                       sp_linear_attention_message)
from cmr_agent_tpu.train import create_geo_state, make_geo_train_step

# micro: dp-parity compiles the train step twice; wiring not
# geometry is under test
CFG = micro_config(train_batch_size=4)


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    ds = SyntheticDataset(CFG, length=4)
    batch = collate([ds[i] for i in range(4)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = create_geo_state(CFG, batch, jax.random.key(0))
    step = make_geo_train_step(CFG)
    _, m_single = step(state, batch, jax.random.key(1))

    mesh = make_mesh((2, 2), ("dp", "sp"),
                     devices=jax.devices()[:4])
    state2 = create_geo_state(CFG, batch, jax.random.key(0))
    state2 = state2.replace(params=replicate(state2.params, mesh),
                            batch_stats=replicate(state2.batch_stats, mesh),
                            opt_state=replicate(state2.opt_state, mesh))
    sharded = shard_geo_batch(batch, mesh, use_sp=True)
    _, m_sharded = step(state2, sharded, jax.random.key(1))

    # identical math, modulo reduction order
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-4)


@pytest.mark.slow
def test_dp_agent_stage_matches_single_device():
    """The RL stage under a dp mesh: the deterministic val episode and one
    PPO update must match the single-device result (GSPMD inserts the
    cross-device reductions — BatchNorm batch stats, loss means — inside
    the same jitted programs the single-device path runs).

    The optimizer here is SGD, not Adam: the update is linear in the
    gradient, so cross-device reduction-order noise stays at float
    epsilon. Adam divides by sqrt(v), which amplifies that noise to
    ~±lr on near-zero-gradient parameters — equivalent programs then
    legitimately differ (see docs/DESIGN.md on conv-bias-into-BN)."""
    from cmr_agent_tpu.env import TrajectoryBuffer
    from cmr_agent_tpu.parallel import batch_sharding
    from cmr_agent_tpu.train import (create_agent_state, make_rollout_fn,
                                     make_ppo_update_step,
                                     make_val_episode_fn)
    from cmr_agent_tpu.train.train_geo import make_geo_forward

    cfg = micro_config(train_batch_size=4, optimizer="SGD")
    ds = SyntheticDataset(cfg, length=4)
    batch = collate([ds[i] for i in range(4)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    geo_state = create_geo_state(cfg, batch, jax.random.key(0))
    fwd = make_geo_forward(cfg)
    geo_out = fwd(geo_state.params, geo_state.batch_stats, batch)

    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    agent_state = create_agent_state(
        cfg, jnp.zeros((4, h, w, 2 * f)), jnp.zeros((4, cfg.num_pt, 5)),
        jax.random.key(1))

    val = make_val_episode_fn(cfg)
    _, rte_single, rre_single = val(agent_state, geo_out, batch)

    rollout = make_rollout_fn(cfg)
    traj, _, _ = rollout(agent_state, geo_out, batch, jax.random.key(2))
    buf = TrajectoryBuffer(cfg.gamma, cfg.gae_lambda)
    buf.add(traj)
    mb = {k: v[: cfg.ppo_batch_size] for k, v in buf.samples().items()}

    update = make_ppo_update_step(cfg)
    # PPO update donates the input state: keep an intact copy per path
    state_a = jax.tree.map(jnp.copy, agent_state)
    new_single, m_single = update(state_a, mb)

    mesh = make_mesh((4,), ("dp",), devices=jax.devices()[:4])
    shard = lambda tree: jax.tree.map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, x.ndim)) if x.ndim else x, tree)
    state_b = agent_state.replace(
        params=replicate(agent_state.params, mesh),
        batch_stats=replicate(agent_state.batch_stats, mesh),
        opt_state=replicate(agent_state.opt_state, mesh))

    _, rte_dp, rre_dp = val(state_b, shard(geo_out), shard(batch))
    np.testing.assert_allclose(np.asarray(rte_dp), np.asarray(rte_single),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rre_dp), np.asarray(rre_single),
                               rtol=1e-4, atol=1e-3)

    new_dp, m_dp = update(state_b, shard(mb))
    np.testing.assert_allclose(float(m_dp["loss"]),
                               float(m_single["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_dp["bc_loss"]),
                               float(m_single["bc_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_single.params),
                    jax.tree.leaves(new_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sp_linear_attention_matches_unsharded():
    rng = np.random.default_rng(0)
    b, l, s, h, d = 2, 64, 40, 4, 8
    q = jnp.array(np.abs(rng.normal(size=(b, l, h, d))) + 0.5, jnp.float32)
    k = jnp.array(np.abs(rng.normal(size=(b, s, h, d))) + 0.5, jnp.float32)
    v = jnp.array(rng.normal(size=(b, s, h, d)), jnp.float32)

    want = linear_attention_message(q, k, v)

    mesh = make_mesh((8,), ("sp",))
    spec = NamedSharding(mesh, P(None, "sp", None, None))
    q_s = jax.device_put(q, spec)
    k_s = jax.device_put(k, spec)
    v_s = jax.device_put(v, spec)
    got = sp_linear_attention_message(q_s, k_s, v_s, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_batch_sharding_layout():
    mesh = make_mesh((8,), ("dp",))
    x = jnp.zeros((8, 16, 3))
    sharded = jax.device_put(x, batch_sharding(mesh, x.ndim))
    assert sharded.sharding.spec == P("dp", None, None)


@pytest.mark.slow
def test_sharded_forward_with_sp():
    from cmr_agent_tpu.parallel import make_sharded_geo_forward
    from cmr_agent_tpu.models import MultiHeadModel
    ds = SyntheticDataset(CFG, length=4)
    batch = collate([ds[i] for i in range(4)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = MultiHeadModel(CFG)
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)},
                   batch, train=False, with_loss=False)
    want = model.apply(v, batch, train=False, with_loss=False)

    mesh = make_mesh((2, 2), ("dp", "sp"), devices=jax.devices()[:4])
    fwd = make_sharded_geo_forward(CFG, mesh, use_sp=True)
    got = fwd(v["params"], v["batch_stats"], batch)
    np.testing.assert_allclose(np.asarray(got["pc_geo_feat"]),
                               np.asarray(want["pc_geo_feat"]),
                               rtol=5e-3, atol=5e-3)


def test_linear_attention_routes_sp_under_ambient_mesh():
    """The LIVE LinearAttention module must take the psum-decomposed path
    (and match the unsharded math) when the ambient mesh has an sp axis."""
    from jax.sharding import set_mesh
    from cmr_agent_tpu.models.linear_attention import LinearAttention

    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(2, 64, 32)), jnp.float32)
    y = jnp.array(rng.normal(size=(2, 40, 32)), jnp.float32)

    la = LinearAttention(num_heads=4)
    v = la.init({"params": jax.random.key(0)}, x, y, train=False)
    want = la.apply(v, x, y, train=False)

    mesh = make_mesh((2, 4), ("dp", "sp"))

    @jax.jit
    def fwd(v, x, y):
        return la.apply(v, x, y, train=False)

    with set_mesh(mesh):
        # proof the decomposed path is active: the traced jaxpr psums
        jaxpr = str(jax.make_jaxpr(fwd)(v, x, y))
        assert "psum" in jaxpr
        got = fwd(v, x, y)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
