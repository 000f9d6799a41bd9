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
