"""Geo-model training step (Train_Geo.py equivalent), jit + DP-sharded.

One compiled step = forward (losses + metrics) -> grad -> clipped Adam
update -> BatchNorm running-stat update. Data parallelism comes from
sharded batch inputs under jit (XLA inserts the gradient all-reduce over
the mesh); see :mod:`cmr_agent_tpu.parallel.mesh`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models import MultiHeadModel
from .optim import make_optimizer


class GeoTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


METRIC_KEYS = (
    "loss", "geometric_loss", "pc_overlap_loss", "img_overlap_loss",
    "pc_overlap_precision", "pc_overlap_recall", "pc_overlap_accuracy",
    "img_overlap_precision", "img_overlap_recall", "img_overlap_accuracy",
)


def create_geo_state(cfg: Config, example_batch: Dict, rng: jax.Array,
                     steps_per_epoch: int = 1000) -> GeoTrainState:
    model = MultiHeadModel(cfg)
    r1, r2 = jax.random.split(rng)
    # jitted init: eager init would dispatch every op individually (slow on
    # remote TPU runtimes and routed through unjitted scatter paths)
    init = jax.jit(lambda rngs, b: model.init(rngs, b, train=False,
                                              with_loss=True))
    variables = init({"params": r1, "dropout": r2}, example_batch)
    tx = make_optimizer(cfg, steps_per_epoch)
    return GeoTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def make_geo_train_step(cfg: Config):
    """Returns jitted ``(state, batch, rng) -> (state, metrics)``."""

    def train_step(state: GeoTrainState, batch: Dict, rng: jax.Array):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, with_loss=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return out["loss"], (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: out[k] for k in METRIC_KEYS}
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_geo_multi_step(cfg: Config, steps_per_call: int):
    """Returns jitted ``(state, stacked_batch, rng) -> (state, metrics)``
    running ``steps_per_call`` optimiser steps in ONE dispatched program.

    On remote-dispatch runtimes each program launch costs a fixed host
    round-trip (measured ~37 ms of the 134 ms/step sustained wall on the
    v5e tunnel, DESIGN.md); scanning S steps per dispatch amortises it to
    ~1/S. ``stacked_batch`` holds arrays with a leading ``[S, B, ...]``
    step axis; metrics come back stacked ``[S]`` per key.
    """

    def multi_step(state: GeoTrainState, stacked: Dict, rng: jax.Array):
        def body(st, xs):
            batch, key = xs
            def loss_fn(params):
                out, mutated = st.apply_fn(
                    {"params": params, "batch_stats": st.batch_stats},
                    batch, train=True, with_loss=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return out["loss"], (out, mutated["batch_stats"])

            (loss, (out, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            updates, new_opt = st.tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            metrics = {k: out[k] for k in METRIC_KEYS}
            return st.replace(step=st.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt), \
                metrics

        keys = jax.random.split(rng, steps_per_call)
        return jax.lax.scan(body, state, (stacked, keys))

    return jax.jit(multi_step, donate_argnums=(0,))


def make_geo_eval_step(cfg: Config):
    """Returns jitted ``(state, batch) -> metrics`` (eval mode, running BN)."""

    def eval_step(state: GeoTrainState, batch: Dict):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, with_loss=True)
        return {k: out[k] for k in METRIC_KEYS}

    return jax.jit(eval_step)


def make_geo_forward(cfg: Config, with_loss: bool = False):
    """Jitted frozen forward returning the full output dict (agent stage)."""

    def forward(params, batch_stats, batch):
        return MultiHeadModel(cfg).apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False, with_loss=with_loss)

    return jax.jit(forward)


def wrap_oracle_overlap(fwd):
    """Oracle-perception ablation (docs/CONVERGENCE.md section 11).

    Wraps a ``make_geo_forward``-style ``(params, stats, batch) -> out``
    with ground-truth overlap flags (``batch['pc_mask']``) substituted for
    the geo head's predictions, which memorise the synthetic training
    scenes and collapse on held-out ones. Upper-bounds what a generalising
    geo would give the agent; every result produced through this wrapper
    is an ablation and must be labelled as such. One shared definition so
    the demo's training numbers and diagnose's replay of the same
    checkpoint cannot drift apart.
    """

    def wrapped(params, batch_stats, batch):
        out = dict(fwd(params, batch_stats, batch))
        out["pc_overlap_pred"] = batch["pc_mask"].astype(bool)
        out["pc_is_in_cam_scores"] = batch["pc_mask"].astype(jnp.float32)
        return out

    return wrapped
