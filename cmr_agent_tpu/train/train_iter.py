"""Cost-volume (IterModel) training step.

The reference ships IterModel with a CE loss against the hypothesis-grid
label (models/IterModel.py:174-192) and a commented-out frozen
MultiHeadModel load (IterModel.py:31-35) but no training entry script; this
module completes the capability: a jitted step optimising the scoring tower
against the reconstructed grid labels, with the geo model frozen.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models import IterModel
from .optim import make_optimizer


def iter_model_state(geo_out, batch) -> Dict:
    """Assemble the IterModel input state from frozen geo outputs + batch.

    The reference threads these through the mutable data_batch dict
    (Test_Geo.py:78-79, models/IterModel.py:250-303); here the mapping is
    explicit and shared by the training and eval CLIs.
    """
    state = {
        "pc_i": geo_out["pc"],
        "K": batch["K"],
        "pc_geo_feat": geo_out["pc_geo_feat"],
        "img_geo_feat": geo_out["img_geo_feat"],
        "pc_overlap_pred": geo_out["pc_overlap_pred"],
        "pc_overlap_pred_standby": geo_out["pc_overlap_pred_standby"],
        "pc_is_in_cam_scores": geo_out["pc_is_in_cam_scores"],
        "img_overlap_pred": geo_out["img_overlap_pred"],
        "matrix_accumulated": geo_out["matrix_accumulated"],
        "R_amplitude": batch["R_amplitude"],
        "T_amplitude": batch["T_amplitude"],
    }
    # ground-truth decode labels exist in train/eval batches but not in a
    # serving client's input; the model's loss branch already guards on
    # their presence (cost_volume.py `with_loss and "label_R" in state`)
    for k in ("label_R", "label_T_x", "label_T_z"):
        if k in batch:
            state[k] = batch[k]
    return state


class IterTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def create_iter_state(cfg: Config, example_state: Dict, rng: jax.Array,
                      steps_per_epoch: int = 1000) -> IterTrainState:
    model = IterModel(cfg)
    init = jax.jit(lambda r, s: model.init({"params": r}, s, train=False,
                                           with_loss=True))
    variables = init(rng, example_state)
    tx = make_optimizer(cfg, steps_per_epoch)
    return IterTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def per_axis_accuracy(cfg: Config, logits, label):
    """Marginal per-axis decode accuracies (ry / tx / tz).

    The deployment decode is per-axis marginal argmax (reference
    IterModel.py:443-456), so these — not the joint 729-way grid accuracy
    — are the operative quality measure; they also separate "rotation
    learned, translation not" during training.
    """
    nl = cfg.nlabel
    p = jax.nn.softmax(logits, axis=-1).reshape(-1, nl, nl, nl)
    l3 = label.reshape(-1, nl, nl, nl)
    axes = {"acc_ry": (2, 3), "acc_tx": (1, 3), "acc_tz": (1, 2)}
    out = {}
    for k, ax in axes.items():
        pm = jnp.argmax(p.sum(axis=ax), axis=-1)
        lm = jnp.argmax(l3.sum(axis=ax), axis=-1)
        out[k] = jnp.mean((pm == lm).astype(jnp.float32))
        # within-one-bin: the operative coarse-stage quality — a 1-bin
        # miss leaves a residual the iteration/fine stage re-spans
        # (2*amplitude/(nlabel-1) per bin), while exact-bin accuracy
        # understates a decode that is consistently adjacent
        out[k + "_1bin"] = jnp.mean(
            (jnp.abs(pm - lm) <= 1).astype(jnp.float32))
    return out


def make_iter_train_step(cfg: Config):
    """Jitted ``(state, iter_state_dict) -> (state, metrics)``.

    The warp consumes frozen geo outputs (stop-gradient by construction);
    only the Conv tower and heads receive gradients.
    """

    def train_step(state: IterTrainState, batch_state: Dict):
        def fwd(params, batch_stats, bstate):
            return state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                bstate, train=True, with_loss=True,
                mutable=["batch_stats"])

        if cfg.cost_volume_remat:
            # Trade FLOPs for HBM: the hypothesis volume + tower
            # activations are recomputed during backward instead of held
            # across the forward->backward gap (Config.cost_volume_remat).
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            out, mutated = fwd(
                params, state.batch_stats,
                jax.tree.map(jax.lax.stop_gradient, batch_state))
            return out["cost_volume_loss"], (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        label = jnp.argmax(out["cost_volume_label"], axis=-1)
        pred = jnp.argmax(out["cost_volume_logits"], axis=-1)
        metrics = {
            "cost_volume_loss": loss,
            "grid_accuracy": jnp.mean((pred == label).astype(jnp.float32)),
        }
        metrics.update(per_axis_accuracy(cfg, out["cost_volume_logits"],
                                         out["cost_volume_label"]))
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            opt_state=new_opt)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
