"""Orbax checkpointing.

Replaces the reference's ``torch.save(state_dict())``-on-best flow
(Train_Geo.py:161-163, Train_Agent.py:205-210) with Orbax: atomic,
async-capable, sharding-aware checkpoints that restore directly onto a
device mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params / batch_stats / opt_state / step) at ``path``."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; ``template`` (abstract or concrete) fixes structure,
    dtypes and shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


# ---- full train-state checkpoints (true resume) ---------------------------
# The reference's resume loads only the model state_dict
# (/root/reference/Train_Geo.py:58-61), silently resetting Adam moments and
# the scheduler position. Here a train checkpoint is two orbax trees:
#   path/model  {params, batch_stats, step}   — what eval / frozen-geo
#                                               loading already consume
#   path/opt    {opt_state}                   — optax state (Adam mu/nu +
#                                               schedule count)
# so model-only consumers never need an optimizer template, while resume
# restores both and continues bit-identically to an uninterrupted run
# (tests/test_train.py::test_kill_restart_resume_bitexact).

def save_train_checkpoint(path: str, state: Any) -> None:
    """Save a full train state (any of Geo/Agent/IterTrainState)."""
    save_checkpoint(os.path.join(path, "model"),
                    {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "step": state.step})
    save_checkpoint(os.path.join(path, "opt"), {"opt_state": state.opt_state})


def model_tree_path(path: str) -> str:
    """Resolve a checkpoint dir to its model subtree: new two-tree layout
    (``path/model``) or a legacy flat model-only checkpoint (``path``).

    Always absolute: orbax ``metadata()`` returns ``item_metadata=None``
    (with only a warning) for RELATIVE paths, which turns into an
    AttributeError deep inside restore for any checkpoint carrying a
    ``step`` leaf."""
    path = os.path.abspath(path)
    sub = os.path.join(path, "model")
    return sub if os.path.isdir(sub) else path


def saved_tree_keys(path: str) -> frozenset:
    """Top-level keys of the pytree saved at ``path`` (from orbax metadata,
    no array reads) — lets callers dispatch on checkpoint layout instead of
    retrying failed restores."""
    md = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
    return frozenset(md.item_metadata.tree.keys())


def restore_model_variables(path: str, template: Any) -> Any:
    """Restore model variables from ANY checkpoint layout this repo writes:

    - a two-tree train-state dir (``path/model``, carries a ``step`` leaf),
    - a flat model tree with a ``step`` leaf (legacy ``train_iter``),
    - a stepless snapshot (``{params, batch_stats}`` only — the convergence
      demo's ``--save-geo`` / ``--save-agent``).

    ``template`` is the model-variables dict ({params, batch_stats}, plus
    any extra collections the model carries); the return value has exactly
    its keys — a saved ``step`` leaf is restored structurally (shape/dtype
    from checkpoint metadata) but dropped. This is the one restore helper
    every model-only consumer (eval CLIs, frozen-geo loading, visualiser)
    should use, so layout writers and readers cannot drift apart.
    """
    mp = model_tree_path(path)
    saved = saved_tree_keys(mp)
    tpl = {k: v for k, v in template.items() if k != "step"}
    missing = sorted(k for k in tpl if k not in saved)
    if missing:
        raise ValueError(
            f"checkpoint at {path} lacks collections {missing}; "
            f"it has {sorted(saved)}")
    if "step" in saved:
        md = ocp.StandardCheckpointer().metadata(mp).item_metadata.tree
        tpl["step"] = jax.ShapeDtypeStruct(tuple(md["step"].shape),
                                           md["step"].dtype)
    out = restore_checkpoint(mp, template=tpl)
    return {k: out[k] for k in template if k != "step"}


def _fastforward_schedule(opt_state: Any, step) -> Any:
    """Set every ``ScaleByScheduleState`` count in a fresh optimizer state
    to ``step``.

    When a checkpoint carries a step but no optimizer tree, the fresh
    optax state would restart the lr schedule from 0 while ``state.step``
    (and the logged lr) say otherwise — training would silently run at the
    un-decayed initial lr. Adam's own count is deliberately left fresh: its
    moments were lost with the checkpoint, so its bias correction should
    restart with them."""
    import optax

    is_sched = lambda s: isinstance(s, optax.ScaleByScheduleState)
    return jax.tree.map(
        lambda s: optax.ScaleByScheduleState(
            count=jnp.asarray(step, jnp.int32)) if is_sched(s) else s,
        opt_state, is_leaf=is_sched)


def restore_train_checkpoint(path: str, state: Any):
    """Restore ``save_train_checkpoint`` output (or a legacy flat model-only
    checkpoint) onto ``state``. Returns ``(state, opt_restored)`` —
    ``opt_restored`` is False when only model weights were found, in which
    case the caller keeps the fresh optimizer state (the reference's
    behaviour, now loud instead of silent) with the lr-schedule position
    fast-forwarded to the restored step."""
    model_path = model_tree_path(path)
    tpl = {"params": state.params, "batch_stats": state.batch_stats}
    if "step" in saved_tree_keys(model_path):
        m = restore_checkpoint(model_path,
                               template=dict(tpl, step=state.step))
    else:
        # legacy flat checkpoints saved without a step leaf (pre-round-3
        # train_iter) and demo snapshots: step stays fresh
        m = restore_checkpoint(model_path, template=tpl)
        m = dict(m, step=state.step)
    state = state.replace(params=m["params"], batch_stats=m["batch_stats"],
                          step=m["step"])
    opt_path = os.path.join(path, "opt")
    if model_path != path and os.path.isdir(opt_path):
        o = restore_checkpoint(opt_path,
                               template={"opt_state": state.opt_state})
        return state.replace(opt_state=o["opt_state"]), True
    state = state.replace(
        opt_state=_fastforward_schedule(state.opt_state, state.step))
    return state, False
