"""Serving export: serialise compiled inference functions to StableHLO.

The reference's deployment story is "load the .pth in a python process"
(Test_Agent.py:129-137). The TPU-native serving analog is `jax.export`:
trace + lower the jitted function once, serialise the StableHLO artifact,
and run it later from any process (or a C++ PJRT runtime) without the
model code or a re-trace — the standard production path for XLA serving.

Two artifacts cover the framework's inference surfaces:

* ``export_geo_forward`` — the one-shot MultiHeadModel forward (eval
  mode, no losses): image + cloud -> overlap predictions + 64-d geo
  features.
* ``export_episode`` — the full K-step refinement episode as ONE program
  (geo features -> lax.scan of observation/policy/action/pose), i.e. the
  deterministic Test_Agent.py:149-191 inner loop.

Weights are baked into the artifact as constants (the natural choice for
a frozen serving graph; re-export on checkpoint change).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..config import Config


def _geo_state_keys():
    # what the deterministic (no-reward, no-expert-relabel) episode reads;
    # notably NOT the ground-truth pose "P" — a serving client registering
    # a new scan has none
    return ("pc", "K", "pc_overlap_pred", "pc_is_in_cam_scores",
            "pc_geo_feat", "img_geo_feat")


def export_geo_forward(cfg: Config, variables: Dict, example_batch: Dict,
                       path: str | None = None) -> bytes:
    """Serialise the eval-mode geo forward; returns (and optionally writes)
    the artifact bytes."""
    from ..models import MultiHeadModel

    model = MultiHeadModel(cfg)

    def fn(batch):
        out = model.apply(variables, batch, train=False, with_loss=False)
        return {
            "pc_geo_feat": out["pc_geo_feat"],
            "img_geo_feat": out["img_geo_feat"],
            "pc_overlap_pred": out["pc_overlap_pred"],
            "pc_overlap_pred_standby": out["pc_overlap_pred_standby"],
            "pc_is_in_cam_scores": out["pc_is_in_cam_scores"],
            "img_overlap_pred": out["img_overlap_pred"],
        }

    args = {k: jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype)
            for k, v in example_batch.items()}
    blob = jax_export.export(jax.jit(fn))(args).serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_episode(cfg: Config, agent_variables: Dict,
                   example_state: Dict, path: str | None = None) -> bytes:
    """Serialise the deterministic K-step episode (state -> final pose)."""
    from ..env import run_episode
    from ..models import CMRAgent

    agent = CMRAgent(cfg)

    def fn(state):
        b = state["pc"].shape[0]
        pose_src = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                    (b, 4, 4))
        if cfg.bearing_init:
            # match training/eval episode initialisation (Config.bearing
            # _init applies to BOTH rollout and eval — config.py): an
            # agent trained with it never sees identity starts, so the
            # serving artifact must bake the same init
            from ..env import bearing_init_pose
            pose_src = bearing_init_pose(state)

        def apply_fn(avars, o2, o3):
            return agent.apply(avars, o2, o3, train=False)

        topk = cfg.raster_topk if 0 < cfg.raster_topk < cfg.num_pt else None
        final, _ = run_episode(apply_fn, agent_variables, state, pose_src,
                               None, cfg, deterministic=True,
                               raster_topk=topk)
        return final

    args = {k: jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype)
            for k, v in example_state.items() if k in _geo_state_keys()}
    blob = jax_export.export(jax.jit(fn))(args).serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob_or_path):
    """Deserialise an artifact; returns an object whose ``.call(*args)``
    runs it on the current backend."""
    import os
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    return jax_export.deserialize(blob)
