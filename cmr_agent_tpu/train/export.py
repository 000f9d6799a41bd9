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


def export_composed_pipeline(cfg: Config, geo_variables: Dict,
                             iter_variables: Dict, agent_variables: Dict,
                             example_batch: Dict, *,
                             fine_geo_variables: Dict | None = None,
                             hypotheses: int = 1, iter_iters: int = 1,
                             iter_shrink: float = 1.0,
                             hypo_score: str = "smooth_mean",
                             path: str | None = None) -> bytes:
    """Serialise the full coarse-to-fine registration pipeline as ONE
    program: raw batch -> cost-volume coarse search over the top-K yaw
    hypotheses -> per-candidate re-perception + agent episode ->
    feature-alignment verification -> selected absolute pose.

    This is the flagship ±10 m/±π configuration (docs/CONVERGENCE.md §16
    stage 4; 82.8% held-out RR) as a serving artifact — the reference
    ships IterModel and the agent as disjoint scripts (Test_Geo.py /
    Test_Agent.py) and never composes, let alone serves, them.

    Inputs (all inference-only; no ground truth anywhere): the geo
    forward's batch tensors (``img``, ``pc``, ``node``, ``pt2node``,
    ``K``) plus the protocol amplitudes ``R_amplitude``/``T_amplitude``
    that define the hypothesis grid. Returns a dict of

    * ``pose [B, 4, 4]``: the selected estimate as an ABSOLUTE SE(3)
      mapping the input cloud into camera alignment (the per-branch
      episode pose — disentangled, rotation about the rebased cloud's
      centroid — is entangled via ``t_abs = t + μ − Rμ`` and composed
      with that branch's coarse matrix)
    * ``score [B]``: the winning candidate's verification statistic
    * ``candidate_scores [B, K]``: all statistics, for client-side
      confidence thresholds

    ``fine_geo_variables`` serves per-stage perception (CONVERGENCE §16:
    a ±π-trained geo feeds the cost volume, a narrow-amplitude geo feeds
    the fine stage); defaults to ``geo_variables``.
    """
    from ..env import (alignment_stats, apply_coarse_pose,
                       bearing_init_pose, run_episode)
    from ..models import (CMRAgent, IterModel, MultiHeadModel,
                          decode_topk_yaw_poses)
    from ..ops.geometry import make_se3, transform_points
    from .train_iter import iter_model_state

    geo_model = MultiHeadModel(cfg)
    iter_model = IterModel(cfg)
    agent = CMRAgent(cfg)
    fine_vars = (fine_geo_variables if fine_geo_variables is not None
                 else geo_variables)

    input_keys = ("img", "pc", "node", "pt2node", "K",
                  "R_amplitude", "T_amplitude")

    def run_fine(batch_k):
        """Re-perceive the rebased problem and run the agent episode;
        returns (episode state, final disentangled pose)."""
        geo_k = geo_model.apply(fine_vars, batch_k, train=False,
                                with_loss=False)
        state_k = {k: geo_k[k] for k in
                   ("pc", "pc_overlap_pred", "pc_is_in_cam_scores",
                    "pc_geo_feat", "img_geo_feat")}
        state_k["K"] = batch_k["K"]
        b = state_k["pc"].shape[0]
        pose_src = (bearing_init_pose(state_k) if cfg.bearing_init else
                    jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                     (b, 4, 4)))

        def apply_fn(avars, o2, o3):
            return agent.apply(avars, o2, o3, train=False)

        topk = cfg.raster_topk if 0 < cfg.raster_topk < cfg.num_pt else None
        final, _ = run_episode(apply_fn, agent_variables, state_k, pose_src,
                               None, cfg, deterministic=True,
                               raster_topk=topk)
        return state_k, final

    def entangle_and_compose(state_k, final, coarse):
        """Absolute pose = entangled episode estimate ∘ coarse rebase."""
        mu = state_k["pc"].astype(jnp.float32).mean(axis=1)
        Rf = final[..., :3, :3].astype(jnp.float32)
        tf = final[..., :3, 3].astype(jnp.float32)
        t_abs = tf + mu - jnp.einsum("bij,bj->bi", Rf, mu)
        return make_se3(Rf, t_abs) @ coarse

    def tail_iters(stk):
        for _ in range(1, iter_iters):
            if iter_shrink != 1.0:
                stk = dict(stk,
                           R_amplitude=stk["R_amplitude"] * iter_shrink,
                           T_amplitude=stk["T_amplitude"] * iter_shrink)
            o = iter_model.apply(iter_variables, stk, train=False,
                                 with_loss=False)
            stk = dict(stk, pc_i=o["pc_i"],
                       matrix_accumulated=o["matrix_accumulated"])
        return stk

    def fn(batch):
        geo_out = geo_model.apply(geo_variables, batch, train=False,
                                  with_loss=False)
        st = iter_model_state(geo_out, batch)
        out = iter_model.apply(iter_variables, st, train=False,
                               with_loss=False)
        cands = decode_topk_yaw_poses(
            out["cost_volume_logits"], st["R_amplitude"],
            st["T_amplitude"], cfg.nlabel, hypotheses)
        poses, scores = [], []
        for k in range(hypotheses):
            mk = cands[:, k]
            stk = tail_iters(dict(
                st,
                pc_i=transform_points(st["pc_i"], mk[:, :3, :3],
                                      mk[:, :3, 3]),
                matrix_accumulated=mk @ st["matrix_accumulated"]))
            coarse = stk["matrix_accumulated"]
            batch_k = apply_coarse_pose(batch, coarse)
            state_k, final = run_fine(batch_k)
            poses.append(entangle_and_compose(state_k, final, coarse))
            scores.append(alignment_stats(state_k, final, cfg.image_h,
                                          cfg.image_w)[hypo_score])
        scores = jnp.stack(scores, axis=1)                 # [B, K]
        poses = jnp.stack(poses, axis=1)                   # [B, K, 4, 4]
        sel = jnp.argmax(scores, axis=1)
        pose = jnp.take_along_axis(
            poses, sel[:, None, None, None], axis=1)[:, 0]
        score = jnp.take_along_axis(scores, sel[:, None], axis=1)[:, 0]
        return {"pose": pose, "score": score, "candidate_scores": scores}

    args = {k: jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype)
            for k, v in example_batch.items() if k in input_keys}
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
