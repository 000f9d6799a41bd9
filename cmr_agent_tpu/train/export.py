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

        topk = cfg.episode_raster_topk()
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
                             refine_rounds: int = 0,
                             refine_beam: tuple = (),
                             beam_score: str | None = None,
                             beam_frame: str = "own",
                             path: str | None = None) -> bytes:
    """Serialise the full coarse-to-fine registration pipeline as ONE
    program: raw batch -> cost-volume coarse search over the top-K yaw
    hypotheses -> per-candidate re-perception + agent episode ->
    feature-alignment verification -> selected absolute pose ->
    optional verified refinement rounds (accept-if-statistic-improves,
    optionally over a beam of statistic-nominated candidates).

    This is the flagship ±10 m/±π configuration (docs/CONVERGENCE.md §16
    stages 4-5) as a serving artifact — the reference ships IterModel and
    the agent as disjoint scripts (Test_Geo.py / Test_Agent.py) and never
    composes, let alone serves, them. ``hypo_score`` may be any
    ``env.alignment_stats`` / ``env.nn_alignment_stats`` key or
    ``"combo"`` (z(smooth_mean) + 0.3 z(ir_smooth) across candidates).

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
                       bearing_init_pose, nn_alignment_stats, run_episode)
    from ..models import (CMRAgent, IterModel, MultiHeadModel,
                          decode_topk_yaw_poses)
    from ..ops.geometry import make_se3, transform_points
    from .train_iter import iter_model_state

    geo_model = MultiHeadModel(cfg)
    iter_model = IterModel(cfg)
    agent = CMRAgent(cfg)
    fine_vars = (fine_geo_variables if fine_geo_variables is not None
                 else geo_variables)

    beam_score = beam_score or hypo_score
    # beam entries are "stat" or "stat:R" (rank-R nominee, 1-based)
    beam_specs = tuple((s.partition(":")[0],
                        int(s.partition(":")[2] or 1))
                       for s in refine_beam)
    if beam_frame not in ("own", "shared"):
        raise ValueError(f"beam_frame must be 'own' or 'shared', got "
                         f"{beam_frame!r}")
    ir_names = ("ir_smooth", "ir_mean", "ir_norm")
    need_ir = any(s == "combo" or s in ir_names
                  for s in (hypo_score, beam_score,
                            *(n for n, _ in beam_specs)))

    def cand_stats(state_k, final):
        s = alignment_stats(state_k, final, cfg.image_h, cfg.image_w)
        if need_ir:   # the whole-image NN search is the expensive half
            s.update(nn_alignment_stats(state_k, final, cfg.image_h,
                                        cfg.image_w))
        return s

    def combine(stats_mat, name):
        """Candidate-axis score matrix for statistic ``name`` ([B, K])."""
        if name != "combo":
            return stats_mat[name]
        z = lambda a: ((a - a.mean(axis=1, keepdims=True))
                       / (a.std(axis=1, keepdims=True) + 1e-9))
        return (z(stats_mat["smooth_mean"])
                + 0.3 * z(stats_mat["ir_smooth"]))

    input_keys = ("img", "pc", "node", "pt2node", "K",
                  "R_amplitude", "T_amplitude")

    def perceive(batch_k):
        """Fine-stage geo forward -> episode/verification state dict."""
        geo_k = geo_model.apply(fine_vars, batch_k, train=False,
                                with_loss=False)
        state_k = {k: geo_k[k] for k in
                   ("pc", "pc_overlap_pred", "pc_is_in_cam_scores",
                    "pc_geo_feat", "img_geo_feat")}
        state_k["K"] = batch_k["K"]
        return state_k

    def run_fine(batch_k):
        """Re-perceive the rebased problem and run the agent episode;
        returns (episode state, final disentangled pose)."""
        state_k = perceive(batch_k)
        b = state_k["pc"].shape[0]
        pose_src = (bearing_init_pose(state_k) if cfg.bearing_init else
                    jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                     (b, 4, 4)))

        def apply_fn(avars, o2, o3):
            return agent.apply(avars, o2, o3, train=False)

        topk = cfg.episode_raster_topk()
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

    def refine(batch, total, name):
        """``refine_rounds`` verified rounds from estimate ``total``,
        accepting per sample only where statistic ``name`` improves in
        the round's perception frame; returns (pose, accepted stats)."""
        b = total.shape[0]
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        last = None
        for _ in range(refine_rounds):
            batch_m = apply_coarse_pose(batch, total)
            state_m, final_m = run_fine(batch_m)
            cand_total = entangle_and_compose(state_m, final_m, total)
            s_new = cand_stats(state_m, final_m)
            s_inc = cand_stats(state_m, eye)   # incumbent = identity here
            pair = {k2: jnp.stack([s_new[k2], s_inc[k2]], axis=1)
                    for k2 in s_new}
            acc = jnp.argmax(combine(pair, name), axis=1) == 0
            total = jnp.where(acc[:, None, None], cand_total, total)
            last = {k2: jnp.where(acc, s_new[k2], s_inc[k2])
                    for k2 in s_new}
        return total, last

    def fn(batch):
        geo_out = geo_model.apply(geo_variables, batch, train=False,
                                  with_loss=False)
        st = iter_model_state(geo_out, batch)
        out = iter_model.apply(iter_variables, st, train=False,
                               with_loss=False)
        cands = decode_topk_yaw_poses(
            out["cost_volume_logits"], st["R_amplitude"],
            st["T_amplitude"], cfg.nlabel, hypotheses)
        poses, stat_list = [], []
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
            stat_list.append(cand_stats(state_k, final))
        stats_mat = {k2: jnp.stack([s[k2] for s in stat_list], axis=1)
                     for k2 in stat_list[0]}               # [B, K] each
        scores = combine(stats_mat, hypo_score)            # [B, K]
        poses = jnp.stack(poses, axis=1)                   # [B, K, 4, 4]
        sel = jnp.argmax(scores, axis=1)
        pose = jnp.take_along_axis(
            poses, sel[:, None, None, None], axis=1)[:, 0]
        score = jnp.take_along_axis(scores, sel[:, None], axis=1)[:, 0]
        if refine_rounds > 0:
            members = beam_specs or ((hypo_score, 1),)
            m_poses, m_stats = [], []
            for name, rank in members:
                sc = combine(stats_mat, name)
                idx = (jnp.argmax(sc, axis=1) if rank == 1 else
                       jnp.argsort(-sc, axis=1)[:, rank - 1])
                total_m = jnp.take_along_axis(
                    poses, idx[:, None, None, None], axis=1)[:, 0]
                total_m, last = refine(batch, total_m, name)
                m_poses.append(total_m)
                m_stats.append(last)
            if len(members) > 1:
                if beam_frame == "shared":
                    # cross-frame comparable re-vote (mirrors
                    # cli.test_agent --beam-frame shared): score every
                    # member's absolute pose against every member's
                    # perception frame, z-score across poses within each
                    # frame, vote on the frame-averaged z
                    from ..ops.geometry import se3_inverse, to_disentangled
                    z = lambda a: ((a - a.mean(axis=1, keepdims=True))
                                   / (a.std(axis=1, keepdims=True) + 1e-9))
                    frame_scores = []
                    for t_frame in m_poses:
                        state_f = perceive(apply_coarse_pose(batch,
                                                             t_frame))
                        inv_f = se3_inverse(t_frame)
                        per_pose = [
                            cand_stats(state_f,
                                       to_disentangled(t_pose @ inv_f,
                                                       state_f["pc"]))
                            for t_pose in m_poses]
                        fmat = {k2: jnp.stack([s[k2] for s in per_pose],
                                              axis=1)
                                for k2 in per_pose[0]}
                        frame_scores.append(z(combine(fmat, beam_score)))
                    bscore = sum(frame_scores) / len(frame_scores)
                else:
                    bstats = {k2: jnp.stack([s[k2] for s in m_stats],
                                            axis=1)
                              for k2 in m_stats[0]}
                    bscore = combine(bstats, beam_score)
                bsel = jnp.argmax(bscore, axis=1)
                pose = jnp.take_along_axis(
                    jnp.stack(m_poses, axis=1),
                    bsel[:, None, None, None], axis=1)[:, 0]
                score = jnp.take_along_axis(bscore, bsel[:, None],
                                            axis=1)[:, 0]
            else:
                pose = m_poses[0]
                # combo is a cross-candidate z-score (meaningless for a
                # single member); report the accepted smooth_mean then
                rep = ("smooth_mean" if hypo_score == "combo"
                       else hypo_score)
                score = m_stats[0][rep]
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
