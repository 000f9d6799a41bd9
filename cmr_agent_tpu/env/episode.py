"""Whole-episode engine as a single ``lax.scan``.

The reference runs the K-step refinement as a Python loop with per-step
host round-trips (scipy euler in the expert, per-sample observation loops;
Test_Agent.py:158-170, Train_Agent.py:223-250). Here the full episode —
observation -> policy -> action -> pose update -> reward x K — is one
compiled on-device program; the trajectory (for BC/PPO) comes back as
stacked scan outputs.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from .environment import (apply_action, compact_observation_state,
                          expert_action, observation_from_pose, step_reward)
from ..models.agent import action_from_logits, action_logprob_and_entropy


class EpisodeCarry(NamedTuple):
    pose: jnp.ndarray          # [B, 4, 4]
    prev_distance: jnp.ndarray  # [B, 1, 1]
    key: jax.Array


def run_episode(
    agent_apply: Callable,
    agent_vars: Any,
    state: dict,
    pose_init: jnp.ndarray,
    pose_target: Optional[jnp.ndarray],
    cfg: Config,
    *,
    deterministic: bool = True,
    key: Optional[jax.Array] = None,
    with_expert: bool = False,
    collect_trajectory: bool = False,
    reward_apply_pose: bool = True,
    raster_topk: Optional[int] = None,
    expert_beta: Optional[jnp.ndarray] = None,
):
    """Run a K-step registration episode on device.

    Args:
      agent_apply: ``(vars, obs2d, obs3d) -> (r_logits, t_logits, value)``.
      state: dict holding the frozen geo outputs and batch tensors:
        ``pc, K, pc_overlap_pred, pc_geo_feat, img_geo_feat`` (observation),
        plus ``pc_in_cam_space, pc_mask`` when trajectories are collected
        (reward).
      pose_init: ``[B,4,4]`` starting estimate (identity).
      pose_target: ``[B,4,4]`` disentangled ground truth (expert/reward);
        may be None when ``with_expert=False`` and no trajectory is needed.
      deterministic: argmax policy (eval) vs categorical sampling (rollout).
      key: PRNG key (required when sampling).
      with_expert: also compute the expert action each step (imitation).
      collect_trajectory: return per-step tensors for BC/PPO.
      reward_apply_pose: True = fixed reward semantics; False = reproduce
        the reference's degenerate constant-distance reward.
      raster_topk: if set, compact the 2-D observation rasterisation to the
        top-K overlap points once for the whole episode (the overlap mask is
        step-invariant) — exact when the overlap count <= K.
      expert_beta: optional traced scalar in [0, 1] — DAgger scheduled
        sampling: each (sample, step) takes the EXPERT action instead of
        the sampled policy action with this probability. The recorded
        ``action_r/t`` and ``action_logprob`` describe the action actually
        taken (policy log-prob of it), so BC stays exact DAgger and the
        PPO ratio is an ordinary clipped off-policy correction. The
        reference trains pure on-policy (Train_Agent.py:252-311), which at
        the full ±10 m/±π protocol parks rollouts in far states whose
        expert labels are all saturated max-steps; β annealed 1→0 visits
        the expert's own state distribution first. Requires
        ``with_expert=True``; ``None`` disables (no extra ops traced).

    Returns:
      ``(final_pose [B,4,4], trajectory dict or None)``. Trajectory tensors
      are stacked over the step axis: ``state_2d [K,B,H,W,2F]``,
      ``state_3d [K,B,N,5]`` (``[K,B,N,7]`` with
      ``cfg.obs_bearing_channels``), ``value/reward [K,B,1,1]``,
      ``expert_action_r/t``, ``action_r/t``, ``action_logprob [K,B,dr+dt]``.
    """
    r_steps = jnp.asarray(cfg.r_steps_array())
    t_steps = jnp.asarray(cfg.t_steps_array())
    if key is None:
        key = jax.random.key(0)
    if raster_topk is not None:
        # The pack kernel has no VJP and drops by index, not score: the
        # trajectory-collecting (training) path keeps the ranked top-k.
        # "mega" compacts via pack (both are eval-only TPU paths).
        state = compact_observation_state(
            state, raster_topk,
            mode=("pack" if (cfg.raster_mode in ("pack", "mega")
                             and not collect_trajectory) else "topk"),
            use_pallas=cfg.use_pallas)
        if (cfg.raster_mode in ("mega", "megatopk")
                and not collect_trajectory
                and "raster_pcT" not in state):
            # pack provides raster_pcT; the topk fallback doesn't — build
            # the channel-major twin once per episode, not per step
            state = dict(state)
            state["raster_pcT"] = jnp.swapaxes(state["raster_pc"], 1, 2)

    # Channel-major observations on the fused-eval path: every per-step
    # [B, N, narrow] tensor (projection chains, the 5..7-channel 3-D
    # observation) would otherwise materialise with its minormost dim
    # padded to 128 lanes — up to 25x the logical bytes per step. The
    # trajectory-collecting (training) path keeps the reference layout
    # (BC/PPO buffers and the torch-parity agent consume [K, B, N, C]).
    import os
    from ..models.layers import fused_stack_mode
    obs3d_layout = ("cn" if (not collect_trajectory
                             and (fused_stack_mode(cfg.use_pallas, False,
                                                   scope="agent")
                                  is not None
                                  or os.environ.get("CMR_OBS3D_CN") == "1"))
                    else "nc")
    if obs3d_layout == "cn":
        state = dict(state)
        state["pcT"] = jnp.swapaxes(state["pc"], 1, 2)        # once/episode
        if "raster_pc" in state and "raster_pcT" not in state:
            state["raster_pcT"] = jnp.swapaxes(state["raster_pc"], 1, 2)

    need_reward = collect_trajectory
    if need_reward:
        _, dist0 = step_reward(pose_init, state,
                               apply_pose=reward_apply_pose)
    else:
        b = pose_init.shape[0]
        dist0 = jnp.zeros((b, 1, 1), jnp.float32)

    def step_fn(carry: EpisodeCarry, _):
        pose = carry.pose

        if with_expert:
            exp_r, exp_t = expert_action(pose, pose_target, r_steps, t_steps,
                                         cfg.is_6_dof)
        else:
            exp_r = exp_t = None

        # bf16 episodes run the raster's one-hot matmul in bf16 too (f32
        # accumulation; the agent consumes the observation in bf16 anyway);
        # cfg.raster_int8 upgrades it to the 2x-rate int8 MXU path —
        # EVAL episodes only (the training scans keep the composable bf16
        # raster whose VJP was never trained through a quantiser) and
        # bf16 episodes only (int8 in an f32 episode would silently trade
        # precision the caller asked for; the flag is a no-op there —
        # ADVICE r4).
        raster_dtype = (jnp.int8 if (cfg.raster_int8
                                     and not collect_trajectory
                                     and cfg.compute_dtype == "bfloat16")
                        else jnp.bfloat16
                        if cfg.compute_dtype == "bfloat16" else None)
        obs2d, obs3d = observation_from_pose(
            state, pose, cfg.image_h, cfg.image_w,
            use_pallas=cfg.use_pallas, raster_dtype=raster_dtype,
            pose_aware=cfg.pose_aware_observation,
            bearing_channels=cfg.obs_bearing_channels,
            # the mega (projection-fused) raster has no VJP: training
            # episodes keep the composable project->raster path.
            # "megatopk" = ranked compaction (today's exact drop
            # semantics) + the mega raster.
            raster_mode=("topk" if (cfg.raster_mode in ("mega", "megatopk")
                                    and collect_trajectory)
                         else "mega" if cfg.raster_mode == "megatopk"
                         else cfg.raster_mode),
            obs3d_layout=obs3d_layout,
            # compacted 3-D observation: eval-only (training trajectories
            # keep the reference's full-cloud layout for BC/PPO parity)
            obs3d_compact=(cfg.obs3d_source == "compact"
                           and not collect_trajectory
                           and raster_topk is not None))
        r_logits, t_logits, value = agent_apply(agent_vars, obs2d, obs3d)

        new_key, sub = jax.random.split(carry.key)
        action_r, action_t = action_from_logits(
            r_logits, t_logits, key=sub, deterministic=deterministic)
        if expert_beta is not None:
            assert with_expert, "expert_beta needs expert actions"
            new_key, bsub = jax.random.split(new_key)
            mix = (jax.random.uniform(bsub, (action_r.shape[0], 1))
                   < expert_beta)
            action_r = jnp.where(mix, exp_r, action_r)
            action_t = jnp.where(mix, exp_t, action_t)

        new_pose = apply_action(action_r, action_t, pose, r_steps, t_steps,
                                cfg.is_6_dof)

        if need_reward:
            reward, dist = step_reward(new_pose, state, carry.prev_distance,
                                       apply_pose=reward_apply_pose)
        else:
            reward, dist = carry.prev_distance * 0, carry.prev_distance

        out = None
        if collect_trajectory:
            logprob, entropy = action_logprob_and_entropy(
                r_logits, t_logits, action_r, action_t)
            out = {
                "state_2d": obs2d,
                "state_3d": obs3d,
                "value": value,
                "reward": reward,
                "expert_action_r": exp_r,
                "expert_action_t": exp_t,
                "action_r": action_r,
                "action_t": action_t,
                "action_logprob": logprob,
                "entropy": entropy,
            }
            out = {k: v for k, v in out.items() if v is not None}

        return EpisodeCarry(new_pose, dist, new_key), out

    carry0 = EpisodeCarry(pose_init, dist0, key)
    carry, traj = jax.lax.scan(step_fn, carry0, None, length=cfg.action_num)
    return carry.pose, traj
