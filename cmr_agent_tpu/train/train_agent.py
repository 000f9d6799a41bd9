"""Agent training: imitation (BC) + PPO, fully jitted.

Capability of reference Train_Agent.py:164-317: frozen geo forward, K-step
stochastic rollout with expert supervision, and a clipped-PPO + behavior-
cloning update over the gathered trajectories. The rollout is the
``lax.scan`` episode engine (zero host round-trips); the update is one
compiled minibatch step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..env import bearing_init_pose, init_poses, run_episode
from ..models import CMRAgent
from ..models.agent import action_logprob_and_entropy
from ..ops.geometry import pose_diff, to_disentangled
from ..ops.losses import softmax_cross_entropy
from .optim import make_optimizer


class AgentTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def create_agent_state(cfg: Config, example_obs2d, example_obs3d,
                       rng: jax.Array,
                       steps_per_epoch: int = 1000) -> AgentTrainState:
    agent = CMRAgent(cfg)
    init = jax.jit(lambda r, o2, o3: agent.init({"params": r}, o2, o3,
                                                train=False))
    variables = init(rng, example_obs2d, example_obs3d)
    tx = make_optimizer(cfg, steps_per_epoch)
    return AgentTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=agent.apply,
    )


def _episode_state(geo_out: Dict, batch: Dict) -> Dict:
    """Assemble the frozen episode state from geo outputs + batch tensors."""
    return {
        "pc": geo_out["pc"],
        "K": batch["K"],
        "pc_overlap_pred": geo_out["pc_overlap_pred"],
        "pc_geo_feat": geo_out["pc_geo_feat"],
        "img_geo_feat": geo_out["img_geo_feat"],
        "pc_in_cam_space": batch["pc_in_cam_space"],
        "pc_mask": batch["pc_mask"],
        "P": batch["P"],
    }


def make_rollout_fn(cfg: Config, reward_apply_pose: bool = True):
    """Jitted stochastic rollout with expert labels.

    ``(agent_state, geo_out, batch, key[, expert_beta]) -> (trajectory,
    final_pose, pose_target)``; the agent runs in eval mode during rollout
    (reference keeps ``agent.eval()``, Train_Agent.py:156). The optional
    ``expert_beta`` scalar enables DAgger scheduled sampling (see
    :func:`cmr_agent_tpu.env.run_episode`); pass a jnp scalar so annealing
    it does not retrace.
    """

    def rollout(agent_state: AgentTrainState, geo_out, batch, key,
                expert_beta=None):
        state = _episode_state(geo_out, batch)
        pose_src, pose_tgt = init_poses(state)
        if cfg.bearing_init:
            pose_src = bearing_init_pose(state)
        pose_tgt = to_disentangled(pose_tgt, state["pc"])

        def apply_fn(avars, o2, o3):
            return agent_state.apply_fn(avars, o2, o3, train=False)

        avars = {"params": agent_state.params,
                 "batch_stats": agent_state.batch_stats}
        topk = cfg.episode_raster_topk()
        final, traj = run_episode(
            apply_fn, avars, state, pose_src, pose_tgt, cfg,
            deterministic=False, key=key, with_expert=True,
            collect_trajectory=True, reward_apply_pose=reward_apply_pose,
            raster_topk=topk, expert_beta=expert_beta)
        return traj, final, pose_tgt

    return jax.jit(rollout)


def make_ppo_update_step(cfg: Config):
    """Jitted BC + PPO minibatch update (Train_Agent.py:263-305).

    ``(agent_state, minibatch) -> (agent_state, metrics)`` where the
    minibatch dict holds rows: state_2d, state_3d, expert_action_r/t,
    action_r/t, action_logprob, returns, advantage.
    """

    def update(agent_state: AgentTrainState, mb: Dict):
        def loss_fn(params):
            (r_logits, t_logits, value), mutated = agent_state.apply_fn(
                {"params": params, "batch_stats": agent_state.batch_stats},
                mb["state_2d"], mb["state_3d"], train=True,
                mutable=["batch_stats"])

            # behavior cloning: CE against expert actions
            loss_r = softmax_cross_entropy(
                r_logits.reshape(-1, cfg.num_steps),
                mb["expert_action_r"].reshape(-1))
            loss_t = softmax_cross_entropy(
                t_logits.reshape(-1, cfg.num_steps),
                mb["expert_action_t"].reshape(-1))
            clone_loss = loss_r + loss_t

            # PPO terms
            new_logprob, new_entropy = action_logprob_and_entropy(
                r_logits, t_logits, mb["action_r"], mb["action_t"])
            # Bound the importance ratio in log space. On-policy (the
            # reference regime) |log ratio| << 2 and this is inert; under
            # off-policy rollouts (DAgger expert_beta, stale buffers) a
            # taken action can have policy logprob ~ -30, and the raw
            # exp() overflows f32 — the clip(min(...)) pair does NOT
            # bound that branch when advantage < 0 (min picks the
            # unclipped term), which measured as bc_loss 4.7 -> 18 -> nan
            # within ~200 updates (round-3 run C).
            ratio = jnp.exp(jnp.clip(new_logprob - mb["action_logprob"],
                                     -2.0, 2.0))
            adv = mb["advantage"].reshape(mb["advantage"].shape[0], 1)
            policy_loss = -jnp.mean(jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv))
            value_loss = jnp.mean(
                (value.reshape(-1, 1) - mb["returns"].reshape(-1, 1)) ** 2)
            entropy_loss = jnp.mean(new_entropy)

            ppo_loss = (policy_loss + value_loss * cfg.w_value
                        - entropy_loss * cfg.w_entropy)
            loss = clone_loss + cfg.alpha * ppo_loss
            aux = {
                "bc_loss": clone_loss, "ppo_loss": ppo_loss,
                "policy_loss": policy_loss, "value_loss": value_loss,
                "entropy": entropy_loss,
                "batch_stats": mutated.get("batch_stats",
                                           agent_state.batch_stats),
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            agent_state.params)
        updates, new_opt = agent_state.tx.update(
            grads, agent_state.opt_state, agent_state.params)
        new_params = optax.apply_updates(agent_state.params, updates)
        new_stats = aux.pop("batch_stats")
        metrics = dict(aux, loss=loss)
        new_state = agent_state.replace(
            step=agent_state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    return jax.jit(update, donate_argnums=(0,))


def make_val_episode_fn(cfg: Config):
    """Jitted deterministic eval episode -> (RTE, RRE) per sample
    (Train_Agent.py:170-203 / Test_Agent.py:149-191).
    """

    def val_episode(agent_state: AgentTrainState, geo_out, batch):
        state = _episode_state(geo_out, batch)
        pose_src, pose_tgt = init_poses(state)
        if cfg.bearing_init:
            pose_src = bearing_init_pose(state)
        pose_tgt = to_disentangled(pose_tgt, state["pc"])

        def apply_fn(avars, o2, o3):
            return agent_state.apply_fn(avars, o2, o3, train=False)

        avars = {"params": agent_state.params,
                 "batch_stats": agent_state.batch_stats}
        topk = cfg.episode_raster_topk()
        final, _ = run_episode(apply_fn, avars, state, pose_src, pose_tgt,
                               cfg, deterministic=True, raster_topk=topk)
        rte, rre = pose_diff(final, pose_tgt)
        return final, rte, rre

    return jax.jit(val_episode)
