"""Trajectory buffer, discounted returns and GAE.

Capability of reference environment/buffer.py:24-160, restructured for the
scan-based episode engine: a rollout arrives as a dict of ``[K, B, ...]``
tensors (one ``run_episode`` call), the buffer holds ``num_trajectory`` of
them, and ``samples()`` flattens trajectories x steps x batch into training
rows with per-trajectory returns and GAE advantages.

Deviation from the reference (deliberate fix): the reference's ``catcat``
flattens states/actions in (step, batch) order but returns/advantages in
(batch, step) order (buffer.py:127-143 — reducing over a tensor's first
axis), silently permuting PPO targets against their states whenever the
rollout batch size > 1. Here every key flattens in the same (step, batch)
order.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp


def discounted_returns(vals: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Reverse discounted cumulative sum over the leading (step) axis.

    Matches reference buffer.py:24-33 (there over the trailing axis).
    """
    def body(g, v):
        g = v + gamma * g
        return g, g

    zero = jnp.zeros_like(vals[0])
    _, out = jax.lax.scan(body, zero, vals, reverse=True)
    return out


def gae_advantage(rewards: jnp.ndarray, values: jnp.ndarray, gamma: float,
                  gae_lambda: float) -> jnp.ndarray:
    """Generalized advantage estimation over the leading step axis.

    ``gae_lambda == 0`` falls back to ``returns - values``
    (reference buffer.py:36-50; terminal value bootstrapped with 0).
    """
    if gae_lambda == 0:
        return discounted_returns(rewards, gamma) - values
    v_next = jnp.concatenate([values[1:], jnp.zeros_like(values[:1])], axis=0)
    deltas = rewards + gamma * v_next - values
    return discounted_returns(deltas, gamma * gae_lambda)


class TrajectoryBuffer:
    """Collects ``num_trajectory`` scan rollouts, then yields flat samples.

    Keys expected per rollout (all ``[K, B, ...]``): state_2d, state_3d,
    value, reward, expert_action_r, expert_action_t, action_r, action_t,
    action_logprob.
    """

    KEYS = ("state_2d", "state_3d", "value", "expert_action_r",
            "expert_action_t", "action_r", "action_t", "action_logprob")

    def __init__(self, gamma: float, gae_lambda: float):
        self.gamma = gamma
        self.gae_lambda = gae_lambda
        self._trajectories: List[Dict[str, jnp.ndarray]] = []

    def __len__(self) -> int:
        return len(self._trajectories)

    def add(self, rollout: Dict[str, jnp.ndarray]) -> None:
        self._trajectories.append(rollout)

    def clear(self) -> None:
        self._trajectories.clear()

    def samples(self) -> Dict[str, jnp.ndarray]:
        """Flatten to ``[T*K*B, ...]`` rows + ``returns`` and ``advantage``."""
        assert self._trajectories, "empty buffer"
        out: Dict[str, List[jnp.ndarray]] = {k: [] for k in self.KEYS}
        out["returns"] = []
        out["advantage"] = []

        for traj in self._trajectories:
            rewards = traj["reward"]                      # [K, B, 1, 1]
            values = traj["value"]
            returns = discounted_returns(rewards, self.gamma)
            adv = gae_advantage(rewards, values, self.gamma, self.gae_lambda)
            for k in self.KEYS:
                out[k].append(_flatten_steps(traj[k]))
            out["returns"].append(_flatten_steps(returns))
            out["advantage"].append(_flatten_steps(adv))

        return {k: jnp.concatenate(v, axis=0) for k, v in out.items()}


def _flatten_steps(x: jnp.ndarray) -> jnp.ndarray:
    """[K, B, ...] -> [K*B, ...]."""
    return x.reshape((-1,) + x.shape[2:])
