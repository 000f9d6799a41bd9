"""On-device registration environment + episode engine."""

from .environment import (  # noqa: F401
    init_poses,
    bearing_init_pose,
    apply_coarse_pose,
    alignment_score,
    alignment_stats,
    nn_alignment_stats,
    compose_disentangled,
    expert_action,
    apply_action,
    observation_from_pose,
    step_reward,
)
from .episode import run_episode, EpisodeCarry  # noqa: F401
from .buffer import (  # noqa: F401
    TrajectoryBuffer, discounted_returns, gae_advantage,
)
