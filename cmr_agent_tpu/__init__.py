"""cmr_agent_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
cross-modal iterative image-to-point-cloud registration.

Re-implements the full capability surface of the CMR-Agent reference
(y2w-oc/CMR-Agent, IROS 2024) as an idiomatic TPU framework:

* ``cmr_agent_tpu.config``    — frozen dataclass configurations (KITTI / NuScenes)
* ``cmr_agent_tpu.ops``       — core array ops: segment softmax, FPS, knn,
                                camera projection, SE(3) / euler utilities, losses
* ``cmr_agent_tpu.models``    — Flax modules: image/point encoders, cross-modal
                                fusion, multi-head geo model, RL agent, cost volume
* ``cmr_agent_tpu.env``       — on-device registration environment + lax.scan episode
* ``cmr_agent_tpu.data``      — host data pipelines (KITTI / NuScenes / synthetic)
* ``cmr_agent_tpu.parallel``  — device meshes + sharded train/eval steps
* ``cmr_agent_tpu.train``     — optimizers, training loops, checkpointing,
                                torch-checkpoint weight converter
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
