"""Device meshes + sharded training/eval steps.

The reference is strictly single-GPU (SURVEY.md §2.7: no DP/TP/PP/SP, a
pinned device at Train_Agent.py:8). Here multi-chip scaling is first-class:
a ``jax.sharding.Mesh`` with a ``dp`` (batch) axis and an optional ``sp``
(token/sequence) axis; jit + sharding annotations let XLA place the
gradient all-reduce and any resharding collectives on ICI.
"""

from .mesh import (  # noqa: F401
    make_mesh, replicate, batch_sharding, batch_token_sharding,
    make_sharded_geo_train_step, make_sharded_geo_forward,
)
from .distributed import (  # noqa: F401
    initialize as initialize_distributed,
    host_local_batch_to_global, shard_range,
)
