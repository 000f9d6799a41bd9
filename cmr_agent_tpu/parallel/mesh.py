"""Mesh construction + sharded step builders.

Sharding layout (scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives):

* ``dp`` — data parallel over the batch axis. Gradients all-reduce over ICI
  inside the compiled step.
* ``sp`` — sequence parallel over the long token axes (the 40960-point and
  H*W-pixel axes, SURVEY.md §5): inputs arrive point-sharded; XLA reshards
  around the segment/attention ops as needed. At reference scale a single
  chip holds everything, so ``sp`` is the documented scale-out axis rather
  than a necessity — the dry-run validates it compiles and runs.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models import MultiHeadModel


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("dp",),
              devices=None) -> Mesh:
    """Build a mesh over available devices; default: all devices on 'dp'."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: str = "dp"):
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))


def batch_token_sharding(mesh: Mesh, ndim: int, batch_axis: str = "dp",
                         token_axis: str = "sp"):
    """Shard axis 0 over dp and axis 1 (tokens/points) over sp."""
    rest = [None] * (ndim - 2)
    return NamedSharding(mesh, P(batch_axis, token_axis, *rest))


# Keys whose axis-1 is the point-token axis (shardable over 'sp').
_POINT_AXIS_KEYS = ("pc", "pt2node", "pc_mask", "pc_in_cam_space")


def shard_geo_batch(batch: Dict, mesh: Mesh, use_sp: bool = False) -> Dict:
    """Place a geo batch on the mesh: batch axis on dp, optionally the
    point-token axis on sp."""
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        if use_sp and k in _POINT_AXIS_KEYS and v.ndim >= 2 \
                and "sp" in mesh.axis_names:
            out[k] = jax.device_put(v, batch_token_sharding(mesh, v.ndim))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
    return out


def make_sharded_geo_train_step(cfg: Config, mesh: Mesh):
    """DP train step: replicated state, dp-sharded batch.

    jit compiles one SPMD program; the gradient all-reduce appears
    automatically because params are replicated while the loss averages
    over the sharded batch axis.
    """
    from ..train.train_geo import make_geo_train_step

    step = make_geo_train_step(cfg)

    def sharded_step(state, batch, rng):
        batch = shard_geo_batch(batch, mesh)
        return step(state, batch, rng)

    return sharded_step


def make_sharded_geo_forward(cfg: Config, mesh: Mesh, use_sp: bool = False):
    """Sharded frozen forward (inference path)."""

    @jax.jit
    def forward(params, batch_stats, batch):
        return MultiHeadModel(cfg).apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False, with_loss=False)

    def run(params, batch_stats, batch):
        batch = shard_geo_batch(batch, mesh, use_sp=use_sp)
        return forward(params, batch_stats, batch)

    return run
