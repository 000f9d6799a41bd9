"""Multi-host (multi-process) scale-out entry point.

The reference is single-GPU, single-process (Train_Geo.py:8 pins
``CUDA_VISIBLE_DEVICES="0"``; SURVEY.md §2.7: no distributed machinery of
any kind). The TPU-native scale-out analog is:

* within a slice — XLA collectives over ICI, driven by mesh shardings
  (``parallel.mesh``), all inside one process per host;
* across hosts/slices — ``jax.distributed.initialize`` connects the
  processes over DCN; ``jax.devices()`` then reports the *global* device
  set, so the same ``make_mesh``/``shard_geo_batch`` code scales out
  unchanged (the scaling-book recipe: pick a mesh, annotate, let XLA
  insert collectives; DCN traffic only crosses the mesh axes that span
  hosts).

Data feeding is per-process: each process should load its own shard of
the dataset (``process_index``/``process_count`` below) and build global
arrays with :func:`host_local_batch_to_global`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Connect this process to the multi-host job.

    Thin wrapper over ``jax.distributed.initialize`` so CLIs share one
    call site. On TPU pods the arguments are discovered from the
    environment and may all be None; for CPU/GPU jobs (and the 2-process
    CPU smoke test) they must be passed explicitly. Must run before any
    device use in the process.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def shard_range(n: int) -> range:
    """This process's contiguous shard of ``range(n)`` (dataset sharding)."""
    per = (n + jax.process_count() - 1) // jax.process_count()
    lo = jax.process_index() * per
    return range(lo, min(lo + per, n))


def host_local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh,
                               batch_axis: str = "dp") -> Dict:
    """Assemble per-process local batches into global dp-sharded arrays.

    Each process passes its local batch (batch axis = global_batch /
    process_count); the result is a dict of global jax.Arrays sharded over
    ``mesh[batch_axis]`` whose addressable shards are this process's data.
    """
    out = {}
    for key, v in batch.items():
        v = np.asarray(v)
        spec = P(batch_axis, *([None] * (v.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        out[key] = jax.make_array_from_process_local_data(sharding, v)
    return out


def global_batch_size(local_batch_size: int) -> int:
    return local_batch_size * jax.process_count()


def barrier(name: str, timeout_s: float = 900.0) -> None:
    """Coordination-service barrier — aligns processes WITHOUT a device
    collective.

    Needed before the *first execution* of a freshly-compiled collective
    program: XLA:CPU's Gloo context initialisation has a hard 30 s
    key-value timeout, and per-process compile skew (contended hosts, cold
    caches) easily exceeds it — one process enters the all-reduce while
    the other is still compiling, and the whole job dies. AOT-compile
    (``jit(f).lower(...).compile()``), hit this barrier, then execute.
    No-op in single-process jobs.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def psum_scalar(x):
    """Cross-process scalar sum (e.g. metric reduction).

    Uses the standard multihost allgather rather than a hand-built mesh
    array: a per-process ``[1]`` shard only tiles a mesh axis when every
    process holds exactly one device, which is false on real pods
    (4 local chips/host).
    """
    from jax.experimental import multihost_utils

    local = np.asarray(jnp.asarray(x, jnp.float32))
    return float(np.sum(multihost_utils.process_allgather(local)))
