"""Orbax checkpointing.

Replaces the reference's ``torch.save(state_dict())``-on-best flow
(Train_Geo.py:161-163, Train_Agent.py:205-210) with Orbax: atomic,
async-capable, sharding-aware checkpoints that restore directly onto a
device mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params / batch_stats / opt_state / step) at ``path``."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; ``template`` (abstract or concrete) fixes structure,
    dtypes and shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
