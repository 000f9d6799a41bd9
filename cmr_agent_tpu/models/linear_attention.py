"""LoFTR-style linear attention (O(N) in tokens).

Capability of reference models/LinearAttention.py:8-73: elu(x)+1 feature
map, KV outer-product accumulation, per-query normaliser, concat-FFN with
residual. This is the fine-fusion workhorse between 5120 pixels and 1280
nodes (IMGPCEnDecoder.py:101-110) — the two einsums are plain MXU
contractions, so XLA already runs this at near roofline.

Sequence parallelism: when the ambient mesh (``jax.sharding.set_mesh``)
has an ``sp`` axis of size > 1, the message computation routes through
the psum-decomposed form (``parallel.sp``): each chip reduces its own
token shard's ``KV``/``K``-sum, psums the O(H*D*D) partials over ICI
(constant in sequence length) and finishes its query shard locally —
the reference's 5120x1280 fine-fusion extension point
(IMGPCEnDecoder.py:101-110, SURVEY.md §2.7/§5).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import torch_kernel_init


class LinearAttention(nn.Module):
    """``x`` [B, L, C] attends to ``y`` [B, S, C] in O(L + S)."""

    num_heads: int
    eps: float = 1e-6
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y, train: bool):
        d = x.shape[-1]
        head_dim = d // self.num_heads
        b, l, _ = x.shape
        s = y.shape[1]

        proj = lambda name: nn.Dense(d, use_bias=False,
                                     kernel_init=torch_kernel_init,
                                     name=name, dtype=self.dtype)
        q = proj("q_proj")(x).reshape(b, l, self.num_heads, head_dim)
        k = proj("k_proj")(y).reshape(b, s, self.num_heads, head_dim)
        v = proj("v_proj")(y).reshape(b, s, self.num_heads, head_dim)

        q = nn.elu(q) + 1.0
        k = nn.elu(k) + 1.0

        v = v / s  # overflow guard (reference LinearAttention.py:57)
        mesh = jax.sharding.get_abstract_mesh()
        if not mesh.empty and "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
            from ..parallel.sp import sp_linear_attention_message
            msg = sp_linear_attention_message(q, k, v, mesh=mesh,
                                              eps=self.eps) * s
        else:
            kv = jnp.einsum("bshd,bshv->bhdv", k, v)
            z = 1.0 / (jnp.einsum("blhd,bhd->blh", q, k.sum(axis=1))
                       + self.eps)
            msg = jnp.einsum("blhd,bhdv,blh->blhv", q, kv, z) * s

        msg = proj("merge")(msg.reshape(b, l, d))
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(msg)
        msg = nn.Dropout(self.dropout, deterministic=not train)(msg)

        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(2 * d, use_bias=False, kernel_init=torch_kernel_init,
                     name="mlp_0", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(d, use_bias=False, kernel_init=torch_kernel_init,
                     name="mlp_1", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(h)
        return x + h
