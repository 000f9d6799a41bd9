"""EdgeConv GNN embedding + siamese residual MLP.

Capability surface of reference models/PointNN.py:10-93 (MiniGNN — the
``use_gnn_embedding=True`` path of the point branch) and :235-257
(SiameseResMLP). Channels-last throughout.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import index_points
from .layers import BatchNorm, DenseBNLeaky, ResDenseBlock, leaky, torch_kernel_init


class _EdgeConv(nn.Module):
    """One DGCNN edge conv: MLP([x_j - x_i, x_i]) then max over neighbours."""

    features: int

    @nn.compact
    def __call__(self, x, knn_idx, train: bool):
        # x [B, N, C], knn_idx [B, N, K]
        neigh = index_points(x, knn_idx)                 # [B, N, K, C]
        center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
        edge = jnp.concatenate([neigh - center, center], axis=-1)
        h = nn.Dense(self.features, kernel_init=torch_kernel_init)(edge)
        h = BatchNorm()(h, train)
        h = leaky(h)
        return jnp.max(h, axis=2)                        # [B, N, F]


class MiniGNN(nn.Module):
    """Static-knn EdgeConv stack (PointNN.py:10-93): point MLP embedding,
    five edge convs, final pointwise MLP.
    """

    edge_conv_dim: int = 64
    out_features: int = 64

    @nn.compact
    def __call__(self, x, knn_idx, train: bool = False):
        h = DenseBNLeaky(self.edge_conv_dim, name="embed_0")(x, train)
        h = DenseBNLeaky(self.edge_conv_dim, name="embed_1")(h, train)
        dims = [self.edge_conv_dim, self.edge_conv_dim, self.out_features,
                self.out_features, self.out_features]
        for i, d in enumerate(dims):
            h = _EdgeConv(d, name=f"edge_{i}")(h, knn_idx, train)
        return DenseBNLeaky(self.out_features, name="final")(h, train)


class SiameseResMLP(nn.Module):
    """Residual pointwise MLP tower (PointNN.py:235-257)."""

    features: int
    num_block: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_block):
            x = ResDenseBlock(self.features, name=f"res_{i}")(x, train)
        h = nn.Dense(self.features, kernel_init=torch_kernel_init,
                     name="out_0")(x)
        h = BatchNorm(name="out_bn")(h, train)
        h = leaky(h)
        return nn.Dense(self.features, kernel_init=torch_kernel_init,
                        name="out_1")(h)
