"""Point branch: grouped/knn point transformers + proxy ViT.

Capability of reference models/PointNN.py:126-232 (GroupPointTransformer,
KnnPointTransformer) and models/PointViT.py:8-205 (hierarchical embeddings:
40960 points -> 1280 nodes -> 256 proxies, then self-attention).

TPU design: the reference's torch_scatter group softmax becomes the fused
:func:`cmr_agent_tpu.ops.segment_softmax_attend`; the dense 1280x1280 knn
uses a single MXU distance contraction + top_k.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.scatter import batched_segment_softmax_attend
from ..ops.sampling import index_points, knn_indices
from .layers import MiniPointNet, ViTBlock, torch_kernel_init


def _dense(features, name, use_bias=True, dtype=None):
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=torch_kernel_init, name=name, dtype=dtype)


class GroupPointTransformer(nn.Module):
    """Point-transformer attention from N points into their assigned node.

    The segmented-softmax attention of the reference
    (models/PointNN.py:126-185): each point attends within its node group
    (relative-position encoded), and groups aggregate with a per-group,
    per-channel softmax.

    Inputs (channels-last):
      xyz [B,N,3], x_feat [B,N,F], node [B,M,3], node_feat [B,M,F], idx [B,N].
    Returns updated node features [B,M,F].
    """

    d_model: int
    dtype: Any = None
    use_pallas: Any = None  # Config.use_pallas; None = backend default

    @nn.compact
    def __call__(self, xyz, x_feat, node, node_feat, idx):
        f = self.d_model
        m = node.shape[1]
        pre = node_feat
        dt = self.dtype
        dense = lambda feats, name, bias=True: _dense(feats, name, bias, dt)

        x = dense(f, "fc1_points")(x_feat)
        xx = dense(f, "fc1_nodes")(node_feat)
        q = dense(f, "w_q", False)(xx)                # [B, M, F]
        k = dense(f, "w_k", False)(x)                 # [B, N, F]
        v = dense(f, "w_v", False)(x)                 # [B, N, F]

        q_at_pt = index_points(q, idx, self.use_pallas)    # [B, N, F]
        centers = index_points(node, idx, self.use_pallas)  # [B, N, 3]

        delta = (xyz - centers).astype(x_feat.dtype)
        pos = dense(f, "fc_delta_0")(delta)
        pos = nn.relu(pos)
        pos = dense(f, "fc_delta_1")(pos)

        attn = q_at_pt - k + pos
        attn = dense(f, "fc_gamma_0")(attn)
        attn = nn.relu(attn)
        attn = dense(f, "fc_gamma_1")(attn)
        attn = attn / jnp.sqrt(jnp.asarray(f, attn.dtype))

        # fused kernel computes in f32; cast back to the compute dtype
        agg = batched_segment_softmax_attend(
            attn.astype(jnp.float32), (v + pos).astype(jnp.float32), idx, m,
            use_pallas=self.use_pallas)
        agg = agg.astype(attn.dtype)
        return dense(f, "fc2")(agg) + pre


class KnnPointTransformer(nn.Module):
    """Vector attention over k nearest neighbours (PointNN.py:188-232)."""

    d_model: int
    k: int = 16
    dtype: Any = None
    use_pallas: Any = None  # Config.use_pallas; None = backend default

    @nn.compact
    def __call__(self, xyz, feat, knn_idx=None):
        f = self.d_model
        dt = self.dtype
        up = self.use_pallas
        dense = lambda feats, name, bias=True: _dense(feats, name, bias, dt)
        if knn_idx is None:
            knn_idx = knn_indices(xyz, xyz, self.k, up)   # [B, M, k]
        knn_xyz = index_points(xyz, knn_idx, up)          # [B, M, k, 3]

        pre = feat
        x = dense(f, "fc1")(feat)
        q = dense(f, "w_q", False)(x)
        k = index_points(dense(f, "w_k", False)(x), knn_idx, up)
        v = index_points(dense(f, "w_v", False)(x), knn_idx, up)

        delta = (xyz[:, :, None, :] - knn_xyz).astype(feat.dtype)
        pos = dense(f, "fc_delta_0")(delta)
        pos = nn.relu(pos)
        pos = dense(f, "fc_delta_1")(pos)

        attn = q[:, :, None, :] - k + pos
        attn = dense(f, "fc_gamma_0")(attn)
        attn = nn.relu(attn)
        attn = dense(f, "fc_gamma_1")(attn)
        attn = nn.softmax(attn / jnp.sqrt(jnp.asarray(f, attn.dtype)), axis=-2)

        res = jnp.sum(attn * (v + pos), axis=-2)      # [B, M, F]
        return dense(f, "fc2")(res) + pre


class PointTransformer(nn.Module):
    """Hierarchical point encoder (reference models/PointViT.py:8-205).

    points --group-attend--> nodes --knn-attend--> nodes --group-attend-->
    proxies (the first ``num_proxy`` FPS-ordered nodes) --> SA blocks.

    Returns ``(proxy_feat [B,P,F], node2proxy [B,M], pt_feat [B,N,F],
    node_feat [B,M,F])``.
    """

    cfg: Config

    @nn.compact
    def __call__(self, pc, node, pt2node, train: bool, pc_knn=None):
        cfg = self.cfg
        f = cfg.embed_dim
        dt = cfg.jnp_dtype()
        pc_c = pc.astype(dt)
        node_c = node.astype(dt)

        raw_mlp = MiniPointNet(f, dtype=dt, use_pallas=cfg.use_pallas,
                               name="raw_point_mlp")
        if cfg.use_gnn_embedding:
            # The reference's use_gnn_embedding branch is dead upstream
            # (PointViT.py:51-56 ends in `pass` and returns an undefined
            # variable); this COMPLETES its intent: EdgeConv embedding of
            # the raw points over the dataset's host-built knn plus a
            # pointwise positional MLP (PointViT.py:16-28), then the
            # standard node/proxy hierarchy below.
            assert pc_knn is not None, \
                "use_gnn_embedding needs the dataset's pc_knn key"
            from .gnn import MiniGNN
            from .layers import DenseBNLeaky
            feat = MiniGNN(out_features=f, name="mini_gnn")(
                pc_c, pc_knn, train)
            pos = DenseBNLeaky(128, dtype=dt, name="pos_embed_0")(pc_c, train)
            pos = _dense(f, "pos_embed_1", dtype=dt)(pos)
            x_feat = (feat + pos).astype(dt)
        else:
            x_feat = raw_mlp(pc_c, train)
        node_feat = raw_mlp(node_c, train)

        node_feat = GroupPointTransformer(f, dtype=dt, use_pallas=cfg.use_pallas,
                                          name="group_0")(
            pc, x_feat, node, node_feat, pt2node)
        back = index_points(node_feat, pt2node, cfg.use_pallas)
        x_feat = MiniPointNet(f, dtype=dt, use_pallas=cfg.use_pallas,
                              name="point_mlp_0")(
            jnp.concatenate([x_feat, back], axis=-1), train)

        node_feat = GroupPointTransformer(f, dtype=dt, use_pallas=cfg.use_pallas,
                                          name="group_1")(
            pc, x_feat, node, node_feat, pt2node)
        back = index_points(node_feat, pt2node, cfg.use_pallas)
        x_feat = MiniPointNet(f, dtype=dt, use_pallas=cfg.use_pallas,
                              name="point_mlp_1")(
            jnp.concatenate([x_feat, back], axis=-1), train)

        node_feat = GroupPointTransformer(f, dtype=dt, use_pallas=cfg.use_pallas,
                                          name="group_node")(
            pc, x_feat, node, node_feat, pt2node)

        # the 3 knn layers share one neighbourhood (coordinates are fixed;
        # the reference recomputes the same knn per layer, PointNN.py:215-217)
        knn_idx = knn_indices(node, node, cfg.knn_k, cfg.use_pallas)
        for i in range(3):
            node_feat = KnnPointTransformer(f, cfg.knn_k, dtype=dt,
                                            use_pallas=cfg.use_pallas,
                                            name=f"knn_{i}")(node, node_feat,
                                                             knn_idx)

        # Proxies = first num_proxy FPS-ordered nodes (PointViT.py:83-84);
        # nearest-proxy assignment is a pure function of coordinates.
        proxy = node[:, : cfg.num_proxy, :]
        proxy_feat = node_feat[:, : cfg.num_proxy, :]
        d = jnp.linalg.norm(node[:, :, None, :] - proxy[:, None, :, :], axis=-1)
        node2proxy = jnp.argmin(d, axis=-1).astype(jnp.int32)

        proxy_feat = GroupPointTransformer(f, dtype=dt, use_pallas=cfg.use_pallas,
                                          name="group_proxy")(
            node, node_feat, proxy, proxy_feat, node2proxy)

        for i in range(cfg.num_sa_layer):
            proxy_feat = ViTBlock(cfg.num_head, cfg.mlp_dim,
                                  cfg.attention_dropout, cfg.mlp_dropout,
                                  dtype=dt, name=f"sa_{i}")(proxy_feat, train)
        return proxy_feat, node2proxy, x_feat, node_feat
