"""Cross-modal fusion: coarse proxy interleave + fine linear-attention stage.

Capability of reference models/IMGPCEncoder.py:105-164 (6 rounds of
p->i / i->p cross attention + per-modality self attention over 80 image and
256 point proxies) and models/IMGPCEnDecoder.py:19-119 (proxy->node /
proxy->pixel fusion, 2-D sine PE, 4 rounds of interleaved linear attention
between all pixels and all nodes).

Unlike the reference, the 2-D positional encoding is sized from the config
(the reference hardcodes (40,128) at IMGPCEnDecoder.py:56 and breaks on
NuScenes).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.pe import position_encoding_sine_2d
from ..ops.sampling import index_points
from .image_encoder import ImageTransformer
from .point_encoder import PointTransformer
from .layers import ResDenseBlock, ResidualBlock2D, ViTCrossBlock
from .linear_attention import LinearAttention


class IMGPCEncoder(nn.Module):
    """Both branch encoders + interleaved coarse cross/self attention.

    Returns a dict with img/point proxies, the image pyramid, point and node
    features, and the node->proxy assignment.
    """

    cfg: Config

    @nn.compact
    def __call__(self, img, pc, node, pt2node, train: bool, pc_knn=None):
        cfg = self.cfg
        dt = cfg.jnp_dtype()
        img_proxy, feat_q, feat_h, feat_f = ImageTransformer(
            cfg, name="img_transformer")(img, train)
        pt_proxy, node2proxy, pt_feat, node_feat = PointTransformer(
            cfg, name="pt_transformer")(pc, node, pt2node, train,
                                         pc_knn=pc_knn)

        for i in range(cfg.num_ca_layer_coarse):
            block = lambda name: ViTCrossBlock(
                cfg.num_head, cfg.mlp_dim, cfg.attention_dropout,
                cfg.mlp_dropout, dtype=dt, name=name)
            img_proxy = block(f"p2i_{i}")(img_proxy, pt_proxy, train)
            pt_proxy = block(f"i2p_{i}")(pt_proxy, img_proxy, train)
            img_proxy = block(f"img_sa_{i}")(img_proxy, img_proxy, train)
            pt_proxy = block(f"pt_sa_{i}")(pt_proxy, pt_proxy, train)

        return {
            "img_proxy": img_proxy,       # [B, P_img, F]
            "pt_proxy": pt_proxy,         # [B, P_pt, F]
            "img_feat_2": feat_q,         # [B, H, W, F] (1/4 scale)
            "img_feat_1": feat_h,
            "img_feat_0": feat_f,
            "node2proxy": node2proxy,     # [B, M]
            "pt_feat": pt_feat,           # [B, N, F]
            "node_feat": node_feat,       # [B, M, F]
        }


class IMGPCEnDecoder(nn.Module):
    """Coarse encoder + fine pixel<->node linear-attention fusion.

    Returns the encoder dict extended with ``fused_img_feat [B,H,W,F]`` and
    ``fused_node_feat [B,M,F]``.
    """

    cfg: Config

    @nn.compact
    def __call__(self, img, pc, node, pt2node, train: bool, pc_knn=None):
        cfg = self.cfg
        f = cfg.embed_dim
        dt = cfg.jnp_dtype()
        enc = IMGPCEncoder(cfg, name="encoder")(img, pc, node, pt2node,
                                                 train, pc_knn=pc_knn)

        # <-- node side: pull each node's proxy feature down and fuse -->
        proxy_at_node = index_points(enc["pt_proxy"], enc["node2proxy"],
                                     cfg.use_pallas)
        node_fused = jnp.concatenate([enc["node_feat"], proxy_at_node], axis=-1)
        node_fused = ResDenseBlock(f, dtype=dt, use_pallas=cfg.use_pallas,
                                   name="node_fuse_0")(
            node_fused, train)
        for i in range(1, cfg.node_fuse_res_num):
            node_fused = ResDenseBlock(f, dtype=dt,
                                       use_pallas=cfg.use_pallas,
                                       name=f"node_fuse_{i}")(
                node_fused, train)
        node_fused = nn.Dropout(0.1, deterministic=not train)(node_fused)

        # <-- pixel side: nearest-upsample proxies 8x and fuse -->
        b = img.shape[0]
        hp, wp, p = cfg.h_proxy, cfg.w_proxy, cfg.patch_size
        proxy_map = enc["img_proxy"].reshape(b, hp, wp, f)
        proxy_up = jnp.repeat(jnp.repeat(proxy_map, p, axis=1), p, axis=2)
        img_fused = jnp.concatenate([enc["img_feat_2"], proxy_up], axis=-1)

        pe = jnp.asarray(
            position_encoding_sine_2d(f, cfg.image_h, cfg.image_w),
            dtype=img_fused.dtype)
        img_fused = ResidualBlock2D(f, dtype=dt, name="img_fuse_0")(
            img_fused, train)
        img_fused = img_fused + pe[None]  # PE after the first fuse block
        for i in range(1, cfg.img_fuse_res_num):
            img_fused = ResidualBlock2D(f, dtype=dt, name=f"img_fuse_{i}")(
                img_fused, train)
        img_fused = nn.Dropout(0.1, deterministic=not train)(img_fused)

        vis_feat = img_fused
        pixels = img_fused.reshape(b, cfg.num_pixel, f)

        # <-- interleaved linear attention over all pixels x all nodes -->
        for i in range(cfg.linear_attention_num):
            la = lambda name: LinearAttention(cfg.la_head_num, dtype=dt,
                                              name=name)
            node_fused = la(f"p2n_{i}")(node_fused, pixels, train)
            pixels = la(f"n2p_{i}")(pixels, node_fused, train)
            node_fused = la(f"node_self_{i}")(node_fused, node_fused, train)
            pixels = la(f"pixel_self_{i}")(pixels, pixels, train)

        out = dict(enc)
        out["vis_feat"] = vis_feat
        out["fused_img_feat"] = pixels.reshape(b, cfg.image_h, cfg.image_w, f)
        out["fused_node_feat"] = node_fused
        return out
