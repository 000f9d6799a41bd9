"""Image branch: pyramid CNN + ViT over patch tokens.

Capability of reference models/ImageResNet.py:43-65 (MiniResNet) and
models/ImageViT.py:8-181 (patchify + fixed sinusoid PE + pre-norm SA),
NHWC throughout.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.pe import sinusoid_table_1d
from .layers import ResidualBlock2D, ViTBlock, torch_kernel_init


class MiniResNet(nn.Module):
    """6 residual blocks, strides (1,1,2,1,2,1) -> features at 1/1, 1/2, 1/4.

    Returns ``(feat_quarter, feat_half, feat_full)`` like the reference
    (ImageResNet.py:58-65).
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool):
        rb = lambda st: ResidualBlock2D(self.features, st, dtype=self.dtype)
        x = rb(1)(img, train)
        feat_full = rb(1)(x, train)
        x = rb(2)(feat_full, train)
        feat_half = rb(1)(x, train)
        x = rb(2)(feat_half, train)
        feat_quarter = rb(1)(x, train)
        return feat_quarter, feat_half, feat_full


class ImageTransformer(nn.Module):
    """MiniResNet -> strided patchify -> +sinusoid PE -> N x SA blocks.

    Returns ``(proxy_tokens [B, P, C], feat_quarter, feat_half, feat_full)``
    (reference ImageViT.py:161-181).
    """

    cfg: Config

    @nn.compact
    def __call__(self, img, train: bool):
        cfg = self.cfg
        dt = cfg.jnp_dtype()
        img = img.astype(dt)
        feat_q, feat_h, feat_f = MiniResNet(cfg.embed_dim, dtype=dt,
                                            name="mini_resnet")(img, train)

        p = cfg.patch_size
        tokens = nn.Conv(cfg.embed_dim, (p, p), strides=p, padding="VALID",
                         kernel_init=torch_kernel_init, dtype=dt,
                         name="patch_embed")(feat_q)
        b, hp, wp, c = tokens.shape
        tokens = tokens.reshape(b, hp * wp, c)

        pe = jnp.asarray(sinusoid_table_1d(hp * wp, c), dtype=tokens.dtype)
        tokens = tokens + pe[None]
        tokens = nn.Dropout(cfg.embed_dropout, deterministic=not train)(tokens)

        for i in range(cfg.num_sa_layer):
            tokens = ViTBlock(cfg.num_head, cfg.mlp_dim,
                              cfg.attention_dropout, cfg.mlp_dropout,
                              dtype=dt, name=f"sa_{i}")(tokens, train)
        return tokens, feat_q, feat_h, feat_f
