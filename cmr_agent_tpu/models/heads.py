"""Prediction heads: overlap detection + metric (circle-loss) features.

Capability of reference models/MultiHeadModel.py:24-272. Both heads share
the same fuse topology: gather node features down to points via pt2node,
concat with per-point features, residual pointwise stack; the image side
runs residual conv blocks. Losses: focal (overlap) and circle (metric).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.losses import circle_loss, focal_loss
from ..ops.sampling import index_points
from .layers import ResDenseBlock, ResidualBlock2D, leaky, torch_kernel_init


def _point_fuse(cfg: Config, pt_feat, fused_node_feat, pt2node, train,
                dtype=None):
    """Shared node->point fusion stack (MultiHeadModel.py:54-66,220-231).

    Called from inside a compact method, so the ResDenseBlocks attach to the
    calling head via flax's module context.
    """
    node_at_pt = index_points(fused_node_feat, pt2node, cfg.use_pallas)
    x = jnp.concatenate([pt_feat, node_at_pt], axis=-1)
    for i in range(cfg.pt_head_res_num):
        x = ResDenseBlock(cfg.embed_dim, dtype=dtype,
                          use_pallas=cfg.use_pallas,
                          name=f"point_fuse_{i}")(x, train)
    return x


class OverlapDetectionHead(nn.Module):
    """Per-point and per-pixel 2-class overlap prediction + focal losses.

    Returns dict with logits, losses (if labels given) and P/R/A metrics.
    """

    cfg: Config

    @nn.compact
    def __call__(self, feats, labels, train: bool):
        cfg = self.cfg
        f = cfg.embed_dim
        dt = cfg.jnp_dtype()

        fused_pt = _point_fuse(cfg, feats["pt_feat"], feats["fused_node_feat"],
                               feats["pt2node"], train, dtype=dt)
        h = nn.Dense(32, kernel_init=torch_kernel_init, dtype=dt,
                     name="pc_head_0")(fused_pt)
        pc_logits = nn.Dense(2, kernel_init=torch_kernel_init, dtype=dt,
                             name="pc_head_1")(leaky(h))  # [B, N, 2]
        pc_logits = pc_logits.astype(jnp.float32)

        img = feats["fused_img_feat"]
        for i in range(cfg.img_fuse_res_num):
            img = ResidualBlock2D(f, dtype=dt, name=f"img_res_{i}")(img, train)
        h = nn.Conv(32, (1, 1), kernel_init=torch_kernel_init, dtype=dt,
                    name="img_head_0")(img)
        img_logits = nn.Conv(2, (1, 1), kernel_init=torch_kernel_init,
                             dtype=dt, name="img_head_1")(leaky(h))
        img_logits = img_logits.astype(jnp.float32)  # [B, H, W, 2]

        out = {"pc_overlap_logits": pc_logits, "img_overlap_logits": img_logits}

        if labels is not None:
            pc_label = labels["pc_mask"]              # [B, N] int
            img_label = labels["img_mask"]            # [B, H, W] int
            out["pc_overlap_loss"] = focal_loss(pc_logits, pc_label, alpha=0.75)
            out["img_overlap_loss"] = focal_loss(
                img_logits.reshape(img_logits.shape[0], -1, 2),
                img_label.reshape(img_label.shape[0], -1), alpha=0.5)

            pc_pred = jnp.argmax(pc_logits, axis=-1)
            img_pred = jnp.argmax(img_logits, axis=-1).reshape(
                img_label.shape[0], -1)
            img_label_flat = img_label.reshape(img_label.shape[0], -1)
            out.update(_pr_metrics("pc_overlap", pc_pred, pc_label))
            out.update(_pr_metrics("img_overlap", img_pred, img_label_flat))
        return out


def _pr_metrics(prefix, pred, label):
    pred_f = pred.astype(jnp.float32)
    label_f = label.astype(jnp.float32)
    tp = jnp.sum(pred_f * label_f)
    return {
        f"{prefix}_precision": tp / jnp.maximum(jnp.sum(pred_f), 1.0),
        f"{prefix}_recall": tp / jnp.maximum(jnp.sum(label_f), 1.0),
        f"{prefix}_accuracy": jnp.mean((pred == label).astype(jnp.float32)),
    }


class GeometricDistanceHead(nn.Module):
    """L2-normalised 64-d pixel/point metric features + circle loss.

    Returns ``pc_geo_feat [B,N,F]``, ``img_geo_feat [B,H,W,F]`` and, when
    circle-loss sampling labels are present, the loss on the 512 sampled
    pixel<->point pairs (MultiHeadModel.py:243-261).
    """

    cfg: Config

    @nn.compact
    def __call__(self, feats, labels, train: bool):
        cfg = self.cfg
        f = cfg.embed_dim
        dt = cfg.jnp_dtype()

        fused_pt = _point_fuse(cfg, feats["pt_feat"], feats["fused_node_feat"],
                               feats["pt2node"], train, dtype=dt)
        h = nn.Dense(f, kernel_init=torch_kernel_init, dtype=dt,
                     name="pc_head_0")(fused_pt)
        pc_geo = nn.Dense(f, kernel_init=torch_kernel_init, dtype=dt,
                          name="pc_head_1")(leaky(h))
        pc_geo = pc_geo.astype(jnp.float32)
        pc_geo = pc_geo / jnp.maximum(
            jnp.linalg.norm(pc_geo, axis=-1, keepdims=True), 1e-12)

        img = feats["fused_img_feat"]
        for i in range(cfg.img_fuse_res_num):
            img = ResidualBlock2D(f, dtype=dt, name=f"img_res_{i}")(img, train)
        h = nn.Conv(f, (1, 1), kernel_init=torch_kernel_init, dtype=dt,
                    name="img_head_0")(img)
        img_geo = nn.Conv(f, (1, 1), kernel_init=torch_kernel_init, dtype=dt,
                          name="img_head_1")(leaky(h))
        img_geo = img_geo.astype(jnp.float32)
        img_geo = img_geo / jnp.maximum(
            jnp.linalg.norm(img_geo, axis=-1, keepdims=True), 1e-12)

        out = {"pc_geo_feat": pc_geo, "img_geo_feat": img_geo}

        if labels is not None:
            xy_int = labels["pc_xy_int_for_circle_loss"]      # [B, 2, S] (x, y)
            pix_flat = img_geo.reshape(img_geo.shape[0], -1, f)
            pix_ids = xy_int[:, 1, :] * cfg.image_w + xy_int[:, 0, :]
            pixel_feat = index_points(pix_flat, pix_ids,
                                      cfg.use_pallas)          # [B, S, F]

            point_feat = index_points(pc_geo, labels["pc_idx_for_circle_loss"],
                                      cfg.use_pallas)

            xy_float = labels["pc_xy_float_for_circle_loss"]   # [B, 2, S]
            dmap = jnp.sqrt(jnp.sum(jnp.square(
                xy_float[..., :, None] - xy_int[..., None, :].astype(
                    xy_float.dtype)), axis=1))                 # [B, S, S]
            loss, _ = circle_loss(pixel_feat, point_feat, dmap)
            out["geometric_loss"] = loss
        return out
