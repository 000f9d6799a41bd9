"""MultiHeadModel: the one-shot cross-modal geo model.

Capability of reference models/MultiHeadModel.py:275-353: encoder-decoder
fusion, overlap head, metric head, then derives the overlap predictions the
agent consumes (p>0.5 / p>0.8 standby / raw scores / per-pixel overlap map)
and seeds the accumulated pose with identity. Also provides the reference's
match-accuracy / matching-ground-truth diagnostics
(MultiHeadModel.py:180-216,285-315) as batched static-shape functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .fusion import IMGPCEnDecoder
from .heads import GeometricDistanceHead, OverlapDetectionHead


class MultiHeadModel(nn.Module):
    """Flagship one-shot model.

    Call with a batch dict (see data pipeline) and optional labels. Returns
    an output dict carrying features, predictions, per-head losses, and the
    scalar total ``loss`` (0 when labels absent).
    """

    cfg: Config

    @nn.compact
    def __call__(self, batch, train: bool = False, with_loss: bool = True):
        labels = batch if with_loss else None

        feats = IMGPCEnDecoder(self.cfg, name="encoder_decoder")(
            batch["img"], batch["pc"], batch["node"], batch["pt2node"],
            train, pc_knn=batch.get("pc_knn"))
        feats = dict(feats)
        feats["pt2node"] = batch["pt2node"]

        out = dict(feats)
        out["pc"] = batch["pc"]

        overlap = OverlapDetectionHead(self.cfg, name="overlap_head")(
            feats, labels, train)
        out.update(overlap)

        geo = GeometricDistanceHead(self.cfg, name="geo_head")(
            feats, labels, train)
        out.update(geo)

        loss = jnp.asarray(0.0, jnp.float32)
        if with_loss:
            loss = (out["pc_overlap_loss"] + out["img_overlap_loss"]
                    + out["geometric_loss"])
        out["loss"] = loss

        # Derived predictions consumed by the agent / cost volume
        # (MultiHeadModel.py:327-348).
        pc_prob = jax.nn.softmax(out["pc_overlap_logits"], axis=-1)[..., 1]
        out["pc_overlap_pred"] = pc_prob > 0.5
        out["pc_overlap_pred_standby"] = pc_prob > 0.8
        out["pc_is_in_cam_scores"] = pc_prob
        img_prob = jax.nn.softmax(out["img_overlap_logits"], axis=-1)[..., 1]
        out["img_overlap_pred"] = img_prob  # [B, H, W] soft map

        b = batch["pc"].shape[0]
        out["matrix_accumulated"] = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        return out


def matching_inlier_ratio(pc_geo_feat, img_geo_feat, pc_mask, point_xy_all,
                          image_w: int, image_h: int, px_thresh: float = 3.0):
    """Feature-NN matching inlier ratio (reference
    MultiHeadModel.py:180-216 / Test_Geo.py:109-119), batched, static shapes.

    For every masked point, find its nearest pixel in feature space and
    count it an inlier if the pixel is within ``px_thresh`` of the point's
    true projection. The reference chunks points by 2000 to bound GPU
    memory; on TPU the full [N, H*W] distance matrix is a single MXU
    contraction.

    Args:
      pc_geo_feat:  [N, F] per-point features (single sample).
      img_geo_feat: [H, W, F].
      pc_mask:      [N] bool — which points participate.
      point_xy_all: [2, N] true (x, y) projections.
    Returns scalar inlier ratio over masked points.
    """
    pred_xy, inlier = matching_centers(pc_geo_feat, img_geo_feat, pc_mask,
                                       point_xy_all, image_w, px_thresh)
    return jnp.sum(inlier & pc_mask) / jnp.maximum(jnp.sum(pc_mask), 1)


def matching_centers(pc_geo_feat, img_geo_feat, pc_mask, point_xy_all,
                     image_w: int, px_thresh: float = 3.0):
    """Feature-NN matching centres + inlier ground-truth mask.

    The reference's ``cal_matcning_ground_truth``
    (MultiHeadModel.py:285-315): for each masked point, the (x, y) of its
    nearest pixel in feature space (``feat_matching_centers``) and whether
    that lands within ``px_thresh`` of the true projection
    (``inlier_matching_ground_truth``).

    Returns ``(pred_xy [2, N], inlier [N] bool)``.
    """
    f = pc_geo_feat.shape[-1]
    pix = img_geo_feat.reshape(-1, f)
    # |a-b|^2 = |a|^2 + |b|^2 - 2ab on the MXU
    d = (jnp.sum(pc_geo_feat**2, -1)[:, None] + jnp.sum(pix**2, -1)[None, :]
         - 2.0 * pc_geo_feat @ pix.T)
    min_idx = jnp.argmin(d, axis=-1)
    px = (min_idx % image_w).astype(jnp.float32)
    py = (min_idx // image_w).astype(jnp.float32)
    err = jnp.sqrt((px - point_xy_all[0]) ** 2 + (py - point_xy_all[1]) ** 2)
    inlier = (err <= px_thresh) & pc_mask
    return jnp.stack([px, py]), inlier
