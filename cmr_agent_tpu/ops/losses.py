"""Loss functions.

JAX equivalents of the reference losses, written channels-last:

* focal loss — kornia-derived (reference models/focal_loss.py:55-112),
  including its ``+eps`` softmax and ``+1e-6`` one-hot quirks so converted
  checkpoints train identically.
* circle loss — pixel<->point metric loss (models/MultiHeadModel.py:141-178).
* lovasz hinge / softmax — capability parity with utils/lovasz_loss.py
  (imported by the reference but not called on the live path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over integer labels; logits ``[..., C]``, labels ``[...]``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, alpha: float,
               gamma: float = 2.0, reduction: str = "mean",
               eps: float = 1e-8) -> jnp.ndarray:
    """Multiclass focal loss, kornia semantics.

    ``FL = -alpha * (1 - p)^gamma * log(p)`` with ``p = softmax + eps`` and a
    one-hot target carrying a ``+1e-6`` epsilon — both reproduced from the
    reference (models/focal_loss.py:50,90) for checkpoint-parity training.

    Args:
      logits: ``[..., C]``.
      labels: integer ``[...]``.
    """
    p = jax.nn.softmax(logits, axis=-1) + eps
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype) + 1e-6
    focal = -alpha * jnp.power(1.0 - p, gamma) * jnp.log(p)
    loss = jnp.sum(onehot * focal, axis=-1)
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction {reduction!r}")


def circle_loss(img_features: jnp.ndarray, pc_features: jnp.ndarray,
                distance_map: jnp.ndarray, dist_thres: float = 1.0,
                pos_margin: float = 0.1, neg_margin: float = 1.4,
                log_scale: float = 10.0):
    """Bidirectional circle loss on sampled pixel<->point feature pairs.

    Exact computation of the reference (models/MultiHeadModel.py:141-178):
    positives are pairs whose reprojection distance <= ``dist_thres`` px;
    weights are detached hinge margins; both row (point->pixel) and column
    (pixel->point) logsumexp terms contribute.

    Args:
      img_features: ``[B, M, F]`` sampled pixel features (L2-normalised).
      pc_features:  ``[B, N, F]`` sampled point features (requires N == M).
      distance_map: ``[B, N, M]`` reprojection pixel distances.

    Returns:
      (scalar loss, ``[B, N, M]`` feature distances).
    """
    pos_mask = (distance_map <= dist_thres).astype(img_features.dtype)
    neg_mask = 1.0 - pos_mask

    diff = pc_features[..., :, None, :] - img_features[..., None, :, :]
    dists = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, axis=-1), 0.0))

    pos = dists - 1e5 * neg_mask
    pos_weight = jax.lax.stop_gradient(jnp.maximum(pos - pos_margin, 0.0))
    lse_pos_row = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_weight, axis=-1)
    lse_pos_col = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_weight, axis=-2)

    neg = dists + 1e5 * pos_mask
    neg_weight = jax.lax.stop_gradient(jnp.maximum(neg_margin - neg, 0.0))
    lse_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - neg) * neg_weight, axis=-1)
    lse_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - neg) * neg_weight, axis=-2)

    loss_col = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    loss_row = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale
    return jnp.mean(loss_col + loss_row), dists


# --------------------------------------------------------------------------
# Lovasz losses (capability surface; reference utils/lovasz_loss.py)
# --------------------------------------------------------------------------

def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)


def lovasz_hinge(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary Lovasz hinge; ``logits``/``labels`` flat ``[P]`` (labels in {0,1})."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    grad = _lovasz_grad(labels[order])
    return jnp.sum(jax.nn.relu(errors_sorted) * grad)


def lovasz_softmax(probs: jnp.ndarray, labels: jnp.ndarray,
                   num_classes: int | None = None) -> jnp.ndarray:
    """Multiclass Lovasz-softmax; ``probs [P, C]``, integer ``labels [P]``.

    Averages the Lovasz extension of the per-class errors over all classes
    (the reference's ``classes='present'`` filtering is replaced by masking
    absent classes to zero weight — a static-shape-friendly equivalent).
    """
    c = num_classes or probs.shape[-1]
    losses = []
    present = []
    for ci in range(c):
        fg = (labels == ci).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, ci])
        order = jnp.argsort(-errors)
        grad = _lovasz_grad(fg[order])
        losses.append(jnp.sum(errors[order] * grad))
        present.append(jnp.sum(fg) > 0)
    losses = jnp.stack(losses)
    present = jnp.stack(present).astype(probs.dtype)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
