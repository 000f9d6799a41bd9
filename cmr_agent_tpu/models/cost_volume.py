"""IterModel: pose-hypothesis cost volume scored by convolutions.

Capability of reference models/IterModel.py:24-475: build an
``nlabel^3`` grid of (ry, tx, tz) pose hypotheses, warp the cloud's metric
features into the image under every hypothesis, stack
[image features | warped point features | occupancy | image overlap] and
score each hypothesis; decode by per-axis marginal argmax and compose the
accumulated pose.

TPU redesign:

* the reference's boolean ``pc[:, mask]`` select + 200-pose python chunk
  loop (IterModel.py:301-345) becomes a static-shape masked scatter under
  ``lax.map`` pose chunks;
* every Conv3d in the scoring tower has a (1, 3, 3) kernel and (1, 2, 2)
  pool, i.e. it never mixes hypotheses — so the tower runs as 2-D convs
  with poses folded into the batch axis (identical math, better XLA
  tiling);
* the hardcoded 5120/40x128 pixel grid (IterModel.py:317,350-351,373) is
  derived from the config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.geometry import (angle2matrix_sxyz, make_se3, se3_inverse,
                            transform_points)
from ..ops.losses import softmax_cross_entropy
from ..ops.scatter import segment_sum
from .layers import BatchNorm, torch_kernel_init


def sample_pose_grid(r_amplitude, t_amplitude, nlabel: int):
    """Pose hypothesis grid (reference IterModel.py:132-172).

    Returns ``(delta_rt_inv [B, nlabel^3, 4, 4], delta_r [B, nlabel],
    delta_t [B, nlabel])`` where the flat hypothesis order is
    (ry, tx, tz) row-major, matching the reference's view(-1) layout.
    """
    assert nlabel % 2 == 1, "hypothesis grid must be odd (centred on 0)"
    base = jnp.arange(-(nlabel - 1) // 2, (nlabel - 1) // 2 + 1,
                      dtype=jnp.float32)                      # [n]
    delta_r = (2.0 * r_amplitude[:, None] / (nlabel - 1)) * base  # [B, n]
    delta_t = (2.0 * t_amplitude[:, None] / (nlabel - 1)) * base  # [B, n]

    b = r_amplitude.shape[0]
    zeros = jnp.zeros_like(delta_r)
    eul = jnp.stack([zeros, delta_r, zeros], axis=-1)         # [B, n, 3]
    R = angle2matrix_sxyz(eul)                                # [B, n, 3, 3]

    tx = delta_t[:, :, None, None]                            # [B, n, 1, 1]
    tz = delta_t[:, None, :, None]                            # [B, 1, n, 1]
    n = nlabel
    tx = jnp.broadcast_to(tx, (b, n, n, 1))
    tz = jnp.broadcast_to(tz, (b, n, n, 1))
    ty = jnp.zeros_like(tx)
    T = jnp.concatenate([tx, ty, tz], axis=-1)                # [B, n, n, 3]

    R_grid = jnp.broadcast_to(R[:, :, None, None], (b, n, n, n, 3, 3))
    T_grid = jnp.broadcast_to(T[:, None], (b, n, n, n, 3))
    rt = make_se3(R_grid, T_grid).reshape(b, n**3, 4, 4)
    return se3_inverse(rt), delta_r, delta_t


def decode_topk_yaw_poses(logits, r_amplitude, t_amplitude, nlabel: int,
                          k: int):
    """Top-``k`` yaw-candidate decode for multi-hypothesis composition.

    The marginal-argmax decode (the forward pass below; reference
    IterModel.py:443-456) commits to one yaw bin, and at full ±π amplitude
    the first decode's yaw is the composition pipeline's bottleneck
    (docs/CONVERGENCE.md §16). This decode instead returns the ``k`` most
    probable *distinct* yaw bins — yaw diversity is what downstream
    verification needs — each paired with its **conditional** translation
    decode (argmax of p(tx|ry) / p(tz|ry) from the joint 729-way
    posterior), as candidate per-step poses ``[B, k, 4, 4]`` in the same
    ``se3_inverse(make_se3(...))`` convention as ``matrix_i``.

    Candidate 0 is the yaw-marginal argmax, i.e. the standard decode up to
    the conditional-vs-marginal translation choice. No reference
    equivalent: the reference never revisits non-argmax hypotheses.

    ``k`` may exceed ``nlabel``: candidates beyond the ``nlabel`` distinct
    yaw bins re-nominate the most probable yaw bins with their RANK-2
    conditional translation — the 2nd-best (tx, tz) cell of the joint
    conditional p(tx, tz | ry) — so K=13..15 probes whether a scene whose
    true pose sits in a well-ranked yaw bin was lost to the translation
    decode rather than to yaw nomination (docs/CONVERGENCE.md §16, the
    4/64 no-candidate scenes). Capped at ``2 * nlabel`` total.
    """
    b = logits.shape[0]
    nl = nlabel
    if k > 2 * nl:
        raise ValueError(f"k={k} exceeds 2*nlabel={2 * nl} candidates "
                         "(rank-1 + rank-2 translation per yaw bin)")
    _, delta_r, delta_t = sample_pose_grid(r_amplitude, t_amplitude, nl)
    pred = jax.nn.softmax(logits, axis=-1).reshape(b, nl, nl, nl)
    p_ry = pred.sum(axis=(2, 3))                          # [B, nl]
    k_yaw = min(k, nl)
    _, ry_idx = jax.lax.top_k(p_ry, k_yaw)                # [B, k_yaw]
    cond = jnp.take_along_axis(pred, ry_idx[:, :, None, None],
                               axis=1)                    # [B, k_yaw, nl, nl]
    tx_idx = jnp.argmax(cond.sum(axis=3), axis=-1)        # [B, k_yaw]
    tz_idx = jnp.argmax(cond.sum(axis=2), axis=-1)        # [B, k_yaw]
    if k > nl:
        extra = k - nl
        # best joint-conditional cell that DIFFERS from the marginal-decoded
        # rank-1 (tx, tz) pair, for the top `extra` bins: rank-1 uses the
        # marginal argmaxes, so when the joint argmax disagrees with them it
        # is itself a fresh candidate — falling back to the joint's rank-2
        # cell only when the joint argmax duplicates rank-1 (otherwise the
        # beam slot could be wasted on a duplicate).
        flat = cond.reshape(b, k_yaw, nl * nl)            # [.., tx*nl+tz]
        _, top2 = jax.lax.top_k(flat, 2)                  # [B, k_yaw, 2]
        rank1 = tx_idx * nl + tz_idx                      # [B, k_yaw]
        pick = jnp.where(top2[..., 0] == rank1, top2[..., 1], top2[..., 0])
        tx2, tz2 = pick // nl, pick % nl
        ry_idx = jnp.concatenate([ry_idx, ry_idx[:, :extra]], axis=1)
        tx_idx = jnp.concatenate([tx_idx, tx2[:, :extra]], axis=1)
        tz_idx = jnp.concatenate([tz_idx, tz2[:, :extra]], axis=1)
    ry = jnp.take_along_axis(delta_r, ry_idx, axis=1)     # [B, k]
    tx = jnp.take_along_axis(delta_t, tx_idx, axis=1)
    tz = jnp.take_along_axis(delta_t, tz_idx, axis=1)
    zero = jnp.zeros_like(ry)
    eul = jnp.stack([zero, ry, zero], axis=-1)            # [B, k, 3]
    t_vec = jnp.stack([tx, zero, tz], axis=-1)
    return se3_inverse(make_se3(angle2matrix_sxyz(eul), t_vec))


class IterModel(nn.Module):
    cfg: Config
    pose_chunk: int = 27   # CPU path: lax.map chunk bounding the working set
    warp_topk: int = 8192  # TPU path: static point-compaction bound
    interpret: bool = False  # force the fused warp in Pallas interpret mode
    # (CPU testing of the TPU path; never set in production)

    @nn.compact
    def __call__(self, state, train: bool = False, with_loss: bool = True):
        """Score the hypothesis grid and update the accumulated pose.

        Args:
          state: dict with ``pc_i [B,N,3]``, ``K [B,3,3]``,
            ``pc_geo_feat [B,N,F]``, ``img_geo_feat [B,H,W,F]``,
            ``pc_overlap_pred [B,N]`` (+``_standby``),
            ``pc_is_in_cam_scores [B,N]``, ``img_overlap_pred [B,H,W]``,
            ``matrix_accumulated [B,4,4]``, ``R_amplitude [B]``,
            ``T_amplitude [B]`` and (for the loss) ``label_R/label_T_x/
            label_T_z [B, nlabel]``.
        Returns dict with logits, loss, the per-step pose ``matrix_i``, the
        updated ``matrix_accumulated`` and re-transformed ``pc_i``.
        """
        cfg = self.cfg
        nl = cfg.nlabel
        h, w = cfg.image_h, cfg.image_w
        f = cfg.embed_dim
        npix = h * w

        pc = state["pc_i"]
        b, n_pts = pc.shape[0], pc.shape[1]

        # Fall back to the standby (p>0.8) mask when the p>0.5 mask is empty
        # (reference IterModel.py:272-274), without dynamic shapes.
        primary = state["pc_overlap_pred"]
        standby = state.get("pc_overlap_pred_standby", primary)
        has_primary = jnp.any(primary, axis=1, keepdims=True)
        mask = jnp.where(has_primary, primary, standby)        # [B, N]
        if cfg.cost_volume_unmasked:
            # warp every point; the per-hypothesis frustum test filters
            # geometrically (see Config.cost_volume_unmasked)
            mask = jnp.ones_like(mask)

        poses, delta_r, delta_t = sample_pose_grid(
            state["R_amplitude"], state["T_amplitude"], nl)
        n_pose = nl**3

        K = state["K"]
        feat = state["pc_geo_feat"]
        scores = state["pc_is_in_cam_scores"]

        from ..ops.pallas_kernels import (segment_sum_fused_shared,
                                          use_pallas_default)

        use_fused = self.interpret or use_pallas_default(cfg.use_pallas)

        # <-- TPU warp: static top-K compaction, hoisted so every pose
        # chunk shares it (XLA scatters are not viable on this runtime) -->
        if use_fused:
            k_pts = min(self.warp_topk, n_pts)
            # top-K by overlap score among masked points; -1 sinks unmasked
            sel_scores = jnp.where(mask, scores, -1.0)
            _, sel = jax.lax.top_k(sel_scores, k_pts)          # [B, K]
            take = lambda x: jnp.take_along_axis(
                x, sel[..., None] if x.ndim == 3 else sel, axis=1)
            pc_k = take(pc)                                    # [B, K, 3]
            feat_k = take(feat)                                # [B, K, F]
            scores_k = take(scores)                            # [B, K]
            mask_k = jnp.take_along_axis(mask, sel, axis=1)    # [B, K]
            aug = jnp.concatenate(
                [feat_k, scores_k[..., None],
                 jnp.ones_like(scores_k)[..., None]], axis=-1)  # [B, K, F+2]
            # Observability for the static compaction bound: how many masked
            # points were excluded because more than K passed the mask
            # (0 = exact warp; reference semantics use ALL masked points,
            # IterModel.py:301-321).
            n_masked = mask.sum(axis=1).astype(jnp.int32)
            warp_dropped = jnp.maximum(n_masked - k_pts, 0)
        else:
            warp_dropped = jnp.zeros((b,), jnp.int32)

        def warp_fused_poses(poses_c):
            """TPU path for a pose chunk [B, C, 4, 4]: project the
            compacted cloud under every hypothesis in the chunk, aggregate
            with the shared-data one-hot kernel."""
            R = poses_c[..., :3, :3]
            t = poses_c[..., :3, 3]
            pc_w = (jnp.einsum("bpij,bkj->bpki", R, pc_k)
                    + t[:, :, None, :])                        # [B, C, K, 3]
            proj = jnp.einsum("bij,bpkj->bpki", K, pc_w)
            z = proj[..., 2]
            xy = proj[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-10,
                                           1e-10, z[..., None])
            in_cam = ((xy[..., 0] >= 0) & (xy[..., 0] <= w - 1)
                      & (xy[..., 1] >= 0) & (xy[..., 1] <= h - 1) & (z > 0))
            valid = in_cam & mask_k[:, None, :]
            xi = jnp.round(xy[..., 0]).astype(jnp.int32)
            yi = jnp.round(xy[..., 1]).astype(jnp.int32)
            ids = jnp.where(valid, yi * w + xi, npix)          # routed out

            sums = segment_sum_fused_shared(aug, ids, npix,
                                            interpret=self.interpret)
            counts = sums[..., -1]
            wf = sums[..., :f] / jnp.maximum(counts[..., None], 1.0)
            occ = sums[..., f]
            return wf, occ

        def warp_chunk(pose_chunk):
            """pose_chunk [B, C, 4, 4] -> (mean feat [B,C,npix,F], occ [B,C,npix])."""
            R = pose_chunk[..., :3, :3]
            t = pose_chunk[..., :3, 3]
            pc_w = (jnp.einsum("bcij,bnj->bcni", R, pc) + t[:, :, None, :])
            proj = jnp.einsum("bij,bcnj->bcni", K, pc_w)
            z = proj[..., 2]
            xy = proj[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-10,
                                           1e-10, z[..., None])
            in_cam = ((xy[..., 0] >= 0) & (xy[..., 0] <= w - 1)
                      & (xy[..., 1] >= 0) & (xy[..., 1] <= h - 1) & (z > 0))
            valid = in_cam & mask[:, None, :]
            xi = jnp.round(xy[..., 0]).astype(jnp.int32)
            yi = jnp.round(xy[..., 1]).astype(jnp.int32)
            ids = jnp.where(valid, yi * w + xi, npix)          # pad bucket

            # vmap over batch (usually 1) and poses in the chunk.
            def per_b(ids_b, valid_b, feat_b, scores_b):
                def one_pose(args):
                    ids_i, valid_i = args
                    vf = valid_i.astype(feat_b.dtype)
                    fsum = segment_sum(feat_b * vf[:, None], ids_i, npix + 1)
                    cnt = segment_sum(vf, ids_i, npix + 1, via="scatter")
                    fmean = fsum / jnp.maximum(cnt[:, None], 1.0)
                    occ = segment_sum(scores_b * vf, ids_i, npix + 1,
                                      via="scatter")
                    return fmean[:npix], occ[:npix]
                return jax.vmap(lambda i, v: one_pose((i, v)))(ids_b, valid_b)

            return jax.vmap(per_b)(ids, valid, feat, scores)

        def warp_any(poses_c):
            """Warp a pose chunk -> (mean feat [B,C,npix,F], occ [B,C,npix])
            via the fused TPU kernel or the lax.map CPU path."""
            n_p = poses_c.shape[1]
            if use_fused:
                return warp_fused_poses(poses_c)
            n_chunk = max(1, self.pose_chunk)
            assert n_p % n_chunk == 0 or n_chunk >= n_p, (
                "pose_chunk must divide the hypothesis count")
            if n_chunk >= n_p:
                return warp_chunk(poses_c)
            chunks = poses_c.reshape(b, n_p // n_chunk, n_chunk, 4, 4)
            chunks = jnp.swapaxes(chunks, 0, 1)      # [n_chunks, B, C, 4, 4]
            wf, occ = jax.lax.map(warp_chunk, chunks)
            return (jnp.swapaxes(wf, 0, 1).reshape(b, n_p, npix, f),
                    jnp.swapaxes(occ, 0, 1).reshape(b, n_p, npix))

        # <-- scoring tower: poses fold into batch; all (1,3,3) convs -->
        # (runs in the config compute dtype: params stay f32, activations
        # cast per cfg.compute_dtype, logits back to f32). Layers are
        # instantiated ONCE so the single-shot and hypothesis-chunked
        # paths share parameters (repeated calls of one instance reuse
        # its variables).
        dt = cfg.jnp_dtype()
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.01)
        widths = [(f, f), (f // 2, f // 2), (f // 4, f // 4), (f // 4, f // 8)]
        conv_a = [nn.Conv(w0, (3, 3), padding=1,
                          kernel_init=torch_kernel_init, dtype=dt,
                          name=f"cv_conv{si}_0")
                  for si, (w0, _) in enumerate(widths)]
        bns = [BatchNorm(name=f"cv_bn{si}") for si in range(len(widths))]
        conv_b = [nn.Conv(w1, (3, 3), padding=1,
                          kernel_init=torch_kernel_init, dtype=dt,
                          name=f"cv_conv{si}_1")
                  for si, (_, w1) in enumerate(widths)]
        head0 = nn.Conv(f // 16, (1, 1), kernel_init=torch_kernel_init,
                        dtype=dt, name="cv_head_0")
        head1 = nn.Conv(1, (1, 1), kernel_init=torch_kernel_init,
                        dtype=dt, name="cv_head_1")

        def score(poses_c):
            """Warp + stack + tower for a pose chunk -> logits [B, C]."""
            n_p = poses_c.shape[1]
            warped_feat, occupancy = warp_any(poses_c)
            warped_feat = warped_feat.reshape(b, n_p, h, w, f)
            occupancy = occupancy.reshape(b, n_p, h, w, 1)
            img_geo = jnp.broadcast_to(state["img_geo_feat"][:, None],
                                       (b, n_p, h, w, f))
            img_overlap = jnp.broadcast_to(
                state["img_overlap_pred"][:, None, :, :, None],
                (b, n_p, h, w, 1))
            vol = jnp.concatenate(
                [img_geo, warped_feat, occupancy, img_overlap],
                axis=-1)                                # [B, C, H, W, 2F+2]
            x = vol.reshape(b * n_p, h, w, 2 * f + 2).astype(dt)
            for si in range(len(widths)):
                x = conv_a[si](x)
                x = bns[si](x, train)
                x = lrelu(x)
                x = conv_b[si](x)
                x = lrelu(x)
                if si < 3:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2),
                                    padding="VALID")
                else:
                    x = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg
            x = head0(x)
            x = lrelu(x)
            x = head1(x)
            return x.reshape(b, n_p).astype(jnp.float32)

        # Hypothesis-chunked eval (Config.cost_volume_eval_chunk): the
        # full [B, P, H, W, 2F+2] volume never materialises — exact at
        # eval because BatchNorm reads running stats there. Training keeps
        # the single-shot volume (BN batch statistics span all P) with
        # cost_volume_remat as its memory lever.
        ec = cfg.cost_volume_eval_chunk
        if (not train) and ec and ec < n_pose and n_pose % ec == 0:
            logits = jnp.concatenate(
                [score(poses[:, i * ec:(i + 1) * ec])
                 for i in range(n_pose // ec)], axis=1)
        else:
            logits = score(poses)

        out = {"cost_volume_logits": logits,
               "warp_dropped_points": warp_dropped}

        if with_loss and "label_R" in state:
            label_r = state["label_R"].astype(jnp.float32)      # [B, n]
            label_tx = state["label_T_x"].astype(jnp.float32)
            label_tz = state["label_T_z"].astype(jnp.float32)
            label = (label_r[:, :, None, None]
                     * label_tx[:, None, :, None]
                     * label_tz[:, None, None, :]).reshape(b, -1)
            out["cost_volume_label"] = label
            out["cost_volume_loss"] = softmax_cross_entropy(
                logits, jnp.argmax(label, axis=-1))

        # <-- decode: per-axis marginal argmax (IterModel.py:443-456) -->
        pred = jax.nn.softmax(logits, axis=-1).reshape(b, nl, nl, nl)
        p_ry = pred.sum(axis=(2, 3))
        p_tx = pred.sum(axis=(1, 3))
        p_tz = pred.sum(axis=(1, 2))
        ry = jnp.take_along_axis(delta_r, jnp.argmax(p_ry, -1)[:, None], 1)[:, 0]
        tx = jnp.take_along_axis(delta_t, jnp.argmax(p_tx, -1)[:, None], 1)[:, 0]
        tz = jnp.take_along_axis(delta_t, jnp.argmax(p_tz, -1)[:, None], 1)[:, 0]

        zero = jnp.zeros_like(ry)
        eul = jnp.stack([zero, ry, zero], axis=-1)
        t_vec = jnp.stack([tx, zero, tz], axis=-1)
        matrix_i = se3_inverse(make_se3(angle2matrix_sxyz(eul), t_vec))

        out["pred_ry"], out["pred_tx"], out["pred_tz"] = ry, tx, tz
        out["matrix_i"] = matrix_i
        out["matrix_accumulated"] = matrix_i @ state["matrix_accumulated"]
        out["pc_i"] = transform_points(pc, matrix_i[:, :3, :3],
                                       matrix_i[:, :3, 3])
        return out
