"""Registration environment: observation / expert / step / reward.

Capability of reference environment/environment.py, redesigned on-device:

* ``observation_from_pose`` is **fully batched** — the reference loops over
  the batch in Python and boolean-indexes overlap points
  (environment.py:39-84); here invalid (non-overlap or out-of-frustum)
  points route to a padding bucket of a static-shape segment-mean, which is
  bit-equivalent to the reference's masked ``scatter_mean``.
* ``expert_action`` keeps the scipy euler extraction + yaw-flip
  disambiguation (environment.py:151-160) as closed-form JAX, so the
  whole imitation rollout stays on device.
* ``step_reward`` fixes the reference bug where the pose is never applied
  (the transform at environment.py:273 is commented out, making the dense
  reward identically zero); ``apply_pose=False`` reproduces the degenerate
  reference behaviour for parity runs.

Everything here is jit/vmap/scan-safe: static shapes, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import (euler_angles_to_matrix_xyz, frustum_mask,
                            make_se3, matrix_to_euler_xyz_extrinsic,
                            project_points, transform_points_disentangled)
from ..ops.scatter import scatter_mean_image


def init_poses(batch):
    """Identity source pose + ground-truth target (environment.py:129-140)."""
    b = batch["pc"].shape[0]
    pose_source = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    pose_target = batch["P"].astype(jnp.float32)
    return pose_source, pose_target


def bearing_init_pose(state):
    """Coarse yaw initialisation from the predicted-overlap bearing.

    Returns a disentangled ``[B, 4, 4]`` initial pose estimate: the pure
    yaw (about the cloud centroid, zero translation) that rotates the
    predicted-overlap sector's centroid onto the camera's +z axis in the
    x-z plane. For a spinning-LiDAR cloud the centroid sits near the
    sensor, so the sector's centroid-relative bearing rotates one-for-one
    with the yaw perturbation — undoing it lands the episode in the
    small-yaw regime where the learned refinement converges
    (docs/CONVERGENCE.md section 1 vs sections 2-10).

    No reference equivalent: the reference always starts from identity
    (Test_Agent.py:154-158). Gated by ``Config.bearing_init``; with an
    empty overlap prediction the bearing degenerates to atan2(0, 0) = 0
    and the init falls back to identity.
    """
    pc = state["pc"].astype(jnp.float32)                      # [B, N, 3]
    w = state["pc_overlap_pred"].astype(jnp.float32)[..., None]
    mean = pc.mean(axis=1, keepdims=True)
    c = ((pc - mean) * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
    theta = jnp.arctan2(c[:, 0], c[:, 2])                     # [B]
    # R_y(-theta): maps (sin t, y, cos t) * r -> (0, y, r), i.e. onto +z
    cos, sin = jnp.cos(-theta), jnp.sin(-theta)
    zeros, ones = jnp.zeros_like(cos), jnp.ones_like(cos)
    rows = jnp.stack([
        jnp.stack([cos, zeros, sin, zeros], axis=-1),
        jnp.stack([zeros, ones, zeros, zeros], axis=-1),
        jnp.stack([-sin, zeros, cos, zeros], axis=-1),
        jnp.stack([zeros, zeros, zeros, ones], axis=-1),
    ], axis=-2)                                               # [B, 4, 4]
    return rows


def apply_coarse_pose(batch, coarse):
    """Re-base the registration problem under a coarse pose estimate.

    Coarse-to-fine composition (no reference equivalent — the reference
    never chains IterModel into Test_Agent): given ``coarse [B, 4, 4]``
    mapping the perturbed cloud toward camera alignment (e.g. IterModel's
    ``matrix_accumulated``), return a new batch whose cloud/nodes are
    transformed by ``coarse`` and whose target becomes the residual
    ``P @ coarse^-1``. Running the standard pipeline (geo forward +
    episode) on the result re-perceives overlap/features in the
    near-aligned regime, where the one-shot heads are reliable
    (docs/CONVERGENCE.md sections 11/13), and the episode's final
    RTE/RRE against the new target IS the full pipeline's residual error.

    Rigid-invariant keys (``pt2node``, masks, circle-loss samples,
    ``point_xy_float_all``, amplitudes) pass through unchanged.
    """
    from ..ops.geometry import se3_inverse

    R = coarse[..., :3, :3].astype(jnp.float32)
    t = coarse[..., :3, 3].astype(jnp.float32)
    xform = lambda x: (jnp.einsum("bij,bnj->bni", R, x.astype(jnp.float32))
                       + t[:, None, :])
    out = dict(batch)
    out["pc"] = xform(batch["pc"])
    if "node" in batch:
        out["node"] = xform(batch["node"])
    if "P" in batch:
        # serving clients have no ground-truth target; the residual
        # rebase only applies when one is present (train/eval)
        out["P"] = (batch["P"].astype(jnp.float32)
                    @ se3_inverse(coarse.astype(jnp.float32)))
    return out


def alignment_score(state, final_pose, image_h: int, image_w: int):
    """Ground-truth-free verification score of a pose estimate, ``[B]``.

    Projects the cloud under the (disentangled) estimate and scores how
    well each in-frustum point's metric descriptor matches the image
    descriptor at its projected pixel — the statistic the circle loss
    trains (reference models/MultiHeadModel.py:141-178) evaluated at a
    hypothesised pose. Both descriptor sets are L2-normalised, so the
    per-point score is a cosine similarity; the returned score is the sum
    of in-frustum similarities normalised by the cloud size, rewarding
    both frustum coverage and descriptor agreement (a pose that points the
    camera away from the scene scores ~0 regardless of how the few
    remaining points match).

    Used to select among multi-hypothesis pipeline candidates
    (``test_agent --iter-hypotheses``). No reference equivalent: the
    reference never verifies a pose estimate against the features.

    ``state`` needs ``pc [B,N,3]``, ``K [B,3,3]``, ``pc_geo_feat [B,N,F]``
    and ``img_geo_feat [B,H,W,F]``; ``final_pose [B,4,4]`` is in the
    episode's disentangled convention (rotation about the cloud centroid).
    """
    return alignment_stats(state, final_pose, image_h, image_w)["sum_norm"]


def alignment_stats(state, final_pose, image_h: int, image_w: int):
    """Per-sample ``[B]`` feature-alignment statistics of a pose estimate.

    The same projection + descriptor lookup as :func:`alignment_score`,
    returning a dict of candidate verification statistics so the
    multi-hypothesis selector (``test_agent --iter-hypotheses``) can be
    studied/configured without recomputing the projection:

    - ``sum_norm``: Σ valid cosine sims / N (the :func:`alignment_score`
      value — rewards coverage × agreement)
    - ``mean_valid``: Σ valid sims / max(1, #valid) (pure agreement)
    - ``frac_valid``: #valid / N (pure coverage)
    - ``above50_norm`` / ``above70_norm``: #(valid ∧ sim > τ) / N for
      τ = 0.5 / 0.7 — sharp inlier counts; a wrong-basin pose can
      accumulate many weakly-positive sims, but few *strong* matches
    - ``smooth_mean``: Σ valid sims / (#valid + 0.1·N) — the valid-mean
      shrunk toward 0 by a pseudo-count of 10% of the cloud, so
      low-coverage candidates cannot win on a handful of lucky matches
      (the failure mode of ``mean_valid``) while high-coverage ones are
      scored by agreement, not raw coverage (the failure mode of
      ``sum_norm``). Selector study at ±10 m/±π (32 held-out scenes,
      K=5/9 candidates): selects 87.5%/90.6% vs ceilings 93.8%/96.9%,
      where sum_norm gets 59%/62% and mean_valid 78%/62%; the
      pseudo-count plateau spans c ∈ [0.025·N, 0.1·N]
    """
    pc = state["pc"].astype(jnp.float32)
    R = final_pose[..., :3, :3].astype(jnp.float32)
    t = final_pose[..., :3, 3].astype(jnp.float32)
    aligned = transform_points_disentangled(pc, R, t)
    proj = project_points(aligned, state["K"].astype(jnp.float32))
    valid = frustum_mask(proj, image_w, image_h)
    xi = jnp.clip(jnp.round(proj[..., 0]).astype(jnp.int32), 0, image_w - 1)
    yi = jnp.clip(jnp.round(proj[..., 1]).astype(jnp.int32), 0, image_h - 1)
    b, n = pc.shape[0], pc.shape[1]
    f = state["pc_geo_feat"].shape[-1]
    img = state["img_geo_feat"].astype(jnp.float32).reshape(
        b, image_h * image_w, f)
    img_f = jnp.take_along_axis(img, (yi * image_w + xi)[..., None], axis=1)
    sim = jnp.sum(state["pc_geo_feat"].astype(jnp.float32) * img_f, axis=-1)
    sim_v = jnp.where(valid, sim, 0.0)
    n_valid = jnp.sum(valid, axis=1)
    sim_sum = jnp.sum(sim_v, axis=1)
    return {
        "sum_norm": sim_sum / n,
        "mean_valid": sim_sum / jnp.maximum(n_valid, 1).astype(jnp.float32),
        "smooth_mean": sim_sum / (n_valid.astype(jnp.float32) + 0.1 * n),
        "frac_valid": n_valid.astype(jnp.float32) / n,
        "above50_norm": jnp.sum(valid & (sim > 0.5), axis=1) / n,
        "above70_norm": jnp.sum(valid & (sim > 0.7), axis=1) / n,
    }


def compose_disentangled(final_pose, coarse, pc_orig):
    """Fold an episode's disentangled final pose onto the coarse rebase.

    The episode runs on the cloud rebased by ``coarse`` (cloud-frame
    entangled SE(3)) and reports ``final_pose`` in the DISENTANGLED
    convention of that rebased cloud (rotation about its centroid,
    ops.to_disentangled). This returns the single entangled cloud-frame
    transform equivalent to "apply ``coarse``, then apply ``final_pose``
    disentangled" — the composed pipeline estimate, suitable for a further
    :func:`apply_coarse_pose` rebase (refinement rounds) or for serving.

    ``pc_orig [B,N,3]`` is the ORIGINAL (un-rebased) cloud; the rebased
    centroid is recovered as ``R_c·mean(pc) + t_c`` rather than
    materialising the rebased cloud.
    """
    R_c = coarse[..., :3, :3].astype(jnp.float32)
    t_c = coarse[..., :3, 3].astype(jnp.float32)
    c = (jnp.einsum("bij,bj->bi", R_c,
                    pc_orig.astype(jnp.float32).mean(axis=1)) + t_c)
    R_f = final_pose[..., :3, :3].astype(jnp.float32)
    t_f = final_pose[..., :3, 3].astype(jnp.float32)
    # entangled translation: t = t' + c - R·c  (inverse of to_disentangled)
    t_ent = t_f + c - jnp.einsum("bij,bj->bi", R_f, c)
    return make_se3(R_f, t_ent) @ coarse.astype(jnp.float32)


def nn_alignment_stats(state, final_pose, image_h: int, image_w: int,
                       radius_px: float = 3.0, chunk: int = 2048):
    """Spatial-consistency (matching-IR) verification statistics, ``[B]``.

    :func:`alignment_stats` scores the LOCAL descriptor agreement at each
    point's projected pixel — a wrong-basin pose can still accumulate many
    weakly-positive cosines (the residual failure mode of ``smooth_mean``
    at ±π: 6/64 held-out scenes pick a wrong basin whose weak matches
    out-sum the true pose's sparser strong ones, docs/CONVERGENCE.md §16).
    This statistic is the Test_Geo matching test (reference
    Test_Geo.py:109-119) evaluated at a hypothesised pose: each point's
    feature-NN pixel over the WHOLE image must land within ``radius_px``
    of where the pose projects it. The NN search ignores the pose, so a
    wrong-basin candidate cannot manufacture inliers — its points' NN
    pixels sit wherever the descriptors genuinely match, not where the
    bad pose projects them. One ``[N, H·W]`` cosine matmul per candidate,
    chunked over points (``lax.map``) to bound the similarity matrix at
    ``chunk × H·W``.

    Returns a dict of ``[B]`` statistics (same naming scheme as
    :func:`alignment_stats`):

    - ``ir_norm``:   #(in-frustum ∧ NN within radius) / N
    - ``ir_mean``:   inliers / max(1, #in-frustum)
    - ``ir_smooth``: inliers / (#in-frustum + 0.1·N) — the shrunk mean
    """
    pc = state["pc"].astype(jnp.float32)
    R = final_pose[..., :3, :3].astype(jnp.float32)
    t = final_pose[..., :3, 3].astype(jnp.float32)
    aligned = transform_points_disentangled(pc, R, t)
    proj = project_points(aligned, state["K"].astype(jnp.float32))
    valid = frustum_mask(proj, image_w, image_h)
    b, n = pc.shape[0], pc.shape[1]
    f = state["pc_geo_feat"].shape[-1]
    img = state["img_geo_feat"].astype(jnp.float32).reshape(
        b, image_h * image_w, f)
    feats = state["pc_geo_feat"].astype(jnp.float32)
    pad = (-n) % chunk
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    nchunks = feats.shape[1] // chunk
    feats_c = jnp.transpose(feats.reshape(b, nchunks, chunk, f),
                            (1, 0, 2, 3))

    def nn_chunk(fc):                                     # [B, chunk, F]
        sims = jnp.einsum("bcf,bpf->bcp", fc, img)
        return jnp.argmax(sims, axis=-1).astype(jnp.int32)

    nn_idx = jax.lax.map(nn_chunk, feats_c)               # [nc, B, chunk]
    nn_idx = jnp.transpose(nn_idx, (1, 0, 2)).reshape(
        b, nchunks * chunk)[:, :n]
    nn_x = (nn_idx % image_w).astype(jnp.float32)
    nn_y = (nn_idx // image_w).astype(jnp.float32)
    d2 = ((nn_x - proj[..., 0]) ** 2 + (nn_y - proj[..., 1]) ** 2)
    inlier = valid & (d2 <= radius_px * radius_px)
    n_inl = inlier.sum(axis=1).astype(jnp.float32)
    n_valid = valid.sum(axis=1).astype(jnp.float32)
    return {
        "ir_norm": n_inl / n,
        "ir_mean": n_inl / jnp.maximum(n_valid, 1.0),
        "ir_smooth": n_inl / (n_valid + 0.1 * n),
    }


def compact_observation_state(state, k: int, mode: str = "topk",
                              use_pallas=None, interpret: bool = False):
    """Pre-compact the rasterisation inputs to ``k`` overlap points.

    Only points with ``pc_overlap_pred`` contribute to the 2-D observation
    (environment.py:48-49), and that mask is FIXED across all episode steps
    — so the point set can be compacted once per episode. Exact whenever
    the overlap count <= k; beyond that:

    * ``mode="topk"`` (default): ranked by ``pc_is_in_cam_scores`` when
      present, lowest-score overlap points dropped. lax.top_k over [B, N]
      plus three row gathers — differentiable, any backend.
    * ``mode="pack"``: the streaming Pallas mask-pack kernel
      (ops.pallas_kernels.mask_compact_pack) — no sort, no gathers, one
      pass over the cloud; drop policy is highest-index-first. Eval-only
      (no VJP) and TPU-only; silently falls back to "topk" off-TPU or at
      non-tile-divisible shapes, so callers can pass ``cfg.raster_mode``
      unconditionally.

    Returns a new state dict with ``raster_pc [B,k,3]``, ``raster_feat
    [B,k,F]``, ``raster_valid [B,k]`` consumed by
    :func:`observation_from_pose` (the pack path also precomputes
    ``raster_pcT [B,3,k]``, the channel-major layout the fused-eval episode
    consumes), plus ``raster_dropped [B]`` — the number of overlap points
    silently excluded because more than ``k`` passed the mask (0 whenever
    the compaction is exact). The 3-D observation still sees the full
    cloud.
    """
    if mode == "pack":
        from ..ops.pallas_kernels import (mask_compact_pack,
                                          use_pallas_default)
        block = 512
        n = state["pc"].shape[1]
        if ((use_pallas_default(use_pallas) or interpret)
                and n % block == 0 and k % block == 0 and k >= 2 * block):
            mask = state["pc_overlap_pred"]
            pcT = jnp.swapaxes(state["pc"], 1, 2).astype(jnp.float32)
            feat_k, pcT_k = mask_compact_pack(
                mask, pcT, state["pc_geo_feat"], k, block=block,
                interpret=interpret)
            out = dict(state)
            out["raster_feat"] = feat_k
            out["raster_pcT"] = pcT_k
            # row-major twin for the nc observation path; dead code
            # (DCE'd by XLA) whenever only raster_pcT is consumed
            out["raster_pc"] = jnp.swapaxes(pcT_k, 1, 2
                                            ).astype(state["pc"].dtype)
            n_overlap = mask.sum(axis=1).astype(jnp.int32)
            cnt = jnp.minimum(n_overlap, k)
            out["raster_valid"] = (jnp.arange(k, dtype=jnp.int32)[None, :]
                                   < cnt[:, None])
            out["raster_dropped"] = jnp.maximum(n_overlap - k, 0)
            return out
    scores = state.get("pc_is_in_cam_scores",
                       state["pc_overlap_pred"].astype(jnp.float32))
    # -inf filler keeps the compaction valid-first UNCONDITIONALLY — the
    # mega raster's prefix-count gating depends on it, and a finite filler
    # would break if scores were ever logits (< -1) instead of softmax
    # probabilities.
    ranked = jnp.where(state["pc_overlap_pred"], scores.astype(jnp.float32),
                       -jnp.inf)
    _, sel = jax.lax.top_k(ranked, k)                     # [B, k]
    take = lambda x: jnp.take_along_axis(
        x, sel[..., None] if x.ndim == 3 else sel, axis=1)
    out = dict(state)
    out["raster_pc"] = take(state["pc"])
    out["raster_feat"] = take(state["pc_geo_feat"])
    out["raster_valid"] = jnp.take_along_axis(
        state["pc_overlap_pred"], sel, axis=1)
    n_overlap = state["pc_overlap_pred"].sum(axis=1).astype(jnp.int32)
    out["raster_dropped"] = jnp.maximum(n_overlap - k, 0)
    return out


def _mega_raster(feats, R, t, image_h, image_w, raster_dtype, mean,
                 interpret: bool = False):
    """Projection-fused 2-D observation raster (``raster_mode="mega"``).

    Folds the disentangled SE(3) transform + pinhole projection into a
    12-float affine per sample (``A = K R``, ``b = K (mean + t - R
    mean)``) and hands the compacted valid-first cloud to
    :func:`..ops.pallas_kernels.segment_mean_count_image_project_fused`:
    the per-step [3, K] projection chain never leaves VMEM. Requires a
    pre-compacted state (compact_observation_state, either mode — both
    lay valid rows first, which the kernel's prefix gating and the
    ``counts`` operand assume).
    """
    from ..ops.pallas_kernels import segment_mean_count_image_project_fused
    pcT_k = feats.get("raster_pcT")
    if pcT_k is None:
        pcT_k = jnp.swapaxes(feats["raster_pc"], 1, 2)
    pcT_k = pcT_k.astype(jnp.float32)
    K_ = feats["K"].astype(jnp.float32)
    Rf = R.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    A = jnp.einsum("bij,bjk->bik", K_, Rf)
    bv = jnp.einsum("bij,bj->bi", K_,
                    mean + tf - jnp.einsum("bij,bj->bi", Rf, mean))
    ab = jnp.concatenate([A.reshape(-1, 9), bv], axis=1)      # [B, 12]
    counts = feats["raster_valid"].sum(axis=1).astype(jnp.int32)
    means, _ = segment_mean_count_image_project_fused(
        pcT_k, feats["raster_feat"], ab, counts, image_h, image_w,
        compute_dtype=raster_dtype, interpret=interpret)
    b = pcT_k.shape[0]
    f = feats["raster_feat"].shape[-1]
    return means.reshape(b, image_h, image_w, f)


def observation_from_pose(feats, pose, image_h: int, image_w: int,
                          use_pallas=None, raster_dtype=None,
                          pose_aware: bool = False,
                          bearing_channels: bool = False,
                          raster_mode: str = "topk",
                          obs3d_layout: str = "nc",
                          raster_interpret: bool = False,
                          obs3d_compact: bool = False):
    """Render the 2-D and 3-D observations under the current pose estimate.

    Args:
      feats: dict with ``pc [B,N,3]``, ``K [B,3,3]``,
        ``pc_overlap_pred [B,N]`` bool, ``pc_geo_feat [B,N,F]``,
        ``img_geo_feat [B,H,W,F]``.
      pose: ``[B,4,4]`` disentangled pose estimate.
      pose_aware: feed the 3-D observation the cloud transformed by the
        current estimate instead of the reference's static cloud
        (``cfg.pose_aware_observation`` — see the config comment for why).
      bearing_channels: append the unit (x, z) bearing of the
        predicted-overlap sector's centroid under the current estimate as
        two constant per-point channels (``cfg.obs_bearing_channels``).
        Motivation (docs/CONVERGENCE.md section 9): at full +-pi yaw the
        expert's rotation direction is an 0.86-0.88-accurate two-layer
        function of exactly this statistic (the diagnose_agent oracle),
        but trained policies kept flipping a coin on direction — handing
        the max-pool PointNet a mean-statistic it is poorly shaped to
        compute itself.

    Returns:
      ``(observation_2d [B,H,W,2F], observation_3d [B,N,5 (+2)])`` —
      channel-major ``[B, 5 (+2), N]`` with ``obs3d_layout="cn"`` (the
      fused-eval episode layout: XLA pads the minormost dim to 128 lanes,
      so a per-step row-major ``[B, N, 5]`` observation physically costs
      ~25x its logical bytes; :class:`..models.agent.CMRAgent` detects the
      layout from the channel count).
    """
    pc = feats["pc"]
    K = feats["K"]
    overlap = feats["pc_overlap_pred"]

    R = pose[:, :3, :3]
    t = pose[:, :3, 3]

    if obs3d_layout == "cn":
        return _observation_from_pose_cn(
            feats, R, t, image_h, image_w, use_pallas, raster_dtype,
            pose_aware, bearing_channels, raster_mode, raster_interpret,
            obs3d_compact)

    def project(points):
        moved = transform_points_disentangled(points, R, t)
        proj = project_points(moved, K)
        return moved, proj, frustum_mask(proj, w=image_w, h=image_h)

    # Disentangled transforms rotate about the FULL cloud centroid
    # (environment.py:46,54): compacted points must reuse it.
    mean_full = pc.mean(axis=1, keepdims=True)

    from ..ops.pallas_kernels import use_pallas_default
    if ("raster_pc" in feats and raster_mode == "mega"
            and feats["raster_pc"].shape[1] % 512 == 0
            and (use_pallas_default(use_pallas) or raster_interpret)):
        proj_feat = _mega_raster(feats, R, t, image_h, image_w,
                                 raster_dtype, mean_full[:, 0],
                                 raster_interpret)
        moved_full, _, in_cam = project(pc)
    elif "raster_pc" in feats:  # pre-compacted (compact_observation_state)
        r_pc = feats["raster_pc"]
        moved = (jnp.einsum("bij,bnj->bni", R, r_pc - mean_full)
                 + mean_full + t[:, None, :])
        r_proj = project_points(moved, K)
        r_in_cam = frustum_mask(r_proj, w=image_w, h=image_h)
        r_feat = feats["raster_feat"]
        r_valid = r_in_cam & feats["raster_valid"]
        xi = jnp.round(r_proj[..., 0]).astype(jnp.int32)
        yi = jnp.round(r_proj[..., 1]).astype(jnp.int32)
        pix = yi * image_w + xi
        # pre-compacted valid-first layout: the flat kernel's whole-tile
        # dead gating is already optimal here
        proj_feat = scatter_mean_image(r_feat, pix, r_valid,
                                       image_h, image_w,
                                       use_pallas=use_pallas,
                                       compute_dtype=raster_dtype,
                                       mode="flat")
        # full-cloud frustum flags (and moved cloud) for the 3-D obs
        moved_full, _, in_cam = project(pc)
    else:
        moved_full, proj, in_cam = project(pc)
        xi = jnp.round(proj[..., 0]).astype(jnp.int32)
        yi = jnp.round(proj[..., 1]).astype(jnp.int32)
        pix = yi * image_w + xi
        valid = in_cam & overlap
        proj_feat = scatter_mean_image(
            feats["pc_geo_feat"], pix, valid, image_h, image_w,
            use_pallas=use_pallas, compute_dtype=raster_dtype,
            mode="compact" if raster_mode == "compact" else "flat")

    observation_2d = jnp.concatenate([feats["img_geo_feat"], proj_feat],
                                     axis=-1)
    if obs3d_compact and "raster_pc" in feats:
        # 3-D observation over the COMPACTED set (Config.obs3d_source
        # ="compact", see the cn-path comment): the full-cloud projection
        # above becomes dead code and is DCE'd by XLA.
        src_pc = feats["raster_pc"]
        obs_overlap = feats["raster_valid"]
        moved_full, _, in_cam = project(src_pc)
    else:
        src_pc = pc
        obs_overlap = overlap
    obs_pc = moved_full if pose_aware else src_pc
    channels = [obs_pc, obs_overlap[..., None].astype(pc.dtype),
                in_cam[..., None].astype(pc.dtype)]
    if bearing_channels:
        w = obs_overlap.astype(pc.dtype)[..., None]          # [B,N,1]
        denom = jnp.maximum(w.sum(axis=1), 1.0)              # [B,1]
        cxz = (moved_full[..., (0, 2)] * w).sum(axis=1) / denom   # [B,2]
        unit = cxz / (jnp.linalg.norm(cxz, axis=-1, keepdims=True) + 1e-6)
        channels.append(jnp.broadcast_to(unit[:, None, :],
                                         (*obs_pc.shape[:2], 2)
                                         ).astype(pc.dtype))
    observation_3d = jnp.concatenate(channels, axis=-1)
    return observation_2d, observation_3d


def _observation_from_pose_cn(feats, R, t, image_h, image_w, use_pallas,
                              raster_dtype, pose_aware, bearing_channels,
                              raster_mode, raster_interpret=False,
                              obs3d_compact: bool = False):
    """Channel-major observation: every per-step intermediate is [B, C, N].

    Same math as the row-major body; the point axis rides the LANES so no
    narrow [B, N, 3] tensor ever materialises (see project_points_cn).
    ``feats`` may carry precomputed ``pcT [B, 3, N]`` / ``raster_pcT``
    (run_episode builds them once per episode).
    """
    from ..ops.geometry import frustum_mask_cn, project_points_cn
    pc = feats["pc"]
    K = feats["K"].astype(jnp.float32)
    overlap = feats["pc_overlap_pred"]
    dt_ = pc.dtype

    pcT = feats.get("pcT")
    if pcT is None:
        pcT = jnp.swapaxes(pc, 1, 2)                          # [B, 3, N]
    pcT = pcT.astype(jnp.float32)
    meanT = pcT.mean(axis=2, keepdims=True)                   # [B, 3, 1]
    Rf = R.astype(jnp.float32)
    tf = t.astype(jnp.float32)

    def projectT(ptsT):
        movedT = (jnp.einsum("bij,bjn->bin", Rf, ptsT - meanT)
                  + meanT + tf[:, :, None])
        projT = project_points_cn(movedT, K)
        return movedT, projT, frustum_mask_cn(projT, w=image_w, h=image_h)

    from ..ops.pallas_kernels import use_pallas_default
    if ("raster_pc" in feats and raster_mode == "mega"
            and feats["raster_pc"].shape[1] % 512 == 0
            and (use_pallas_default(use_pallas) or raster_interpret)):
        proj_feat = _mega_raster(feats, R, t, image_h, image_w,
                                 raster_dtype, meanT[:, :, 0],
                                 raster_interpret)
        movedT, _, in_cam = projectT(pcT)
    elif "raster_pc" in feats:  # pre-compacted (compact_observation_state)
        r_pcT = feats.get("raster_pcT")
        if r_pcT is None:
            r_pcT = jnp.swapaxes(feats["raster_pc"], 1, 2)
        _, r_projT, r_in_cam = projectT(r_pcT.astype(jnp.float32))
        r_valid = r_in_cam & feats["raster_valid"]
        xi = jnp.round(r_projT[:, 0]).astype(jnp.int32)       # [B, K]
        yi = jnp.round(r_projT[:, 1]).astype(jnp.int32)
        pix = yi * image_w + xi
        proj_feat = scatter_mean_image(feats["raster_feat"], pix, r_valid,
                                       image_h, image_w,
                                       use_pallas=use_pallas,
                                       compute_dtype=raster_dtype,
                                       mode="flat")
        movedT, _, in_cam = projectT(pcT)
    else:
        movedT, projT, in_cam = projectT(pcT)
        xi = jnp.round(projT[:, 0]).astype(jnp.int32)
        yi = jnp.round(projT[:, 1]).astype(jnp.int32)
        pix = yi * image_w + xi
        valid = in_cam & overlap
        proj_feat = scatter_mean_image(
            feats["pc_geo_feat"], pix, valid, image_h, image_w,
            use_pallas=use_pallas, compute_dtype=raster_dtype,
            mode="compact" if raster_mode == "compact" else "flat")

    observation_2d = jnp.concatenate([feats["img_geo_feat"], proj_feat],
                                     axis=-1)
    if obs3d_compact and "raster_pc" in feats:
        # 3-D observation over the COMPACTED set (Config.obs3d_source
        # ="compact"): the score-ranked top-K points (all predicted-overlap
        # points first, then the nearest-to-frustum remainder). The full
        # [B, 3, N] projection chain and the agent's [B, N, .] point
        # stacks — the single largest per-step HBM cost (docs/DESIGN.md)
        # — shrink to K rows; the full-cloud chain above becomes dead code
        # and is DCE'd by XLA. Accuracy-changing (the PointNet max-pools
        # a subset): opt-in pending a convergence A/B.
        src_pcT = feats.get("raster_pcT")
        if src_pcT is None:
            src_pcT = jnp.swapaxes(feats["raster_pc"], 1, 2)
        src_pcT = src_pcT.astype(jnp.float32)
        obs_overlap = feats["raster_valid"]
        movedT, _, in_cam = projectT(src_pcT)
    else:
        src_pcT = pcT
        obs_overlap = overlap
    obs_pcT = movedT if pose_aware else src_pcT
    channels = [obs_pcT.astype(dt_), obs_overlap[:, None, :].astype(dt_),
                in_cam[:, None, :].astype(dt_)]
    if bearing_channels:
        w_row = obs_overlap.astype(jnp.float32)[:, None, :]   # [B, 1, N]
        denom = jnp.maximum(w_row.sum(axis=2), 1.0)           # [B, 1]
        cxz = (movedT[:, (0, 2), :] * w_row).sum(axis=2) / denom  # [B, 2]
        unit = cxz / (jnp.linalg.norm(cxz, axis=-1, keepdims=True) + 1e-6)
        channels.append(jnp.broadcast_to(
            unit[:, :, None],
            (src_pcT.shape[0], 2, src_pcT.shape[2])).astype(dt_))
    observation_3d = jnp.concatenate(channels, axis=1)        # [B, C, N|K]
    return observation_2d, observation_3d


def expert_action(pose_source, pose_target, r_steps, t_steps,
                  is_6_dof: bool = False):
    """Discrete expert action toward the target (environment.py:143-176).

    The rotation delta is extracted as extrinsic-xyz euler; when the roll
    component exceeds 3 rad (the R(pi)-ambiguity region) the expert zeroes
    rx/rz and reflects ry about +-pi — the reference's disambiguation
    (environment.py:153-159).

    Branch-cut note: a pure yaw delta beyond +-pi/2 decomposes with roll
    exactly +-pi; scipy's sign there depends on float residue, so the
    reference's flip branch fires nondeterministically for such poses. Our
    ``atan2`` consistently yields +pi, so the flip (which recovers the true
    yaw magnitude — the "aim-true" behaviour) always triggers. This is the
    strictly-better deterministic choice.

    Returns ``(action_r [B, dr], action_t [B, dt])`` int32 indices into the
    step tables.
    """
    delta_t = pose_target[:, :3, 3] - pose_source[:, :3, 3]
    delta_R = pose_target[:, :3, :3] @ jnp.swapaxes(
        pose_source[:, :3, :3], -1, -2)
    delta_r = matrix_to_euler_xyz_extrinsic(delta_R)

    flip = delta_r[:, 0] > 3.0
    ry = delta_r[:, 1]
    ry_flipped = jnp.where(ry > 0, jnp.pi - ry,
                           jnp.where(ry < 0, -jnp.pi - ry, ry))
    delta_r = jnp.stack([
        jnp.where(flip, 0.0, delta_r[:, 0]),
        jnp.where(flip, ry_flipped, ry),
        jnp.where(flip, 0.0, delta_r[:, 2]),
    ], axis=-1)

    err_r = jnp.abs(delta_r[..., None] - r_steps[None, None, :])
    action_r = jnp.argmin(err_r, axis=-1).astype(jnp.int32)
    err_t = jnp.abs(delta_t[..., None] - t_steps[None, None, :])
    action_t = jnp.argmin(err_t, axis=-1).astype(jnp.int32)

    if not is_6_dof:
        action_r = action_r[:, 1:2]                       # yaw only
        action_t = jnp.stack([action_t[:, 0], action_t[:, 2]], axis=-1)
    return action_r, action_t


def apply_action(action_r, action_t, pose_source, r_steps, t_steps,
                 is_6_dof: bool = False):
    """Left-compose the discrete step onto the pose (environment.py:179-207)."""
    b = action_r.shape[0]
    if is_6_dof:
        move_r = r_steps[action_r]                        # [B, 3]
        move_t = t_steps[action_t]
    else:
        zero = jnp.zeros((b,), dtype=r_steps.dtype)
        move_r = jnp.stack([zero, r_steps[action_r[:, 0]], zero], axis=-1)
        move_t = jnp.stack([t_steps[action_t[:, 0]], zero,
                            t_steps[action_t[:, 1]]], axis=-1)

    R_new = euler_angles_to_matrix_xyz(move_r) @ pose_source[:, :3, :3]
    pose = pose_source.at[:, :3, :3].set(R_new)
    pose = pose.at[:, :3, 3].add(move_t)
    return pose


def step_reward(pose, batch, prev_distance=None, apply_pose: bool = True):
    """Dense +-0.5 reward on masked point-to-point distance improvement.

    Reference environment.py:263-302 with the fix: when ``apply_pose`` the
    current pose transforms the cloud (disentangled) before measuring the
    distance to ``pc_in_cam_space``; ``apply_pose=False`` reproduces the
    reference's committed behaviour where the distance never changes.

    Returns ``(reward [B,1,1], distance [B,1,1])``.
    """
    pc_target = batch["pc_in_cam_space"]                  # [B, N, 3]
    mask = batch["pc_mask"].astype(pc_target.dtype)       # [B, N]
    pc = batch["pc"]

    mean = pc.mean(axis=1, keepdims=True)
    if apply_pose:
        moved = transform_points_disentangled(pc, pose[:, :3, :3],
                                              pose[:, :3, 3])
        diff = pc_target - moved
    else:
        diff = pc_target - (pc - mean)
    d = jnp.sum(diff * diff, axis=-1)                     # [B, N]
    d = jnp.sum(d * mask, axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
    d = d[:, None, None]

    if prev_distance is None:
        return jnp.zeros_like(d), d
    better = (d < prev_distance).astype(d.dtype) * 0.5
    worse = (d > prev_distance).astype(d.dtype) * 0.5
    return better - worse, d
