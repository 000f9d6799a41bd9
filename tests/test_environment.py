"""Environment tests against numpy/scipy oracles + scan episode smoke."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from cmr_agent_tpu.config import tiny_config
from cmr_agent_tpu.env import (
    init_poses, expert_action, apply_action, observation_from_pose,
    step_reward, run_episode, TrajectoryBuffer, discounted_returns,
    gae_advantage,
)
from cmr_agent_tpu.models import CMRAgent
from cmr_agent_tpu.ops import make_se3, to_disentangled


CFG = tiny_config()
R_STEPS = CFG.r_steps_array()
T_STEPS = CFG.t_steps_array()


def _np_expert(pose_source, pose_target):
    """Reference expert (environment/environment.py:143-176) in numpy."""
    delta_t = pose_target[:, :3, 3] - pose_source[:, :3, 3]
    delta_R = pose_target[:, :3, :3] @ np.swapaxes(pose_source[:, :3, :3], 1, 2)
    delta_r = Rotation.from_matrix(delta_R).as_euler("xyz")
    mask = delta_r[:, 0] > 3
    delta_r[mask, 0] = 0
    mask_p = delta_r[:, 1] > 0
    delta_r[mask & mask_p, 1] = math.pi - delta_r[mask & mask_p, 1]
    mask_n = delta_r[:, 1] < 0
    delta_r[mask & mask_n, 1] = -math.pi - delta_r[mask & mask_n, 1]
    delta_r[mask, 2] = 0
    action_r = np.abs(delta_r[:, :, None] - R_STEPS[None, None]).argmin(2)
    action_t = np.abs(delta_t[:, :, None] - T_STEPS[None, None]).argmin(2)
    return action_r[:, 1:2], action_t[:, [0, 2]]


def test_expert_matches_scipy_oracle_incl_flip():
    rng = np.random.default_rng(0)
    # Exercise both branches away from the euler branch cut (|yaw| ~ pi/2
    # with roll 0 decomposes with roll exactly +-pi, where scipy's sign —
    # and hence the reference's flip decision — depends on float residue).
    angles = rng.uniform(-np.pi, np.pi, size=(64, 3))
    roll_flip = rng.random(64) > 0.5
    angles[:, 0] = np.where(roll_flip, np.pi - 1e-3, 0.0)
    angles[~roll_flip, 1] = rng.uniform(-1.5, 1.5, size=(~roll_flip).sum())
    R = Rotation.from_euler("xyz", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-10, 10, size=(64, 3)).astype(np.float32)
    tgt = np.asarray(make_se3(jnp.array(R), jnp.array(t)))
    src = np.tile(np.eye(4, dtype=np.float32), (64, 1, 1))

    want_r, want_t = _np_expert(src, tgt)
    got_r, got_t = expert_action(jnp.array(src), jnp.array(tgt),
                                 jnp.array(R_STEPS), jnp.array(T_STEPS))
    np.testing.assert_array_equal(np.asarray(got_r), want_r)
    np.testing.assert_array_equal(np.asarray(got_t), want_t)


def test_expert_aims_true_at_branch_cut():
    # Pure yaw of 2.5 rad: euler roll is exactly +-pi; our deterministic
    # +pi choice triggers the flip, recovering ry = pi - asin(sin 2.5) ~ 2.5
    # so the expert picks the largest positive yaw step.
    yaw = 2.5
    R = Rotation.from_euler("y", yaw).as_matrix().astype(np.float32)[None]
    tgt = np.asarray(make_se3(jnp.array(R), jnp.zeros((1, 3))))
    src = np.eye(4, dtype=np.float32)[None]
    got_r, _ = expert_action(jnp.array(src), jnp.array(tgt),
                             jnp.array(R_STEPS), jnp.array(T_STEPS))
    want = int(np.abs(2.5 - R_STEPS).argmin())
    assert int(got_r[0, 0]) == want


def test_apply_action_composes_left():
    b = 4
    rng = np.random.default_rng(1)
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
    ar = jnp.array(rng.integers(0, 11, size=(b, 1)), jnp.int32)
    at = jnp.array(rng.integers(0, 11, size=(b, 2)), jnp.int32)
    new = np.asarray(apply_action(ar, at, pose, jnp.array(R_STEPS),
                                  jnp.array(T_STEPS)))
    for i in range(b):
        ry = R_STEPS[int(ar[i, 0])]
        c, s = np.cos(ry), np.sin(ry)
        want_R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        np.testing.assert_allclose(new[i, :3, :3], want_R, atol=1e-5)
        np.testing.assert_allclose(
            new[i, :3, 3],
            [T_STEPS[int(at[i, 0])], 0.0, T_STEPS[int(at[i, 1])]], atol=1e-6)


def _np_observation(state, pose, h, w):
    """Reference observation (environment.py:25-126) in numpy."""
    B, N, _ = state["pc"].shape
    F = state["pc_geo_feat"].shape[-1]
    obs2d = np.zeros((B, h, w, 2 * F), np.float32)
    obs3d = np.zeros((B, N, 5), np.float32)
    for i in range(B):
        pc = state["pc"][i]
        mean = pc.mean(0, keepdims=True)
        R, t = pose[i, :3, :3], pose[i, :3, 3]
        moved = (pc - mean) @ R.T + mean + t
        proj = moved @ state["K"][i].T
        xy = proj[:, :2] / proj[:, 2:3]
        in_cam = ((xy[:, 0] >= 0) & (xy[:, 0] <= w - 1) & (xy[:, 1] >= 0)
                  & (xy[:, 1] <= h - 1) & (proj[:, 2] > 0))
        ov = state["pc_overlap_pred"][i]
        grid_sum = np.zeros((h * w, F))
        grid_cnt = np.zeros(h * w)
        for n in range(N):
            if ov[n] and in_cam[n]:
                px = int(np.round(xy[n, 0]))
                py = int(np.round(xy[n, 1]))
                grid_sum[py * w + px] += state["pc_geo_feat"][i, n]
                grid_cnt[py * w + px] += 1
        grid = grid_sum / np.maximum(grid_cnt, 1)[:, None]
        obs2d[i] = np.concatenate(
            [state["img_geo_feat"][i], grid.reshape(h, w, F)], axis=-1)
        obs3d[i] = np.concatenate(
            [pc, ov[:, None].astype(np.float32),
             in_cam[:, None].astype(np.float32)], axis=-1)
    return obs2d, obs3d


def test_observation_matches_loop_oracle():
    rng = np.random.default_rng(2)
    B, N, F, h, w = 2, 200, 8, 6, 10
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    state = {
        "pc": rng.normal(size=(B, N, 3)).astype(np.float32) * 2
              + np.array([0, 0, 6], np.float32),
        "K": np.tile(K, (B, 1, 1)),
        "pc_overlap_pred": rng.integers(0, 2, size=(B, N)).astype(bool),
        "pc_geo_feat": rng.normal(size=(B, N, F)).astype(np.float32),
        "img_geo_feat": rng.normal(size=(B, h, w, F)).astype(np.float32),
    }
    angles = rng.uniform(-0.3, 0.3, size=(B, 3))
    R = Rotation.from_euler("xyz", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-0.5, 0.5, size=(B, 3)).astype(np.float32)
    pose = np.asarray(make_se3(jnp.array(R), jnp.array(t)))

    want2d, want3d = _np_observation(state, pose, h, w)
    got2d, got3d = observation_from_pose(
        {k: jnp.array(v) for k, v in state.items()}, jnp.array(pose), h, w)
    np.testing.assert_allclose(np.asarray(got2d), want2d, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got3d), want3d, atol=1e-6)


def test_pose_aware_observation():
    """Config.pose_aware_observation: the 3-D observation's coordinate
    channels carry the cloud under the CURRENT estimate; flags and the 2-D
    raster are identical to the reference-parity static observation, and at
    identity pose the two modes coincide."""
    from cmr_agent_tpu.ops import transform_points_disentangled

    rng = np.random.default_rng(5)
    B, N, F, h, w = 2, 150, 4, 6, 10
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    state = {
        "pc": rng.normal(size=(B, N, 3)).astype(np.float32) * 2
              + np.array([0, 0, 6], np.float32),
        "K": np.tile(K, (B, 1, 1)),
        "pc_overlap_pred": rng.integers(0, 2, size=(B, N)).astype(bool),
        "pc_geo_feat": rng.normal(size=(B, N, F)).astype(np.float32),
        "img_geo_feat": rng.normal(size=(B, h, w, F)).astype(np.float32),
    }
    jstate = {k: jnp.array(v) for k, v in state.items()}
    angles = rng.uniform(-0.4, 0.4, size=(B, 3))
    R = Rotation.from_euler("xyz", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-0.5, 0.5, size=(B, 3)).astype(np.float32)
    pose = jnp.array(np.asarray(make_se3(jnp.array(R), jnp.array(t))))

    ref2d, ref3d = observation_from_pose(jstate, pose, h, w)
    got2d, got3d = observation_from_pose(jstate, pose, h, w,
                                         pose_aware=True)
    np.testing.assert_array_equal(np.asarray(got2d), np.asarray(ref2d))
    # flags unchanged; coordinates are the moved cloud
    np.testing.assert_array_equal(np.asarray(got3d[..., 3:]),
                                  np.asarray(ref3d[..., 3:]))
    moved = transform_points_disentangled(jstate["pc"], pose[:, :3, :3],
                                          pose[:, :3, 3])
    np.testing.assert_allclose(np.asarray(got3d[..., :3]),
                               np.asarray(moved), atol=1e-6)
    assert np.abs(np.asarray(got3d[..., :3])
                  - np.asarray(ref3d[..., :3])).max() > 0.1

    eye = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    a2d, a3d = observation_from_pose(jstate, eye, h, w, pose_aware=True)
    b2d, b3d = observation_from_pose(jstate, eye, h, w)
    # identity transform round-trips through (pc - mean) + mean: equal up
    # to float association, not bitwise
    np.testing.assert_allclose(np.asarray(a3d), np.asarray(b3d), atol=1e-5)

    # ---- bearing channels (Config.obs_bearing_channels) ----
    c2d, c3d = observation_from_pose(jstate, pose, h, w, pose_aware=True,
                                     bearing_channels=True)
    assert c3d.shape == (B, N, 7)
    # first 5 channels identical to the bearing-less observation
    np.testing.assert_array_equal(np.asarray(c3d[..., :5]),
                                  np.asarray(got3d))
    # numpy oracle: unit (x, z) of the overlap-sector centroid of the
    # MOVED cloud, constant across points within a sample
    m = np.asarray(moved)
    wgt = state["pc_overlap_pred"].astype(np.float64)
    cx = (m[..., 0] * wgt).sum(1) / np.maximum(wgt.sum(1), 1.0)
    cz = (m[..., 2] * wgt).sum(1) / np.maximum(wgt.sum(1), 1.0)
    nrm = np.sqrt(cx**2 + cz**2) + 1e-6
    want = np.stack([cx / nrm, cz / nrm], axis=-1)          # [B, 2]
    got_bear = np.asarray(c3d[..., 5:])
    assert np.abs(got_bear - got_bear[:, :1, :]).max() == 0   # constant
    np.testing.assert_allclose(got_bear[:, 0, :], want, atol=1e-5)
    # all-empty overlap must not NaN
    empty = dict(jstate, pc_overlap_pred=jnp.zeros((B, N), bool))
    _, e3d = observation_from_pose(empty, pose, h, w, pose_aware=True,
                                   bearing_channels=True)
    assert np.isfinite(np.asarray(e3d)).all()


def test_bearing_init_pose_recovers_yaw():
    """A sector of overlap points at centroid-relative bearing theta must
    yield the init R_y(-theta) that rotates the sector onto +z; an empty
    overlap prediction falls back to identity."""
    from cmr_agent_tpu.env import bearing_init_pose

    rng = np.random.default_rng(11)
    n = 512
    thetas = np.array([0.0, 0.7, -2.4, 3.0], np.float32)
    pcs, overlaps = [], []
    for th in thetas:
        # ring of background points (zero-mean) + a tight flagged sector
        # at bearing th, radius ~10
        ang = rng.uniform(-np.pi, np.pi, n - 64)
        bg = np.stack([10 * np.sin(ang), rng.normal(size=n - 64),
                       10 * np.cos(ang)], axis=-1)
        sec_ang = th + rng.normal(scale=0.05, size=64)
        sec = np.stack([10 * np.sin(sec_ang), rng.normal(size=64),
                        10 * np.cos(sec_ang)], axis=-1)
        pcs.append(np.concatenate([bg, sec]).astype(np.float32))
        overlaps.append(np.arange(n) >= n - 64)
    state = {"pc": jnp.asarray(np.stack(pcs)),
             "pc_overlap_pred": jnp.asarray(np.stack(overlaps))}
    pose = np.asarray(bearing_init_pose(state))
    assert pose.shape == (4, 4, 4)
    for i, th in enumerate(thetas):
        # recovered yaw: R_y(-theta) has R[0,2] = sin(-theta)
        got = math.atan2(pose[i, 0, 2], pose[i, 0, 0])
        # background ring shifts the weighted centroid slightly; 0.15 rad
        # tolerance is ample for a coarse init refined by 10 policy steps
        err = abs((got + th + math.pi) % (2 * math.pi) - math.pi)
        assert err < 0.15, (th, got)
        # translation must be zero (pure disentangled yaw)
        np.testing.assert_allclose(pose[i, :3, 3], 0.0, atol=0)
    # empty overlap -> atan2(0, 0) = 0 -> identity
    empty = {"pc": state["pc"],
             "pc_overlap_pred": jnp.zeros((4, n), bool)}
    np.testing.assert_allclose(np.asarray(bearing_init_pose(empty)),
                               np.broadcast_to(np.eye(4), (4, 4, 4)),
                               atol=1e-6)


@pytest.mark.parametrize("aux_head", [False, True])
def test_episode_with_bearing_channels(aux_head):
    """run_episode end-to-end with obs_bearing_channels (and optionally the
    policy_aux_state head): the agent sees a 7-channel 3-D observation and
    the scan compiles and steps."""
    import dataclasses
    from cmr_agent_tpu.config import tiny_config
    from cmr_agent_tpu.data import SyntheticDataset, collate
    from cmr_agent_tpu.models import MultiHeadModel, CMRAgent
    from cmr_agent_tpu.env import init_poses, run_episode
    from cmr_agent_tpu.ops import to_disentangled

    cfg = dataclasses.replace(tiny_config(), pose_aware_observation=True,
                              obs_bearing_channels=True,
                              policy_aux_state=aux_head)
    assert cfg.obs3d_channels == 7
    ds = SyntheticDataset(cfg, length=2)
    batch = {k: jnp.asarray(v) for k, v in
             collate([ds[0], ds[1]]).items()}
    model = MultiHeadModel(cfg)
    gv = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, batch, train=False,
                    with_loss=False)
    out = model.apply(gv, batch, train=False, with_loss=False)
    state = {"pc": out["pc"], "K": batch["K"],
             "pc_overlap_pred": out["pc_overlap_pred"],
             "pc_geo_feat": out["pc_geo_feat"],
             "img_geo_feat": out["img_geo_feat"],
             "pc_in_cam_space": batch["pc_in_cam_space"],
             "pc_mask": batch["pc_mask"], "P": batch["P"]}
    agent = CMRAgent(cfg)
    av = agent.init({"params": jax.random.key(2)},
                    jnp.zeros((2, cfg.image_h, cfg.image_w,
                               2 * cfg.embed_dim)),
                    jnp.zeros((2, cfg.num_pt, cfg.obs3d_channels)),
                    train=False)
    pose_src, pose_tgt = init_poses(state)
    pose_tgt = to_disentangled(pose_tgt, state["pc"])
    apply_fn = lambda v, o2, o3: agent.apply(v, o2, o3, train=False)
    final, _ = run_episode(apply_fn, av, state, pose_src, pose_tgt, cfg,
                           deterministic=True)
    assert np.isfinite(np.asarray(final)).all()


def test_apply_coarse_pose_rebases_problem():
    """Re-basing under the TRUE pose leaves a (near-)identity residual
    target, and the transform preserves rigid invariants."""
    from cmr_agent_tpu.env import apply_coarse_pose
    from cmr_agent_tpu.ops import pose_diff

    rng = np.random.default_rng(3)
    B, N = 2, 64
    pc = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    node = pc[:, :16]
    P = jnp.stack([
        jnp.asarray(make_se3(Rotation.from_euler(
            "y", a).as_matrix(), t), jnp.float32)
        for a, t in [(0.7, [1.0, 0.0, -2.0]), (-2.9, [4.0, 0.0, 3.0])]])
    batch = {"pc": pc, "node": node, "P": P,
             "pt2node": jnp.zeros((B, N), jnp.int32)}

    # coarse == the full true pose -> residual target is identity
    out = apply_coarse_pose(batch, P)
    rte, rre = pose_diff(out["P"],
                         jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))
    np.testing.assert_allclose(np.asarray(rte), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rre), 0.0, atol=1e-3)
    # the cloud was really transformed by P
    want = (jnp.einsum("bij,bnj->bni", P[:, :3, :3], pc)
            + P[:, None, :3, 3])
    np.testing.assert_allclose(np.asarray(out["pc"]), np.asarray(want),
                               atol=1e-5)
    # rigid invariants: pairwise distances preserved; pt2node untouched
    d0 = np.linalg.norm(np.asarray(pc[:, :1] - pc), axis=-1)
    d1 = np.linalg.norm(np.asarray(out["pc"][:, :1] - out["pc"]), axis=-1)
    np.testing.assert_allclose(d1, d0, atol=1e-4)
    assert out["pt2node"] is batch["pt2node"]

    # partial coarse pose: residual composes back to the original target
    half = jnp.stack([
        jnp.asarray(make_se3(Rotation.from_euler(
            "y", a).as_matrix(), t), jnp.float32)
        for a, t in [(0.35, [0.5, 0.0, -1.0]), (-1.45, [2.0, 0.0, 1.5])]])
    out2 = apply_coarse_pose(batch, half)
    np.testing.assert_allclose(np.asarray(out2["P"] @ half),
                               np.asarray(P), atol=1e-4)


def test_alignment_score_ranks_true_pose_first():
    """The feature-alignment verification score is highest at the true
    pose: image descriptors are planted at each point's true projection,
    so any yaw error decorrelates point/pixel descriptors (or empties the
    frustum) and the score must drop."""
    from cmr_agent_tpu.env import alignment_score

    rng = np.random.default_rng(7)
    B, N, F = 2, 128, 8
    h, w = CFG.image_h, CFG.image_w
    # points strictly inside the frustum of a simple pinhole K
    K = np.array([[float(w), 0, w / 2], [0, float(w), h / 2], [0, 0, 1]],
                 np.float32)
    x = rng.uniform(-0.45, 0.45, size=(B, N))
    y = rng.uniform(-0.2, 0.2, size=(B, N))
    z = rng.uniform(2.0, 6.0, size=(B, N))
    pc = np.stack([x * z, y * z, z], axis=-1).astype(np.float32)

    feat = rng.normal(size=(B, N, F)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    img_feat = rng.normal(size=(B, h, w, F)).astype(np.float32)
    img_feat /= np.linalg.norm(img_feat, axis=-1, keepdims=True)
    # plant each point's descriptor at its true pixel (identity pose)
    proj = pc @ K.T
    xi = np.clip(np.round(proj[..., 0] / proj[..., 2]), 0, w - 1).astype(int)
    yi = np.clip(np.round(proj[..., 1] / proj[..., 2]), 0, h - 1).astype(int)
    for b in range(B):
        img_feat[b, yi[b], xi[b]] = feat[b]

    state = {"pc": jnp.asarray(pc), "K": jnp.asarray(K)[None].repeat(B, 0),
             "pc_geo_feat": jnp.asarray(feat),
             "img_geo_feat": jnp.asarray(img_feat)}
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    s_true = np.asarray(alignment_score(state, eye, h, w))

    def yaw_pose(angle):
        R = Rotation.from_euler("y", angle).as_matrix().astype(np.float32)
        return jnp.asarray(np.broadcast_to(
            make_se3(R, np.zeros(3, np.float32)), (B, 4, 4)))

    s_small = np.asarray(alignment_score(state, yaw_pose(0.3), h, w))
    s_flip = np.asarray(alignment_score(state, yaw_pose(np.pi), h, w))
    # true pose wins decisively per sample; a backwards pose scores ~0
    # (random descriptor pairs are near-orthogonal, so the in-frustum
    # remainder of the flipped cloud contributes only noise)
    assert (s_true > s_small + 0.2).all(), (s_true, s_small)
    assert (s_true > 0.5).all()
    assert (np.abs(s_flip) < 0.15).all() and (s_true > s_flip + 0.3).all()

    # alignment_stats: the score is its sum_norm entry, and the other
    # statistics are internally consistent at the true pose (all points
    # in-frustum; planted descriptors give strong >0.7 inliers that the
    # flipped pose cannot)
    from cmr_agent_tpu.env import alignment_stats

    st = {k: np.asarray(v)
          for k, v in alignment_stats(state, eye, h, w).items()}
    stf = {k: np.asarray(v)
           for k, v in alignment_stats(state, yaw_pose(np.pi), h, w).items()}
    assert np.allclose(st["sum_norm"], s_true)
    assert (st["frac_valid"] > 0.99).all()
    assert np.allclose(st["mean_valid"] * st["frac_valid"], st["sum_norm"],
                       atol=1e-5)
    assert np.allclose(st["smooth_mean"],
                       st["sum_norm"] / (st["frac_valid"] + 0.1), atol=1e-5)
    assert (st["above50_norm"] >= st["above70_norm"]).all()
    assert (st["above50_norm"] > stf["above50_norm"] + 0.2).all()
    assert (st["above70_norm"] > stf["above70_norm"] + 0.2).all()


def test_nn_alignment_stats_spatial_consistency():
    """The matching-IR-at-pose verifier: each point's feature-NN pixel
    (pose-independent) must coincide with its projection under the
    candidate pose. Descriptors are planted at unique true pixels, so at
    the identity pose nearly every in-frustum point is an inlier, while a
    yawed pose moves the projections far from the (unchanged) NN pixels
    and the inlier statistics collapse — even though the local-cosine
    statistics can stay mildly positive. Also checks the chunked NN
    search is invariant to the chunk size (padding path)."""
    from cmr_agent_tpu.env import alignment_stats, nn_alignment_stats

    rng = np.random.default_rng(11)
    B, N, F = 2, 96, 8
    h, w = CFG.image_h, CFG.image_w
    K = np.array([[float(w), 0, w / 2], [0, float(w), h / 2], [0, 0, 1]],
                 np.float32)
    # unique pixels per sample so planting never overwrites a descriptor
    pix = np.stack([rng.choice(h * w, size=N, replace=False)
                    for _ in range(B)])                       # [B, N]
    xi, yi = (pix % w).astype(np.float32), (pix // w).astype(np.float32)
    z = rng.uniform(2.0, 6.0, size=(B, N)).astype(np.float32)
    pc = np.stack([(xi - w / 2) / w * z, (yi - h / 2) / w * z, z],
                  axis=-1).astype(np.float32)

    feat = rng.normal(size=(B, N, F)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    img_feat = rng.normal(size=(B, h, w, F)).astype(np.float32)
    img_feat /= np.linalg.norm(img_feat, axis=-1, keepdims=True)
    for b in range(B):
        img_feat[b, yi[b].astype(int), xi[b].astype(int)] = feat[b]

    state = {"pc": jnp.asarray(pc), "K": jnp.asarray(K)[None].repeat(B, 0),
             "pc_geo_feat": jnp.asarray(feat),
             "img_geo_feat": jnp.asarray(img_feat)}
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    st = {k: np.asarray(v)
          for k, v in nn_alignment_stats(state, eye, h, w).items()}
    # planted NN == projection: near-perfect inlier rate at the true pose
    assert (st["ir_mean"] > 0.95).all(), st
    assert (st["ir_norm"] > 0.9).all()
    a = {k: np.asarray(v)
         for k, v in alignment_stats(state, eye, h, w).items()}
    # internal consistency with the frustum accounting of alignment_stats
    frac = a["frac_valid"]
    assert np.allclose(st["ir_mean"] * frac, st["ir_norm"], atol=1e-5)
    assert np.allclose(st["ir_smooth"], st["ir_norm"] / (frac + 0.1),
                       atol=1e-5)

    def yaw_pose(angle):
        R = Rotation.from_euler("y", angle).as_matrix().astype(np.float32)
        return jnp.asarray(np.broadcast_to(
            make_se3(R, np.zeros(3, np.float32)), (B, 4, 4)))

    stw = {k: np.asarray(v)
           for k, v in nn_alignment_stats(state, yaw_pose(0.4), h, w).items()}
    # a 0.4 rad yaw moves projections ~0.4*w px >> the 3 px radius while
    # the NN pixels don't move: the inlier statistics must collapse
    assert (st["ir_mean"] > stw["ir_mean"] + 0.5).all(), (st, stw)
    assert (st["ir_smooth"] > stw["ir_smooth"] + 0.3).all()

    # chunking/padding invariance: N=96 forces the pad with chunk=64 and
    # two chunks with chunk=48; results must be identical to the default
    for c in (48, 64):
        stc = nn_alignment_stats(state, eye, h, w, chunk=c)
        for k in st:
            assert np.allclose(np.asarray(stc[k]), st[k], atol=1e-6), k


def test_compose_disentangled_matches_sequential_application():
    """compose_disentangled must return the single entangled transform
    equivalent to: apply the coarse rebase, then apply the episode's
    final pose in the DISENTANGLED convention of the rebased cloud."""
    from cmr_agent_tpu.env import compose_disentangled
    from cmr_agent_tpu.ops.geometry import (transform_points,
                                            transform_points_disentangled)

    rng = np.random.default_rng(5)
    B, N = 3, 64
    pc = rng.normal(scale=4.0, size=(B, N, 3)).astype(np.float32)

    def rand_se3():
        R = Rotation.random(B, random_state=rng.integers(1 << 30)
                            ).as_matrix().astype(np.float32)
        t = rng.uniform(-3, 3, size=(B, 3)).astype(np.float32)
        out = np.zeros((B, 4, 4), np.float32)
        out[:, :3, :3] = R
        out[:, :3, 3] = t
        out[:, 3, 3] = 1.0
        return out

    coarse, final = rand_se3(), rand_se3()
    rebased = np.asarray(transform_points(
        jnp.asarray(pc), jnp.asarray(coarse[:, :3, :3]),
        jnp.asarray(coarse[:, :3, 3])))
    expected = np.asarray(transform_points_disentangled(
        jnp.asarray(rebased), jnp.asarray(final[:, :3, :3]),
        jnp.asarray(final[:, :3, 3])))
    total = compose_disentangled(jnp.asarray(final), jnp.asarray(coarse),
                                 jnp.asarray(pc))
    got = np.asarray(transform_points(
        jnp.asarray(pc), total[:, :3, :3], total[:, :3, 3]))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_reward_improves_toward_target():
    rng = np.random.default_rng(3)
    B, N = 2, 100
    pc_cam = rng.normal(size=(B, N, 3)).astype(np.float32)
    # perturb: rotate about centroid + translate (disentangled ground truth)
    angles = rng.uniform(-0.5, 0.5, size=(B, 3))
    Rm = Rotation.from_euler("xyz", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)
    mean = pc_cam.mean(1, keepdims=True)
    pc_pert = np.einsum("bij,bnj->bni", Rm, pc_cam - mean) + mean + t[:, None]

    batch = {
        "pc": jnp.array(pc_pert),
        # reference target: pc_in_cam_space compared against centred cloud
        "pc_in_cam_space": jnp.array(pc_cam - pc_cam.mean(1, keepdims=True)),
        "pc_mask": jnp.ones((B, N), jnp.int32),
    }
    # ground-truth inverse pose (disentangled about pc_pert centroid)
    P = np.asarray(make_se3(jnp.array(np.swapaxes(Rm, 1, 2)),
                            jnp.array(-np.einsum("bji,bj->bi", Rm, t))))
    # identity at start
    eye = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    _, d0 = step_reward(eye, batch, apply_pose=True)
    # reward measures against centred target; the pose that undoes the
    # perturbation must shrink the distance
    mean_pert = pc_pert.mean(1, keepdims=True)
    undo = np.einsum("bij,bnj->bni", np.swapaxes(Rm, 1, 2),
                     pc_pert - mean_pert)
    # build the corresponding [B,4,4] disentangled pose: rotation Rm^T,
    # translation mapping back toward centred original
    t_fix = (pc_cam - pc_cam.mean(1, keepdims=True)).mean(1) - undo.mean(1)
    pose_fix = make_se3(jnp.array(np.swapaxes(Rm, 1, 2)),
                        jnp.array(t_fix.astype(np.float32)))
    r, d1 = step_reward(pose_fix, batch, prev_distance=d0, apply_pose=True)
    assert np.all(np.asarray(d1) < np.asarray(d0))
    np.testing.assert_allclose(np.asarray(r).ravel(), 0.5)

    # degenerate reference semantics: distance constant, reward 0
    _, dd0 = step_reward(eye, batch, apply_pose=False)
    r2, dd1 = step_reward(pose_fix, batch, prev_distance=dd0,
                          apply_pose=False)
    np.testing.assert_allclose(np.asarray(dd0), np.asarray(dd1))
    np.testing.assert_allclose(np.asarray(r2).ravel(), 0.0)


def test_run_episode_scan_and_buffer():
    cfg = CFG
    rng = np.random.default_rng(4)
    B, N = 2, cfg.num_pt
    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    state = {
        "pc": jnp.array(rng.normal(size=(B, N, 3)), jnp.float32),
        "K": jnp.array(np.tile(K, (B, 1, 1))),
        "pc_overlap_pred": jnp.array(rng.integers(0, 2, (B, N)), bool),
        "pc_geo_feat": jnp.array(rng.normal(size=(B, N, f)), jnp.float32),
        "img_geo_feat": jnp.array(rng.normal(size=(B, h, w, f)), jnp.float32),
        "pc_in_cam_space": jnp.array(rng.normal(size=(B, N, 3)), jnp.float32),
        "pc_mask": jnp.ones((B, N), jnp.int32),
        "P": jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
    }
    agent = CMRAgent(cfg)
    obs2d, obs3d = observation_from_pose(state, state["P"], h, w)
    avars = agent.init(jax.random.key(0), obs2d, obs3d, train=False)
    apply_fn = lambda v, o2, o3: agent.apply(v, o2, o3, train=False)

    pose_src, pose_tgt = init_poses(state)
    pose_tgt = to_disentangled(pose_tgt, state["pc"])

    final, traj = run_episode(
        apply_fn, avars, state, pose_src, pose_tgt, cfg,
        deterministic=False, key=jax.random.key(1), with_expert=True,
        collect_trajectory=True)
    k = cfg.action_num
    assert final.shape == (B, 4, 4)
    assert traj["state_2d"].shape == (k, B, h, w, 2 * f)
    assert traj["state_3d"].shape == (k, B, N, 5)
    assert traj["action_logprob"].shape == (k, B, 3)
    assert traj["expert_action_r"].shape == (k, B, 1)

    # deterministic episode is reproducible
    f1, _ = run_episode(apply_fn, avars, state, pose_src, pose_tgt, cfg,
                        deterministic=True)
    f2, _ = run_episode(apply_fn, avars, state, pose_src, pose_tgt, cfg,
                        deterministic=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    buf = TrajectoryBuffer(cfg.gamma, cfg.gae_lambda)
    buf.add(traj)
    buf.add(traj)
    samples = buf.samples()
    assert samples["state_2d"].shape[0] == 2 * k * B
    assert samples["returns"].shape == (2 * k * B, 1, 1)
    assert samples["advantage"].shape == (2 * k * B, 1, 1)

    # DAgger scheduled sampling: at beta=1 every taken action is the
    # expert's, so the episode must reproduce the pure expert loop exactly
    final_b, traj_b = run_episode(
        apply_fn, avars, state, pose_src, pose_tgt, cfg,
        deterministic=False, key=jax.random.key(1), with_expert=True,
        collect_trajectory=True, expert_beta=jnp.asarray(1.0))
    np.testing.assert_array_equal(np.asarray(traj_b["action_r"]),
                                  np.asarray(traj_b["expert_action_r"]))
    np.testing.assert_array_equal(np.asarray(traj_b["action_t"]),
                                  np.asarray(traj_b["expert_action_t"]))
    pose = pose_src
    r_steps = jnp.asarray(cfg.r_steps_array())
    t_steps = jnp.asarray(cfg.t_steps_array())
    for _ in range(cfg.action_num):
        ar, at = expert_action(pose, pose_tgt, r_steps, t_steps)
        pose = apply_action(ar, at, pose, r_steps, t_steps)
    np.testing.assert_allclose(np.asarray(final_b), np.asarray(pose),
                               rtol=0, atol=1e-6)
    # beta=0 must equal the no-beta path step for step (same key stream
    # consumption aside): the recorded logprob matches the taken action
    lp = np.asarray(traj_b["action_logprob"])
    assert lp.shape == (k, B, 3) and np.all(lp <= 0)

    # pose-aware episodes: same shapes, and the recorded 3-D observations
    # differ across steps (the static-cloud parity observation repeats the
    # coordinate channels identically every step)
    import dataclasses
    cfg_pa = dataclasses.replace(cfg, pose_aware_observation=True)
    final_pa, traj_pa = run_episode(
        apply_fn, avars, state, pose_src, pose_tgt, cfg_pa,
        deterministic=False, key=jax.random.key(1), with_expert=True,
        collect_trajectory=True)
    assert traj_pa["state_3d"].shape == (k, B, N, 5)
    assert np.isfinite(np.asarray(final_pa)).all()
    coords = np.asarray(traj_pa["state_3d"][..., :3])
    assert np.abs(coords[1] - coords[0]).max() > 1e-4  # pose feedback
    static_coords = np.asarray(traj["state_3d"][..., :3])
    np.testing.assert_array_equal(static_coords[1], static_coords[0])


def test_discounted_and_gae_match_reference_recursion():
    rng = np.random.default_rng(5)
    K = 7
    rewards = rng.normal(size=(K, 1, 1, 1)).astype(np.float32)
    values = rng.normal(size=(K, 1, 1, 1)).astype(np.float32)
    got = np.asarray(discounted_returns(jnp.array(rewards), 0.9)).ravel()
    want = np.zeros(K)
    g = 0.0
    for i in range(K - 1, -1, -1):
        g = rewards.ravel()[i] + 0.9 * g
        want[i] = g
    np.testing.assert_allclose(got, want, rtol=1e-5)

    adv = np.asarray(gae_advantage(jnp.array(rewards), jnp.array(values),
                                   0.99, 0.95)).ravel()
    v = np.concatenate([values.ravel(), [0.0]])
    deltas = rewards.ravel() + 0.99 * v[1:] - v[:-1]
    want = np.zeros(K)
    g = 0.0
    for i in range(K - 1, -1, -1):
        g = deltas[i] + 0.99 * 0.95 * g
        want[i] = g
    np.testing.assert_allclose(adv, want, rtol=1e-4)

    # lambda=0 -> returns - values
    adv0 = np.asarray(gae_advantage(jnp.array(rewards), jnp.array(values),
                                    0.9, 0.0)).ravel()
    rets = np.asarray(discounted_returns(jnp.array(rewards), 0.9)).ravel()
    np.testing.assert_allclose(adv0, rets - values.ravel(), rtol=1e-5)


def test_expert_episode_converges():
    """Driving the environment with the EXPERT's own actions must register
    the cloud: after K steps RTE/RRE collapse. Validates the full loop
    (expert extraction -> discrete step tables -> left-composition ->
    disentangled pose semantics) end-to-end."""
    from cmr_agent_tpu.ops import pose_diff
    cfg = CFG
    rng = np.random.default_rng(7)
    B = 8
    # ground-truth perturbations within the training amplitudes
    yaw = rng.uniform(-np.pi, np.pi, size=B)
    t = np.stack([rng.uniform(-10, 10, B), np.zeros(B),
                  rng.uniform(-10, 10, B)], axis=1).astype(np.float32)
    R = Rotation.from_euler("y", yaw[:, None]).as_matrix().astype(np.float32)
    pose_tgt = jnp.array(np.asarray(make_se3(jnp.array(R), jnp.array(t))))
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))

    r_steps = jnp.array(R_STEPS)
    t_steps = jnp.array(T_STEPS)
    for _ in range(cfg.action_num):
        ar, at = expert_action(pose, pose_tgt, r_steps, t_steps)
        pose = apply_action(ar, at, pose, r_steps, t_steps)

    rte, rre = pose_diff(pose, pose_tgt)
    assert float(jnp.max(rte)) < 0.3, np.asarray(rte)
    assert float(jnp.max(rre)) < 1.0, np.asarray(rre)


def test_compacted_observation_matches_full():
    from cmr_agent_tpu.env.environment import compact_observation_state
    rng = np.random.default_rng(9)
    B, N, F, h, w = 2, 300, 8, 6, 10
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    overlap = rng.random((B, N)) < 0.3
    state = {
        "pc": jnp.array(rng.normal(size=(B, N, 3)) * 2
                        + np.array([0, 0, 6]), jnp.float32),
        "K": jnp.array(np.tile(K, (B, 1, 1))),
        "pc_overlap_pred": jnp.array(overlap),
        "pc_is_in_cam_scores": jnp.array(rng.random((B, N)), jnp.float32),
        "pc_geo_feat": jnp.array(rng.normal(size=(B, N, F)), jnp.float32),
        "img_geo_feat": jnp.array(rng.normal(size=(B, h, w, F)), jnp.float32),
    }
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    pose = pose.at[:, 0, 3].set(0.5)

    want2d, want3d = observation_from_pose(state, pose, h, w)
    # k covering every overlap point -> exact
    k = int(overlap.sum(1).max()) + 5
    compact = compact_observation_state(state, k)
    got2d, got3d = observation_from_pose(compact, pose, h, w)
    np.testing.assert_allclose(np.asarray(got2d), np.asarray(want2d),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got3d), np.asarray(want3d))
    # exact compaction reports zero dropped points
    np.testing.assert_array_equal(np.asarray(compact["raster_dropped"]), 0)

    # k below the overlap count -> the surplus is counted, not silent
    k_small = int(overlap.sum(1).min()) - 3
    assert k_small > 0
    tight = compact_observation_state(state, k_small)
    want_drop = overlap.sum(1).astype(np.int32) - k_small
    np.testing.assert_array_equal(np.asarray(tight["raster_dropped"]),
                                  want_drop)


def test_pack_compacted_observation_matches_topk():
    """mode="pack" (streaming mask-pack kernel, interpret) produces the
    same 2-D observation as the ranked top-k compaction — pack order is
    irrelevant to the raster sum — and the same drop accounting."""
    from cmr_agent_tpu.env.environment import compact_observation_state
    rng = np.random.default_rng(29)
    B, N, F, h, w = 2, 2048, 8, 6, 10
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    overlap = rng.random((B, N)) < 0.3
    state = {
        "pc": jnp.array(rng.normal(size=(B, N, 3)) * 2
                        + np.array([0, 0, 6]), jnp.float32),
        "K": jnp.array(np.tile(K, (B, 1, 1))),
        "pc_overlap_pred": jnp.array(overlap),
        "pc_geo_feat": jnp.array(rng.normal(size=(B, N, F)), jnp.float32),
        "img_geo_feat": jnp.array(rng.normal(size=(B, h, w, F)),
                                  jnp.float32),
    }
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    pose = pose.at[:, 0, 3].set(0.5)

    k = 1024  # >= every overlap count here -> both modes exact
    assert int(overlap.sum(1).max()) <= k
    topk = compact_observation_state(state, k)
    pack = compact_observation_state(state, k, mode="pack", interpret=True)
    assert "raster_pcT" in pack
    np.testing.assert_allclose(np.asarray(pack["raster_pcT"]),
                               np.asarray(jnp.swapaxes(pack["raster_pc"],
                                                       1, 2)))
    o2_topk, o3_topk = observation_from_pose(topk, pose, h, w)
    o2_pack, o3_pack = observation_from_pose(pack, pose, h, w)
    np.testing.assert_allclose(np.asarray(o2_pack), np.asarray(o2_topk),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(o3_pack), np.asarray(o3_topk))
    np.testing.assert_array_equal(np.asarray(pack["raster_dropped"]), 0)
    np.testing.assert_array_equal(
        np.asarray(pack["raster_valid"]).sum(1), overlap.sum(1))

    # off-TPU without interpret: silent fallback to the ranked top-k
    fb = compact_observation_state(state, k, mode="pack")
    np.testing.assert_allclose(np.asarray(fb["raster_pc"]),
                               np.asarray(topk["raster_pc"]))


def test_mega_raster_matches_composable():
    """raster_mode="mega" (projection-fused kernel, interpret) equals the
    composable project->raster path on a compacted valid-first state —
    both layouts, including a nonzero dropped/zero tail that the count
    gate must never read."""
    from cmr_agent_tpu.env.environment import compact_observation_state
    rng = np.random.default_rng(31)
    B, N, F, h, w = 2, 2048, 8, 6, 10
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    overlap = rng.random((B, N)) < 0.25
    state = {
        "pc": jnp.array(rng.normal(size=(B, N, 3)) * 2
                        + np.array([0, 0, 6]), jnp.float32),
        "K": jnp.array(np.tile(K, (B, 1, 1))),
        "pc_overlap_pred": jnp.array(overlap),
        "pc_geo_feat": jnp.array(rng.normal(size=(B, N, F)), jnp.float32),
        "img_geo_feat": jnp.array(rng.normal(size=(B, h, w, F)),
                                  jnp.float32),
    }
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    pose = pose.at[:, 0, 3].set(0.5)
    pose = pose.at[:, 2, 3].set(-0.3)

    compact = compact_observation_state(state, 1024, mode="pack",
                                        interpret=True)
    want2d, want3d = observation_from_pose(compact, pose, h, w)
    got2d, got3d = observation_from_pose(compact, pose, h, w,
                                         raster_mode="mega",
                                         raster_interpret=True)
    np.testing.assert_allclose(np.asarray(got2d), np.asarray(want2d),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got3d), np.asarray(want3d))

    # channel-major (fused-eval) layout drives the same mega kernel
    cn = dict(compact)
    cn["pcT"] = jnp.swapaxes(cn["pc"], 1, 2)
    wc2d, wc3d = observation_from_pose(cn, pose, h, w, obs3d_layout="cn")
    gc2d, gc3d = observation_from_pose(cn, pose, h, w, obs3d_layout="cn",
                                       raster_mode="mega",
                                       raster_interpret=True)
    np.testing.assert_allclose(np.asarray(gc2d), np.asarray(wc2d),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc3d), np.asarray(wc3d))

    # behind-camera points (z < 0 after the pose) must be frustum-dropped
    # identically, and the bf16 kernel dtype must match the composable
    # bf16 raster within bf16 input rounding
    flipped = dict(compact)
    flipped["pc"] = compact["pc"].at[:, :, 2].multiply(-1.0)
    fpcT = jnp.swapaxes(flipped["raster_pc"], 1, 2
                        ).at[:, 2, :].multiply(-1.0)
    flipped["raster_pc"] = jnp.swapaxes(fpcT, 1, 2)
    flipped["raster_pcT"] = fpcT
    wf2d, _ = observation_from_pose(flipped, pose, h, w)
    gf2d, _ = observation_from_pose(flipped, pose, h, w,
                                    raster_mode="mega",
                                    raster_interpret=True)
    np.testing.assert_allclose(np.asarray(gf2d), np.asarray(wf2d),
                               atol=2e-5)

    w16, _ = observation_from_pose(compact, pose, h, w,
                                   raster_dtype=jnp.bfloat16)
    g16, _ = observation_from_pose(compact, pose, h, w,
                                   raster_dtype=jnp.bfloat16,
                                   raster_mode="mega",
                                   raster_interpret=True)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(w16),
                               rtol=2e-2, atol=2e-2)


def test_mega_raster_int8_and_tile_fallback():
    """Round-5 additions to the mega raster: (a) int8 runs INSIDE the
    fused kernel (per-(sample, channel) absmax quantisation, exact int32
    count accumulation) within the one-input-quantisation error of the
    exact raster; (b) a compaction K that is not a multiple of the 512
    tile silently takes the composable pre-compacted path instead of
    raising at trace time (ADVICE r4 medium: raster_topk is a tunable)."""
    from cmr_agent_tpu.env.environment import compact_observation_state
    rng = np.random.default_rng(32)
    B, N, F, h, w = 2, 2048, 8, 6, 10
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    overlap = rng.random((B, N)) < 0.25
    state = {
        "pc": jnp.array(rng.normal(size=(B, N, 3)) * 2
                        + np.array([0, 0, 6]), jnp.float32),
        "K": jnp.array(np.tile(K, (B, 1, 1))),
        "pc_overlap_pred": jnp.array(overlap),
        "pc_geo_feat": jnp.array(rng.normal(size=(B, N, F)), jnp.float32),
        "img_geo_feat": jnp.array(rng.normal(size=(B, h, w, F)),
                                  jnp.float32),
    }
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    pose = pose.at[:, 0, 3].set(0.5)

    compact = compact_observation_state(state, 1024)
    exact2d, _ = observation_from_pose(compact, pose, h, w)
    q2d, _ = observation_from_pose(compact, pose, h, w,
                                   raster_dtype=jnp.int8,
                                   raster_mode="mega",
                                   raster_interpret=True)
    # error bound: one symmetric absmax quantisation of the features
    # (<= absmax/254 per element, means are convex combinations)
    bound = np.abs(np.asarray(compact["raster_feat"])).max() / 254 + 1e-6
    np.testing.assert_allclose(np.asarray(q2d), np.asarray(exact2d),
                               atol=float(bound))
    # counts stay exact: pixels with no point (exact raster all-zero
    # across channels) are exactly zero in int8 too (a small NONZERO
    # feature may still quantise to zero, so only this direction holds)
    raster = np.asarray(q2d)[..., F:]
    want_raster = np.asarray(exact2d)[..., F:]
    empty = (want_raster == 0.0).all(axis=-1)
    np.testing.assert_array_equal(raster[empty], 0.0)

    # K=1000 is not 512-divisible: mega must fall back, not raise
    odd = compact_observation_state(state, 1000)
    wf2d, wf3d = observation_from_pose(odd, pose, h, w)
    gf2d, gf3d = observation_from_pose(odd, pose, h, w,
                                       raster_mode="mega",
                                       raster_interpret=True)
    np.testing.assert_allclose(np.asarray(gf2d), np.asarray(wf2d))
    np.testing.assert_allclose(np.asarray(gf3d), np.asarray(wf3d))


def test_obs3d_compact_semantics():
    """obs3d_compact (Config.obs3d_source="compact"): the 3-D observation
    shrinks to the compacted K rows; valid rows are exactly the overlap
    subset of the full observation (same moved positions / flags, topk
    order) and the bearing channels are EXACT vs full-cloud whenever
    dropped == 0 (the compaction keeps every overlap point)."""
    from cmr_agent_tpu.env.environment import compact_observation_state
    rng = np.random.default_rng(33)
    B, N, F, h, w = 2, 1024, 4, 6, 10
    Kc = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    overlap = rng.random((B, N)) < 0.3
    state = {
        "pc": jnp.array(rng.normal(size=(B, N, 3)) * 2
                        + np.array([0, 0, 6]), jnp.float32),
        "K": jnp.array(np.tile(Kc, (B, 1, 1))),
        "pc_overlap_pred": jnp.array(overlap),
        "pc_is_in_cam_scores": jnp.array(rng.uniform(size=(B, N)),
                                         jnp.float32),
        "pc_geo_feat": jnp.array(rng.normal(size=(B, N, F)), jnp.float32),
        "img_geo_feat": jnp.array(rng.normal(size=(B, h, w, F)),
                                  jnp.float32),
    }
    pose = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    pose = pose.at[:, 0, 3].set(0.4)
    k = 512
    assert int(overlap.sum(1).max()) <= k
    compact = compact_observation_state(state, k)

    o2_full, o3_full = observation_from_pose(
        compact, pose, h, w, pose_aware=True, bearing_channels=True)
    o2_c, o3_c = observation_from_pose(
        compact, pose, h, w, pose_aware=True, bearing_channels=True,
        obs3d_compact=True)
    # 2-D observation identical; 3-D shrinks to K rows
    np.testing.assert_allclose(np.asarray(o2_c), np.asarray(o2_full))
    assert o3_c.shape == (B, k, 7) and o3_full.shape == (B, N, 7)
    # bearing channels exact (dropped == 0 -> same overlap centroid)
    np.testing.assert_allclose(np.asarray(o3_c[..., 5:]),
                               np.asarray(o3_full[:, :1, 5:]
                                          * np.ones((1, k, 1))), atol=1e-6)
    # valid rows of the compacted obs == the overlap subset of the full
    # obs: same moved positions and flags, matched per point
    full = np.asarray(o3_full)
    comp = np.asarray(o3_c)
    for bi in range(B):
        sel_full = full[bi][full[bi, :, 3] > 0.5]     # overlap rows
        sel_comp = comp[bi][comp[bi, :, 3] > 0.5]
        assert sel_full.shape == sel_comp.shape
        order_f = np.lexsort(sel_full[:, :3].T)
        order_c = np.lexsort(sel_comp[:, :3].T)
        np.testing.assert_allclose(sel_comp[order_c], sel_full[order_f],
                                   atol=1e-5)

    # channel-major layout agrees with the row-major one
    cn = dict(compact)
    cn["pcT"] = jnp.swapaxes(cn["pc"], 1, 2)
    _, o3_cn = observation_from_pose(
        cn, pose, h, w, pose_aware=True, bearing_channels=True,
        obs3d_layout="cn", obs3d_compact=True)
    assert o3_cn.shape == (B, 7, k)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(o3_cn, 1, 2)),
                               comp, atol=1e-5)


def test_expert_and_step_6dof():
    """is_6_DoF branch: 3 rotation + 3 translation actions
    (reference environment.py:172-175,189-194)."""
    rng = np.random.default_rng(11)
    B = 4
    angles = rng.uniform(-0.4, 0.4, size=(B, 3))
    R = Rotation.from_euler("xyz", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-5, 5, size=(B, 3)).astype(np.float32)
    tgt = jnp.array(np.asarray(make_se3(jnp.array(R), jnp.array(t))))
    src = jnp.array(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))

    ar, at = expert_action(src, tgt, jnp.array(R_STEPS), jnp.array(T_STEPS),
                           is_6_dof=True)
    assert ar.shape == (B, 3) and at.shape == (B, 3)
    # expert targets the full euler triple
    want_r = np.abs(angles[:, :, None] - R_STEPS[None, None]).argmin(2)
    # euler extraction of R may differ from input angles only at branch
    # cuts; these angles are small so they match
    np.testing.assert_array_equal(np.asarray(ar), want_r)

    pose = apply_action(ar, at, src, jnp.array(R_STEPS), jnp.array(T_STEPS),
                        is_6_dof=True)
    # rotation applied is Rx@Ry@Rz of the chosen steps
    steps_r = R_STEPS[np.asarray(ar)]
    from cmr_agent_tpu.ops import euler_angles_to_matrix_xyz
    want_R = np.asarray(euler_angles_to_matrix_xyz(jnp.array(steps_r)))
    np.testing.assert_allclose(np.asarray(pose[:, :3, :3]), want_R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pose[:, :3, 3]),
                               T_STEPS[np.asarray(at)], atol=1e-6)


def test_agent_6dof_heads():
    cfg6 = tiny_config(is_6_dof=True)
    rng = np.random.default_rng(12)
    s2d = jnp.array(rng.normal(size=(2, cfg6.image_h, cfg6.image_w,
                                     2 * cfg6.embed_dim)), jnp.float32)
    s3d = jnp.array(rng.normal(size=(2, cfg6.num_pt, 5)), jnp.float32)
    agent = CMRAgent(cfg6)
    v = agent.init(jax.random.key(0), s2d, s3d, train=False)
    r, t, val = agent.apply(v, s2d, s3d, train=False)
    assert r.shape == (2, 3, 11) and t.shape == (2, 3, 11)
