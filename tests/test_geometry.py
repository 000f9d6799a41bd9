"""Geometry op tests against scipy.spatial.transform.Rotation oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from cmr_agent_tpu.ops import (
    axis_angle_rotation, euler_angles_to_matrix_xyz,
    euler_xyz_extrinsic_to_matrix, matrix_to_euler_xyz_extrinsic,
    matrix_to_euler_intrinsic_xyz_degrees, make_se3, se3_inverse,
    transform_points, transform_points_disentangled, to_disentangled,
    project_points, frustum_mask, pose_diff,
)


def _rand_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    return Rotation.random(n, random_state=int(rng.integers(1 << 30))).as_matrix()


def test_euler_xyz_extrinsic_roundtrip_vs_scipy():
    rng = np.random.default_rng(0)
    eul = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
    want = Rotation.from_euler("xyz", eul).as_matrix()
    got = np.asarray(euler_xyz_extrinsic_to_matrix(jnp.array(eul)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    R = _rand_rotations(64)
    want_e = Rotation.from_matrix(R).as_euler("xyz")
    got_e = np.asarray(matrix_to_euler_xyz_extrinsic(jnp.array(R, dtype=jnp.float32)))
    np.testing.assert_allclose(got_e, want_e, atol=1e-4)


def test_euler_intrinsic_xyz_degrees_vs_scipy():
    R = _rand_rotations(64, seed=1)
    want = Rotation.from_matrix(R).as_euler("XYZ", degrees=True)
    got = np.asarray(matrix_to_euler_intrinsic_xyz_degrees(
        jnp.array(R, dtype=jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_torch_style_euler_angles_to_matrix():
    # Rx @ Ry @ Rz composition (environment/environment.py:210-232) equals
    # scipy intrinsic XYZ.
    rng = np.random.default_rng(2)
    eul = rng.uniform(-np.pi, np.pi, size=(32, 3)).astype(np.float32)
    want = Rotation.from_euler("XYZ", eul).as_matrix()
    got = np.asarray(euler_angles_to_matrix_xyz(jnp.array(eul)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axis_rotation_y():
    a = jnp.array([0.3])
    R = np.asarray(axis_angle_rotation("Y", a))[0]
    c, s = np.cos(0.3), np.sin(0.3)
    np.testing.assert_allclose(R, [[c, 0, s], [0, 1, 0], [-s, 0, c]], atol=1e-6)


def test_se3_inverse_and_transform():
    R = _rand_rotations(4, seed=3).astype(np.float32)
    t = np.random.default_rng(3).normal(size=(4, 3)).astype(np.float32)
    T = make_se3(jnp.array(R), jnp.array(t))
    TT = np.asarray(T @ se3_inverse(T))
    np.testing.assert_allclose(TT, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)

    pc = np.random.default_rng(4).normal(size=(4, 100, 3)).astype(np.float32)
    got = np.asarray(transform_points(jnp.array(pc), jnp.array(R), jnp.array(t)))
    want = np.einsum("bij,bnj->bni", R, pc) + t[:, None, :]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_disentangled_equivalence():
    # to_disentangled(pose) applied disentangled == original pose applied plain
    # (paper eq. 11; environment/environment.py:14-21,52-56).
    rng = np.random.default_rng(5)
    R = _rand_rotations(2, seed=5).astype(np.float32)
    t = rng.normal(size=(2, 3)).astype(np.float32)
    pc = rng.normal(size=(2, 64, 3)).astype(np.float32)
    pose = make_se3(jnp.array(R), jnp.array(t))
    pose_d = to_disentangled(pose, jnp.array(pc))
    plain = np.einsum("bij,bnj->bni", R, pc) + t[:, None, :]
    disent = np.asarray(transform_points_disentangled(
        jnp.array(pc), pose_d[:, :3, :3], pose_d[:, :3, 3]))
    np.testing.assert_allclose(disent, plain, atol=1e-4)

    # ...and the inverse (entangle): t_abs = t + mu - R mu turns a
    # disentangled (R, t) into the equivalent plain SE(3) — the math
    # export_composed_pipeline uses to return an absolute pose
    mu = pc.mean(axis=1)
    t_d = np.asarray(pose_d[:, :3, 3])
    t_abs = t_d + mu - np.einsum("bij,bj->bi", R, mu)
    plain_back = np.einsum("bij,bnj->bni", R, pc) + t_abs[:, None, :]
    np.testing.assert_allclose(plain_back, disent, atol=1e-4)


def test_projection_and_frustum():
    K = jnp.array([[[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]]])
    pc = jnp.array([[[0.0, 0.0, 10.0],     # centre, visible
                     [10.0, 0.0, 10.0],    # off right edge
                     [0.0, 0.0, -5.0]]])   # behind camera
    xyz = project_points(pc, K)
    np.testing.assert_allclose(np.asarray(xyz[0, 0]), [32, 16, 10], atol=1e-4)
    mask = np.asarray(frustum_mask(xyz, w=64, h=32))
    assert mask.tolist() == [[True, False, False]]


def test_pose_diff_matches_reference_metric():
    R1 = _rand_rotations(8, seed=6).astype(np.float32)
    R2 = _rand_rotations(8, seed=7).astype(np.float32)
    t1 = np.random.default_rng(8).normal(size=(8, 3)).astype(np.float32)
    t2 = np.random.default_rng(9).normal(size=(8, 3)).astype(np.float32)
    P1 = np.asarray(make_se3(jnp.array(R1), jnp.array(t1)))
    P2 = np.asarray(make_se3(jnp.array(R2), jnp.array(t2)))
    rte, rre = pose_diff(jnp.array(P1), jnp.array(P2))
    for b in range(8):
        r_diff = R1[b] @ R2[b].T
        want_rre = np.sum(np.abs(
            Rotation.from_matrix(r_diff).as_euler("XYZ", degrees=True)))
        want_rte = np.linalg.norm(t1[b] - t2[b])
        np.testing.assert_allclose(float(rre[b]), want_rre, atol=1e-2)
        np.testing.assert_allclose(float(rte[b]), want_rte, atol=1e-5)
