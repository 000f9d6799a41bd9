"""SE(3), euler-angle and camera-projection ops.

Replaces the reference's host-side ``scipy.spatial.transform.Rotation``
round-trips (environment/environment.py:151-160, Test_Agent.py:99-105) with
closed-form JAX so the whole registration episode stays on device.

Euler conventions used by the reference (all reproduced here):

* ``'xyz'`` extrinsic (scipy lowercase) — expert action extraction
  (environment/environment.py:152) and the transforms3d-style
  ``angle2matrix`` (models/IterModel.py:95-130, Test_Agent.py:37-71).
  ``R = Rz(az) @ Ry(ay) @ Rx(ax)``.
* ``'XYZ'`` intrinsic (scipy uppercase) — RRE evaluation metric
  (Test_Agent.py:99-105). ``R = Rx(ax) @ Ry(ay) @ Rz(az)``.
* torch-style ``euler_angles_to_matrix(.., 'XYZ')`` — environment step
  (environment/environment.py:210-232), which composes ``Rx @ Ry @ Rz``
  (same matrix as intrinsic XYZ).
"""

from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------------------
# Axis rotations
# --------------------------------------------------------------------------

def axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about a named axis; ``angle`` of any shape -> (..., 3, 3).

    Matches the reference's ``_axis_angle_rotation``
    (environment/environment.py:235-260).
    """
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis!r}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix_xyz(euler: jnp.ndarray) -> jnp.ndarray:
    """torch-convention ``euler_angles_to_matrix(e, 'XYZ')``: Rx @ Ry @ Rz.

    Args: euler (..., 3) radians. Returns (..., 3, 3).
    """
    rx = axis_angle_rotation("X", euler[..., 0])
    ry = axis_angle_rotation("Y", euler[..., 1])
    rz = axis_angle_rotation("Z", euler[..., 2])
    return rx @ ry @ rz


def euler_xyz_extrinsic_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic-xyz euler -> matrix: Rz(az) @ Ry(ay) @ Rx(ax).

    Equals scipy ``Rotation.from_euler('xyz', e).as_matrix()`` and the
    reference's transforms3d-style ``angle2matrix`` (IterModel.py:95-130).
    """
    rx = axis_angle_rotation("X", euler[..., 0])
    ry = axis_angle_rotation("Y", euler[..., 1])
    rz = axis_angle_rotation("Z", euler[..., 2])
    return rz @ ry @ rx


# transforms3d 'sxyz' == extrinsic xyz.
angle2matrix_sxyz = euler_xyz_extrinsic_to_matrix


def matrix_to_euler_xyz_extrinsic(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix -> extrinsic-xyz euler angles (scipy ``as_euler('xyz')``).

    For ``R = Rz Ry Rx``: ``ay = asin(-R[2,0])``, ``ax = atan2(R[2,1],
    R[2,2])``, ``az = atan2(R[1,0], R[0,0])``. Near gimbal lock
    (|R[2,0]| ~ 1) falls back to ``ax = 0`` with ``az`` absorbing the spin,
    matching scipy's convention of zeroing the first angle.

    Args: R (..., 3, 3). Returns (..., 3) radians in [-pi, pi].
    """
    r20 = jnp.clip(R[..., 2, 0], -1.0, 1.0)
    ay = -jnp.arcsin(r20)
    cy = jnp.cos(ay)
    eps = 1e-7
    locked = jnp.abs(cy) < eps

    ax_reg = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    az_reg = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    # Gimbal: cy=0 -> R[0,1] = -sz*cx + cz*sy*sx, ... set ax=0:
    ax_lock = jnp.zeros_like(ax_reg)
    az_lock = jnp.arctan2(-R[..., 0, 1], R[..., 1, 1])

    ax = jnp.where(locked, ax_lock, ax_reg)
    az = jnp.where(locked, az_lock, az_reg)
    return jnp.stack([ax, ay, az], axis=-1)


def matrix_to_euler_intrinsic_xyz_degrees(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix -> intrinsic-XYZ euler in degrees (scipy ``as_euler('XYZ', degrees=True)``).

    For ``R = Rx Ry Rz``: ``ay = asin(R[0,2])``, ``ax = atan2(-R[1,2],
    R[2,2])``, ``az = atan2(-R[0,1], R[0,0])``.
    """
    r02 = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    ay = jnp.arcsin(r02)
    cy = jnp.cos(ay)
    eps = 1e-7
    locked = jnp.abs(cy) < eps

    ax_reg = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    az_reg = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    ax_lock = jnp.arctan2(R[..., 2, 1], R[..., 1, 1])
    az_lock = jnp.zeros_like(az_reg)

    ax = jnp.where(locked, ax_lock, ax_reg)
    az = jnp.where(locked, az_lock, az_reg)
    return jnp.degrees(jnp.stack([ax, ay, az], axis=-1))


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------

def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous transform."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform (no linalg.inv)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(pc: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply ``R @ p + t`` to points ``[..., N, 3]``."""
    return jnp.einsum("...ij,...nj->...ni", R, pc) + t[..., None, :]


def transform_points_disentangled(pc: jnp.ndarray, R: jnp.ndarray,
                                  t: jnp.ndarray) -> jnp.ndarray:
    """Disentangled transform: rotate about the cloud centroid, then translate.

    ``p' = R (p - mean) + mean + t`` — the transform applied throughout the
    episode (reference environment/environment.py:52-56, 91-93).
    """
    mean = pc.mean(axis=-2, keepdims=True)
    return jnp.einsum("...ij,...nj->...ni", R, pc - mean) + mean + t[..., None, :]


def to_disentangled(pose: jnp.ndarray, pc: jnp.ndarray) -> jnp.ndarray:
    """Fold rotation-about-centroid into the translation (paper eq. 11).

    ``t' = t - mean + R @ mean`` (reference environment/environment.py:14-21),
    so that applying ``pose`` disentangled equals applying the original pose
    entangled.

    Args:
      pose: ``[..., 4, 4]``.
      pc:   ``[..., N, 3]`` the cloud whose centroid disentangles the pose.
    """
    mean = pc.mean(axis=-2)
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    t_new = t - mean + jnp.einsum("...ij,...j->...i", R, mean)
    return pose.at[..., :3, 3].set(t_new)


# --------------------------------------------------------------------------
# Camera projection
# --------------------------------------------------------------------------

def project_points(pc: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection: ``[..., N, 3] x [..., 3, 3] -> [..., N, 3]``.

    Returns ``(x/z, y/z, z)`` — pixel coords and depth. z<=0 points produce
    garbage xy; always combine with :func:`frustum_mask`.
    """
    proj = jnp.einsum("...ij,...nj->...ni", K, pc)
    z = proj[..., 2:3]
    xy = proj[..., 0:2] / jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    return jnp.concatenate([xy, proj[..., 2:3]], axis=-1)


def frustum_mask(xyz: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """In-image test on projected ``(x, y, z)``.

    Matches the reference's bound test on *unrounded* coords with inclusive
    ``[0, W-1] x [0, H-1]`` and ``z > 0``
    (environment/environment.py:61-65).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return (x >= 0) & (x <= (w - 1)) & (y >= 0) & (y <= (h - 1)) & (z > 0)


def project_points_cn(pcT: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Channel-major :func:`project_points`: ``[B, 3, N] -> [B, 3, N]``.

    Identical math with the point axis on the LANES: XLA pads the
    minormost dim to 128 lanes, so the row-major ``[B, N, 3]`` projection
    intermediates physically occupy ~43x their logical bytes when they
    must materialise (e.g. feeding a Pallas kernel); the transposed
    layout streams at the true roofline.
    """
    proj = jnp.einsum("bij,bjn->bin", K, pcT)
    z = proj[:, 2:3]
    xy = proj[:, 0:2] / jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    return jnp.concatenate([xy, proj[:, 2:3]], axis=1)


def frustum_mask_cn(projT: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """:func:`frustum_mask` on channel-major ``[B, 3, N]`` -> ``[B, N]``."""
    x, y, z = projT[:, 0], projT[:, 1], projT[:, 2]
    return (x >= 0) & (x <= (w - 1)) & (y >= 0) & (y <= (h - 1)) & (z > 0)


def pose_diff(P_pred: jnp.ndarray, P_gt: jnp.ndarray):
    """(RTE, RRE) evaluation metric.

    RRE = sum of |intrinsic-XYZ euler angles| of ``R_pred @ R_gt^T`` in
    degrees; RTE = L2 of the translation difference — the reference's
    ``get_P_diff`` (Test_Agent.py:99-105).
    """
    r_rel = P_pred[..., :3, :3] @ jnp.swapaxes(P_gt[..., :3, :3], -1, -2)
    angles = matrix_to_euler_intrinsic_xyz_degrees(r_rel)
    rre = jnp.sum(jnp.abs(angles), axis=-1)
    rte = jnp.linalg.norm(P_pred[..., :3, 3] - P_gt[..., :3, 3], axis=-1)
    return rte, rre
