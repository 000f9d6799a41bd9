"""PointNet++ capability surface.

The reference carries the classic PointNet++ toolbox
(models/pointnet_util.py:96-308: sample_and_group(_all),
PointNetSetAbstraction(Msg), PointNetFeaturePropagation) as capability for
alternative point backbones even though only ``square_distance`` /
``index_points`` sit on the live path. Rebuilt here channels-last with the
device-side FPS/ball-query from :mod:`cmr_agent_tpu.ops.sampling`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import (farthest_point_sample, index_points,
                            query_ball_point)
from .layers import BatchNorm, torch_kernel_init


def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jnp.ndarray, points: jnp.ndarray | None):
    """FPS ``npoint`` centres, ball-query ``nsample`` neighbours, centre-relative
    coords, optional feature concat (reference pointnet_util.py:96-128).

    Returns ``(new_xyz [B,S,3], new_points [B,S,nsample,3(+D)])``.
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, index_points(points, idx)],
                                  axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def sample_and_group_all(xyz: jnp.ndarray, points: jnp.ndarray | None):
    """Single group covering the whole cloud (pointnet_util.py:131-153)."""
    b = xyz.shape[0]
    new_xyz = jnp.zeros((b, 1, 3), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, points[:, None, :, :]],
                                  axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


class _GroupMLP(nn.Module):
    """Shared Dense-BN-ReLU stack applied per grouped point."""

    widths: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool):
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, kernel_init=torch_kernel_init, name=f"mlp_{i}")(x)
            x = BatchNorm(name=f"bn_{i}")(x, train)
            x = nn.relu(x)
        return x


class PointNetSetAbstraction(nn.Module):
    """SA layer: group -> shared MLP -> max (pointnet_util.py:156-199)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points)
        feat = _GroupMLP(self.mlp)(grouped, train)
        return new_xyz, jnp.max(feat, axis=2)


class PointNetSetAbstractionMsg(nn.Module):
    """Multi-scale-grouping SA layer (pointnet_util.py:202-254)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        feats = []
        for i, (radius, nsample) in enumerate(
                zip(self.radius_list, self.nsample_list)):
            idx = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, index_points(points, idx)], axis=-1)
            else:
                grouped = grouped_xyz
            feat = _GroupMLP(self.mlp_list[i], name=f"scale_{i}")(grouped, train)
            feats.append(jnp.max(feat, axis=2))
        return new_xyz, jnp.concatenate(feats, axis=-1)


class PointNetFeaturePropagation(nn.Module):
    """3-NN inverse-distance feature interpolation + MLP
    (pointnet_util.py:258-308).
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        n, s = xyz1.shape[1], xyz2.shape[1]
        if s == 1:
            interpolated = jnp.broadcast_to(
                points2, (points2.shape[0], n, points2.shape[-1]))
        else:
            d = jnp.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, -1)
            d_sorted = jnp.sort(d, axis=-1)[:, :, :3]
            idx = jnp.argsort(d, axis=-1)[:, :, :3]
            w = 1.0 / (d_sorted + 1e-8)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            interpolated = jnp.sum(
                index_points(points2, idx) * w[..., None], axis=2)
        if points1 is not None:
            x = jnp.concatenate([points1, interpolated], axis=-1)
        else:
            x = interpolated
        return _GroupMLP(self.mlp)(x, train)
