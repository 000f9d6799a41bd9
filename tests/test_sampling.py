"""Sampling-op tests against numpy / scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree

from cmr_agent_tpu.ops import (
    farthest_point_sample, nearest_assign, knn_indices, square_distance,
    index_points, query_ball_point, random_downsample_indices,
)


def _np_fps(pts, k, init_idx):
    """Reference FPS (dataset/KittiDataset.py:107-126) in numpy, [N,3] input."""
    idxs = np.zeros(k, dtype=np.int64)
    idxs[0] = init_idx
    d = ((pts - pts[init_idx]) ** 2).sum(axis=1)
    for i in range(1, k):
        far = int(np.argmax(d))
        idxs[i] = far
        d = np.minimum(d, ((pts - pts[far]) ** 2).sum(axis=1))
    return idxs


def test_fps_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    want = _np_fps(pts, 32, init_idx=7)
    got = np.asarray(farthest_point_sample(jnp.array(pts), 32, init_idx=7))
    np.testing.assert_array_equal(got, want)


def test_fps_batched_and_random_init():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3, 200, 3)).astype(np.float32)
    idx = farthest_point_sample(jnp.array(pts), 16, key=jax.random.key(0))
    assert idx.shape == (3, 16)
    # sampled points should be distinct
    for b in range(3):
        assert len(set(np.asarray(idx[b]).tolist())) == 16


def test_nearest_assign_matches_ckdtree():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    centers = rng.normal(size=(64, 3)).astype(np.float32)
    _, want = cKDTree(centers).query(pts, k=1)
    got = np.asarray(nearest_assign(jnp.array(pts), jnp.array(centers)))
    # ties can break either way; verify distances equal instead of indices
    d_got = ((pts - centers[got]) ** 2).sum(axis=1)
    d_want = ((pts - centers[want]) ** 2).sum(axis=1)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-5)
    assert (got == want).mean() > 0.999


def test_knn_matches_argsort():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(2, 128, 3)).astype(np.float32)
    got = np.asarray(knn_indices(jnp.array(xyz), jnp.array(xyz), k=8))
    d = np.asarray(square_distance(jnp.array(xyz), jnp.array(xyz)))
    want = np.argsort(d, axis=-1)[:, :, :8]
    # compare as sets per row (tie order may differ)
    for b in range(2):
        for i in range(128):
            assert set(got[b, i]) == set(want[b, i])


def test_index_points():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(2, 50, 5)).astype(np.float32)
    idx = rng.integers(0, 50, size=(2, 7, 3))
    got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], pts[b][idx[b]])


def test_query_ball_point_semantics():
    # Oracle: reference models/pointnet_util.py:73-93 transcribed to numpy.
    rng = np.random.default_rng(5)
    xyz = rng.uniform(-1, 1, size=(1, 100, 3)).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, size=(1, 10, 3)).astype(np.float32)
    radius, nsample = 0.7, 12
    d = ((new_xyz[0][:, None, :] - xyz[0][None, :, :]) ** 2).sum(-1)
    want = np.tile(np.arange(100), (10, 1))
    want[d > radius**2] = 100
    want = np.sort(want, axis=-1)[:, :nsample]
    first = np.tile(want[:, :1], (1, nsample))
    want[want == 100] = first[want == 100]
    got = np.asarray(query_ball_point(radius, nsample,
                                      jnp.array(xyz), jnp.array(new_xyz)))[0]
    np.testing.assert_array_equal(got, want)


def test_random_downsample_indices():
    idx = np.asarray(random_downsample_indices(jax.random.key(0), 100, 40))
    assert idx.shape == (40,) and len(set(idx.tolist())) == 40
    idx = np.asarray(random_downsample_indices(jax.random.key(0), 30, 100))
    assert idx.shape == (100,)
    counts = np.bincount(idx, minlength=30)
    assert counts.min() >= 3  # every point repeated whole number of times
