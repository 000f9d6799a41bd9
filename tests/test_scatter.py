"""Segment-op tests against numpy oracles lifted from the reference formulas."""

import numpy as np
import jax.numpy as jnp

from cmr_agent_tpu.ops import (
    segment_sum, segment_max, segment_mean, segment_softmax_attend,
    batched_segment_softmax_attend, scatter_mean_image,
)


def _np_segment(op, data, ids, m, fill=0.0):
    out = np.full((m,) + data.shape[1:], fill, dtype=np.float64)
    touched = np.zeros(m, bool)
    for i, s in enumerate(ids):
        if op == "sum":
            out[s] += data[i]
        elif op == "max":
            out[s] = np.maximum(out[s], data[i]) if touched[s] else data[i]
        touched[s] = True
    return out, touched


def test_segment_sum_matches_loop_both_paths():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(5000, 16)).astype(np.float32)
    ids = rng.integers(0, 33, size=5000)
    want, _ = _np_segment("sum", data, ids, 33)
    for via in ("scatter", "matmul"):
        got = segment_sum(jnp.array(data), jnp.array(ids), 33, via=via)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_segment_max_and_mean():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(300, 8)).astype(np.float32)
    ids = rng.integers(0, 10, size=300)
    want_max, touched = _np_segment("max", data, ids, 12)
    got_max = np.asarray(segment_max(jnp.array(data), jnp.array(ids), 12))
    np.testing.assert_allclose(got_max[touched[:12]], want_max[touched[:12]], rtol=1e-6)

    want_sum, _ = _np_segment("sum", data, ids, 12)
    counts = np.bincount(ids, minlength=12).astype(np.float64)
    want_mean = want_sum / np.maximum(counts, 1)[:, None]
    got_mean = np.asarray(segment_mean(jnp.array(data), jnp.array(ids), 12))
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5, atol=1e-6)


def _np_group_softmax_attend(attn, values, ids, m):
    """The reference algorithm (models/PointNN.py:167-182) in numpy."""
    out = np.zeros((m, attn.shape[1]))
    for g in range(m):
        rows = ids == g
        if not rows.any():
            continue
        a = attn[rows]
        a = np.exp(a - a.max(axis=0, keepdims=True))
        a = a / a.sum(axis=0, keepdims=True)
        out[g] = (a * values[rows]).sum(axis=0)
    return out


def test_segment_softmax_attend_oracle():
    rng = np.random.default_rng(2)
    attn = rng.normal(size=(400, 6)).astype(np.float32) * 5
    values = rng.normal(size=(400, 6)).astype(np.float32)
    ids = rng.integers(0, 17, size=400)  # some of 20 segments empty
    want = _np_group_softmax_attend(attn, values, ids, 20)
    got = np.asarray(segment_softmax_attend(
        jnp.array(attn), jnp.array(values), jnp.array(ids), 20))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batched_segment_softmax_attend():
    rng = np.random.default_rng(3)
    attn = rng.normal(size=(2, 100, 4)).astype(np.float32)
    values = rng.normal(size=(2, 100, 4)).astype(np.float32)
    ids = rng.integers(0, 7, size=(2, 100))
    got = np.asarray(batched_segment_softmax_attend(
        jnp.array(attn), jnp.array(values), jnp.array(ids), 7))
    for b in range(2):
        want = _np_group_softmax_attend(attn[b], values[b], ids[b], 7)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_scatter_mean_image_pad_bucket():
    rng = np.random.default_rng(4)
    h, w, f = 4, 6, 3
    feat = rng.normal(size=(1, 50, f)).astype(np.float32)
    ids = rng.integers(0, h * w, size=(1, 50))
    valid = rng.random((1, 50)) > 0.3
    img = np.asarray(scatter_mean_image(
        jnp.array(feat), jnp.array(ids), jnp.array(valid), h, w)).reshape(h * w, f)
    for p in range(h * w):
        rows = (ids[0] == p) & valid[0]
        want = feat[0][rows].mean(axis=0) if rows.any() else np.zeros(f)
        np.testing.assert_allclose(img[p], want, rtol=1e-5, atol=1e-6)
