"""Fused segmented-softmax kernel: parity + gradients vs the XLA path.

Runs in Pallas interpret mode on CPU; the same kernel compiles on TPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmr_agent_tpu.ops.scatter import batched_segment_softmax_attend
from cmr_agent_tpu.ops.pallas_kernels import segment_softmax_attend_fused


def _data(b=2, n=600, f=8, m=37, seed=0):
    rng = np.random.default_rng(seed)
    attn = jnp.array(rng.normal(size=(b, n, f)) * 3, jnp.float32)
    values = jnp.array(rng.normal(size=(b, n, f)), jnp.float32)
    idx = jnp.array(rng.integers(0, m, size=(b, n)), jnp.int32)
    return attn, values, idx, m


def test_fused_forward_matches_xla():
    attn, values, idx, m = _data()
    want = batched_segment_softmax_attend(attn, values, idx, m)
    got = segment_softmax_attend_fused(attn, values, idx, m, 256, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_forward_ragged_tiles_and_exact_m():
    # n not a multiple of tile AND m a multiple of 8 (no spare pad row)
    attn, values, idx, m = _data(b=1, n=500, f=8, m=16, seed=1)
    want = batched_segment_softmax_attend(attn, values, idx, m)
    got = segment_softmax_attend_fused(attn, values, idx, m, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_xla():
    attn, values, idx, m = _data(b=1, n=256, f=4, m=9, seed=2)

    def loss_xla(a, v):
        out = batched_segment_softmax_attend(a, v, idx, m)
        return jnp.sum(out * jnp.cos(out))

    def loss_fused(a, v):
        out = segment_softmax_attend_fused(a, v, idx, m, 128, True)
        return jnp.sum(out * jnp.cos(out))

    ga_x, gv_x = jax.grad(loss_xla, argnums=(0, 1))(attn, values)
    ga_f, gv_f = jax.grad(loss_fused, argnums=(0, 1))(attn, values)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-5)


def test_empty_segments_zero():
    rng = np.random.default_rng(3)
    attn = jnp.array(rng.normal(size=(1, 64, 4)), jnp.float32)
    values = jnp.array(rng.normal(size=(1, 64, 4)), jnp.float32)
    idx = jnp.zeros((1, 64), jnp.int32)  # everything in segment 0
    out = segment_softmax_attend_fused(attn, values, idx, 5, 64, True)
    assert np.allclose(np.asarray(out[0, 1:]), 0.0)
    want = batched_segment_softmax_attend(attn, values, idx, 5)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(want[0, 0]),
                               rtol=1e-5)


def test_segment_sum_fused_and_shared():
    from cmr_agent_tpu.ops.pallas_kernels import (
        segment_sum_fused, segment_mean_count_fused, segment_sum_fused_shared)
    rng = np.random.default_rng(4)
    b, n, f, m, p = 2, 300, 8, 21, 3
    data = jnp.array(rng.normal(size=(b, n, f)), jnp.float32)
    # include routed-out points (id == m)
    idx = jnp.array(rng.integers(0, m + 1, size=(b, n)), jnp.int32)

    got = segment_sum_fused(data, idx, m, 128, True)
    want = np.zeros((b, m, f))
    for bb in range(b):
        for i in range(n):
            if idx[bb, i] < m:
                want[bb, idx[bb, i]] += np.asarray(data[bb, i])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    means, counts = segment_mean_count_fused(data, idx, m, 128, True)
    cnt = np.zeros((b, m))
    for bb in range(b):
        for i in range(n):
            if idx[bb, i] < m:
                cnt[bb, idx[bb, i]] += 1
    np.testing.assert_allclose(np.asarray(counts), cnt)
    np.testing.assert_allclose(
        np.asarray(means), want / np.maximum(cnt, 1)[..., None],
        rtol=1e-4, atol=1e-4)

    # shared data, per-hypothesis ids
    idx_p = jnp.array(rng.integers(0, m + 1, size=(b, p, n)), jnp.int32)
    got = segment_sum_fused_shared(data, idx_p, m, 128, True)
    for pp in range(p):
        want = np.zeros((b, m, f))
        for bb in range(b):
            for i in range(n):
                if idx_p[bb, pp, i] < m:
                    want[bb, idx_p[bb, pp, i]] += np.asarray(data[bb, i])
        np.testing.assert_allclose(np.asarray(got[:, pp]), want,
                                   rtol=1e-4, atol=1e-4)


def test_segment_sum_fused_gradient():
    from cmr_agent_tpu.ops.pallas_kernels import segment_sum_fused
    rng = np.random.default_rng(5)
    data = jnp.array(rng.normal(size=(1, 100, 4)), jnp.float32)
    idx = jnp.array(rng.integers(0, 8, size=(1, 100)), jnp.int32)

    def loss(d):
        out = segment_sum_fused(d, idx, 7, 64, True)  # id 7 routed out
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(data)
    # oracle: d_loss/d_data_i = 2 * sum[seg(i)] for seg < 7 else 0
    out = np.zeros((7, 4))
    for i in range(100):
        if idx[0, i] < 7:
            out[idx[0, i]] += np.asarray(data[0, i])
    want = np.zeros((100, 4))
    for i in range(100):
        if idx[0, i] < 7:
            want[i] = 2 * out[idx[0, i]]
    np.testing.assert_allclose(np.asarray(g[0]), want, rtol=1e-4, atol=1e-4)


def test_gather_rows_fused_matches_take_along_axis():
    from cmr_agent_tpu.ops.pallas_kernels import gather_rows_fused
    rng = np.random.default_rng(6)
    table = jnp.array(rng.normal(size=(2, 130, 7)), jnp.float32)
    idx = jnp.array(rng.integers(0, 130, size=(2, 300)), jnp.int32)

    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    got = gather_rows_fused(table, idx, 128, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # out-of-range rows are zero
    idx_oor = idx.at[0, 0].set(130)
    got2 = gather_rows_fused(table, idx_oor, 128, True)
    assert float(jnp.max(jnp.abs(got2[0, 0]))) == 0.0

    # VJP: d_table accumulates gradient rows per index (scatter-add oracle)
    def loss(t):
        return jnp.sum(gather_rows_fused(t, idx, 128, True) ** 2)

    g = jax.grad(loss)(table)
    want_g = np.zeros(table.shape, np.float32)
    tn = np.asarray(table)
    for bb in range(2):
        for i in range(300):
            want_g[bb, idx[bb, i]] += 2 * tn[bb, idx[bb, i]]
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-4, atol=1e-4)


def test_knn_fused_matches_top_k():
    from cmr_agent_tpu.ops.pallas_kernels import knn_fused
    from cmr_agent_tpu.ops.sampling import square_distance
    rng = np.random.default_rng(7)
    xyz = jnp.array(rng.normal(size=(2, 300, 3)) * 5, jnp.float32)
    query = jnp.array(rng.normal(size=(2, 170, 3)) * 5, jnp.float32)

    _, want = jax.lax.top_k(-square_distance(query, xyz), 7)
    got = knn_fused(xyz, query, 7, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # self-knn at a non-tile-multiple M exercises the query padding
    _, want_s = jax.lax.top_k(-square_distance(xyz, xyz), 16)
    got_s = knn_fused(xyz, xyz, 16, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_segment_sum_image_fused_variants():
    """Flat/factored x f32/bf16 image-raster kernels against a dense oracle,
    including dead tiles (a whole routed-out tile) and a non-128 width."""
    from cmr_agent_tpu.ops.pallas_kernels import (
        segment_sum_image_fused, segment_mean_count_image_fused)
    rng = np.random.default_rng(11)
    for (h, w) in [(5, 16), (7, 11)]:
        b, n, f, m = 2, 256, 6, h * w
        data = jnp.array(rng.normal(size=(b, n, f)), jnp.float32)
        idx = np.asarray(rng.integers(0, m + 1, size=(b, n)), np.int32)
        idx[:, 64:128] = m            # tile 1 fully dead (tile=64 below)
        idx = jnp.asarray(idx)

        want = np.zeros((b, m, f))
        cnt = np.zeros((b, m))
        for bb in range(b):
            for i in range(n):
                if idx[bb, i] < m:
                    want[bb, idx[bb, i]] += np.asarray(data[bb, i])
                    cnt[bb, idx[bb, i]] += 1

        for factored in (False, True):
            got = segment_sum_image_fused(data, idx, h, w, 64, factored,
                                          None, True)
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=1e-4, atol=1e-4)
            got16 = segment_sum_image_fused(data, idx, h, w, 64, factored,
                                            jnp.bfloat16, True)
            # bf16 rounds the inputs once; sums stay within bf16 input ulp
            np.testing.assert_allclose(np.asarray(got16), want,
                                       rtol=2e-2, atol=2e-2)
            means, counts = segment_mean_count_image_fused(
                data, idx, h, w, 64, factored, None, True)
            np.testing.assert_allclose(np.asarray(counts), cnt)
            np.testing.assert_allclose(
                np.asarray(means), want / np.maximum(cnt, 1)[..., None],
                rtol=1e-4, atol=1e-4)

        # int8 path (flat kernel only): counts are EXACT int accumulation;
        # sums carry one per-(sample, channel) absmax quantisation of the
        # inputs (error <= 0.5/127 of the channel absmax per point).
        got8 = segment_sum_image_fused(data, idx, h, w, 64, False,
                                       jnp.int8, True)
        amax = np.max(np.abs(np.asarray(data)), axis=1)           # [B, F]
        tol = (0.5 / 127.0) * amax[:, None, :] * \
            np.maximum(cnt, 1)[..., None] + 1e-6
        assert (np.abs(np.asarray(got8) - want) <= tol).all()
        m8, c8 = segment_mean_count_image_fused(data, idx, h, w, 64,
                                                False, jnp.int8, True)
        np.testing.assert_array_equal(np.asarray(c8), cnt)
        np.testing.assert_allclose(
            np.asarray(m8), want / np.maximum(cnt, 1)[..., None],
            rtol=2e-2, atol=2e-2)
        with pytest.raises(ValueError):
            segment_sum_image_fused(data, idx, h, w, 64, True,
                                    jnp.int8, True)


def test_segment_sum_image_fused_gradient():
    from cmr_agent_tpu.ops.pallas_kernels import segment_sum_image_fused
    rng = np.random.default_rng(12)
    h, w = 4, 8
    data = jnp.array(rng.normal(size=(1, 100, 4)), jnp.float32)
    idx = jnp.array(rng.integers(0, h * w + 1, size=(1, 100)), jnp.int32)

    def loss(d, factored):
        out = segment_sum_image_fused(d, idx, h, w, 64, factored, None, True)
        return jnp.sum(out ** 2)

    out = np.zeros((h * w, 4))
    for i in range(100):
        if idx[0, i] < h * w:
            out[idx[0, i]] += np.asarray(data[0, i])
    want = np.zeros((100, 4))
    for i in range(100):
        if idx[0, i] < h * w:
            want[i] = 2 * out[idx[0, i]]
    for factored in (False, True):
        g = jax.grad(lambda d: loss(d, factored))(data)
        np.testing.assert_allclose(np.asarray(g[0]), want,
                                   rtol=1e-4, atol=1e-4)


def test_segment_sum_count_image_compact():
    """Compacting raster kernel vs a dense oracle: mixed/dead/full tiles,
    partial chunks, bf16 operands, and the ids-exactness path."""
    from cmr_agent_tpu.ops.pallas_kernels import (
        segment_sum_count_image_compact)
    rng = np.random.default_rng(21)
    for (h, w) in [(5, 16), (7, 11)]:
        b, n, f, m = 2, 300, 6, h * w
        data = jnp.array(rng.normal(size=(b, n, f)), jnp.float32)
        idx = np.asarray(rng.integers(0, m + 1, size=(b, n)), np.int32)
        idx[:, 128:256] = m           # tile 1 fully dead (tile=128 below)
        idx[0, :32] = m               # partial chunk at a tile front
        idx[1, :128] = np.arange(128) % m   # tile 0 fully valid
        idx = jnp.asarray(idx)

        want = np.zeros((b, m, f))
        cnt = np.zeros((b, m))
        for bb in range(b):
            for i in range(n):
                if idx[bb, i] < m:
                    want[bb, idx[bb, i]] += np.asarray(data[bb, i])
                    cnt[bb, idx[bb, i]] += 1

        sums, counts = segment_sum_count_image_compact(
            data, idx, h, w, tile=128, chunk=32, interpret=True)
        np.testing.assert_allclose(np.asarray(sums), want,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(counts), cnt)

        sums16, counts16 = segment_sum_count_image_compact(
            data, idx, h, w, tile=128, chunk=32,
            compute_dtype=jnp.bfloat16, interpret=True)
        # bf16 rounds the inputs once; counts stay exact integers
        np.testing.assert_allclose(np.asarray(sums16), want,
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(counts16), cnt)


def test_segment_sum_count_image_compact_gradient():
    from cmr_agent_tpu.ops.pallas_kernels import (
        segment_sum_count_image_compact)
    rng = np.random.default_rng(22)
    h, w = 4, 8
    data = jnp.array(rng.normal(size=(1, 100, 4)), jnp.float32)
    idx = jnp.array(rng.integers(0, h * w + 1, size=(1, 100)), jnp.int32)

    def loss(d):
        sums, counts = segment_sum_count_image_compact(
            d, idx, h, w, tile=64, chunk=32, interpret=True)
        return jnp.sum(sums ** 2) + jnp.sum(counts)

    out = np.zeros((h * w, 4))
    for i in range(100):
        if idx[0, i] < h * w:
            out[idx[0, i]] += np.asarray(data[0, i])
    want = np.zeros((100, 4))
    for i in range(100):
        if idx[0, i] < h * w:
            want[i] = 2 * out[idx[0, i]]   # counts carry no data gradient
    g = jax.grad(loss)(data)
    np.testing.assert_allclose(np.asarray(g[0]), want, rtol=1e-4, atol=1e-4)


def test_scatter_mean_image_compact_mode_matches_xla():
    """scatter_mean_image(mode='compact') == the XLA segment path."""
    from cmr_agent_tpu.ops.pallas_kernels import (
        segment_sum_count_image_compact)
    from cmr_agent_tpu.ops.scatter import scatter_mean_image
    rng = np.random.default_rng(23)
    b, n, f, h, w = 2, 200, 5, 4, 10
    feat = jnp.array(rng.normal(size=(b, n, f)), jnp.float32)
    pix = jnp.array(rng.integers(0, h * w, size=(b, n)), jnp.int32)
    valid = jnp.array(rng.random((b, n)) < 0.5)
    want = scatter_mean_image(feat, pix, valid, h, w, use_pallas=False)
    ids = jnp.where(valid, pix, h * w).astype(jnp.int32)
    sums, counts = segment_sum_count_image_compact(
        feat, ids, h, w, tile=64, chunk=32, interpret=True)
    got = (sums / jnp.maximum(counts[..., None], 1.0)).reshape(b, h, w, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mask_compact_pack():
    """Streaming mask-pack vs a numpy boolean-index oracle: first-index-
    first order, exact feature/coordinate pairing, zero tail, overflow
    drop policy (highest-index rows beyond k), dead and full tiles."""
    from cmr_agent_tpu.ops.pallas_kernels import mask_compact_pack
    rng = np.random.default_rng(21)
    b, n, f, block = 2, 1024, 6, 128
    k = 512
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    pc = rng.normal(size=(b, n, 3)).astype(np.float32)
    mask = rng.random((b, n)) < 0.3
    mask[0, 128:256] = False          # dead tile
    mask[1, 256:384] = True           # full tile

    got_feat, got_pcT = mask_compact_pack(
        jnp.asarray(mask), jnp.asarray(np.swapaxes(pc, 1, 2)),
        jnp.asarray(feat), k, block=block, interpret=True)
    assert got_feat.shape == (b, k, f)
    assert got_pcT.shape == (b, 3, k)
    for bb in range(b):
        sel = np.nonzero(mask[bb])[0][:k]          # overflow drop: tail
        cnt = len(sel)
        np.testing.assert_allclose(np.asarray(got_feat)[bb, :cnt],
                                   feat[bb, sel], rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_pcT)[bb, :, :cnt],
                                   pc[bb, sel].T, rtol=1e-6, atol=1e-6)
        assert (np.asarray(got_feat)[bb, cnt:] == 0).all()
        assert (np.asarray(got_pcT)[bb, :, cnt:] == 0).all()

    # overflow: all rows masked, n > k -> exactly the first k rows kept
    mask_all = np.ones((1, n), bool)
    gf, gp = mask_compact_pack(
        jnp.asarray(mask_all), jnp.asarray(np.swapaxes(pc[:1], 1, 2)),
        jnp.asarray(feat[:1]), k, block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(gf)[0], feat[0, :k],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp)[0], pc[0, :k].T,
                               rtol=1e-6, atol=1e-6)

    # bf16 features pack exactly (permutation products are exact)
    gf16, _ = mask_compact_pack(
        jnp.asarray(mask), jnp.asarray(np.swapaxes(pc, 1, 2)),
        jnp.asarray(feat, jnp.bfloat16), k, block=block, interpret=True)
    sel0 = np.nonzero(mask[0])[0][:k]
    np.testing.assert_array_equal(
        np.asarray(gf16[0, :len(sel0)]).astype(np.float32),
        np.asarray(jnp.asarray(feat[0, sel0], jnp.bfloat16)
                   ).astype(np.float32))
