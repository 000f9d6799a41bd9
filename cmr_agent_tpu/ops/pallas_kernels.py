"""Pallas TPU kernels for the hot ops.

``segment_softmax_attend_fused`` — the GroupPointTransformer group softmax
(reference models/PointNN.py:167-182, three torch_scatter CUDA calls + two
gathers). TPU redesign: instead of scatters, each point tile builds a
``[M, T]`` one-hot assignment block in VMEM and accumulates

    sumexp  += onehot @ exp(attn - gmax)
    out     += onehot @ (exp(attn - gmax) * values)

on the MXU, dividing on the last tile. Numerically this uses a *global
per-channel* max for stabilisation instead of the per-group max: softmax is
invariant to any shift that is constant within a (group, channel), and a
global channel max is constant within every group, so the result is exact
(worst case: exps as small as ``exp(-range)``, safe in f32 for any sane
activation range). The per-group sums are returned as residuals for the
closed-form backward (plain XLA gathers).

The kernel accumulates directly into its output blocks (constant index
map -> blocks stay VMEM-resident across the sequential TPU grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _contractT(a, b, preferred=jnp.float32):
    # a [T, F], b [T, M] -> a^T @ b [F, M] without an explicit transpose
    # (MXU handles the transposed LHS natively via dimension numbers)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=preferred)


def _kernel(gmax_ref, attn_ref, val_ref, idx_ref, out_ref, sum_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        sum_ref[:] = jnp.zeros_like(sum_ref)

    attn = attn_ref[0]                       # [T, F]
    val = val_ref[0]                         # [T, F]
    ex = jnp.exp(attn - gmax_ref[0])         # [T, F]

    m_pad = out_ref.shape[2]
    tile = attn.shape[0]
    # segment axis on the LANES (full 128-wide MXU tiles; the [M, T] x
    # [T, F] orientation leaves F=64 output lanes half empty)
    seg = jax.lax.broadcasted_iota(jnp.int32, (tile, m_pad), 1)
    onehotT = (seg == idx_ref[0].reshape(tile, 1)).astype(jnp.float32)

    sum_ref[0] += _contractT(ex, onehotT)               # [F, M]
    out_ref[0] += _contractT(ex * val, onehotT)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = out_ref[0] / jnp.maximum(sum_ref[0], 1e-30)


def _fused_forward(attn, values, idx, num_segments: int, tile: int,
                   interpret: bool):
    """attn/values [B,N,F] f32, idx [B,N] int32 -> (out [B,M,F], sumexp)."""
    b, n, f = attn.shape
    m_pad = _round_up(num_segments, 128)  # segment axis rides the lanes
    tile = min(tile, n)
    if n % tile != 0:
        pad = _round_up(n, tile) - n
        attn = jnp.pad(attn, ((0, 0), (0, pad), (0, 0)))
        values = jnp.pad(values, ((0, 0), (0, pad), (0, 0)))
        # padded points route to a row beyond every real segment
        idx = jnp.pad(idx, ((0, 0), (0, pad)),
                      constant_values=np.int32(m_pad - 1)
                      if m_pad > num_segments else np.int32(m_pad))
        n = attn.shape[1]
    n_tiles = n // tile

    # Guard: if m_pad == num_segments there is no spare row for padding
    # points; route them to an out-of-range id (one-hot row never matches).
    gmax = jnp.max(attn, axis=1, keepdims=True)          # [B, 1, F]
    idx3 = idx[:, None, :].astype(jnp.int32)             # [B, 1, N]

    grid = (b, n_tiles)
    out, sumexp = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, f), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, f), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, f), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bb, tt: (bb, 0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, f, m_pad), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, m_pad), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, f, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(gmax, attn, values, idx3)
    out = jnp.swapaxes(out, 1, 2)
    sumexp = jnp.swapaxes(sumexp, 1, 2)
    return out[:, :num_segments], sumexp[:, :num_segments], gmax


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def segment_softmax_attend_fused(attn, values, idx, num_segments: int,
                                 tile: int = 512, interpret: bool = False):
    """Fused batched segmented softmax-attend.

    Drop-in for :func:`cmr_agent_tpu.ops.scatter.
    batched_segment_softmax_attend` with shapes ``[B, N, F] x [B, N] ->
    [B, M, F]``.
    """
    out, _, _ = _fused_forward(attn, values, idx, num_segments, tile,
                               interpret)
    return out


def _fwd(attn, values, idx, num_segments, tile, interpret):
    out, sumexp, gmax = _fused_forward(attn, values, idx, num_segments,
                                       tile, interpret)
    return out, (attn, values, idx, out, sumexp, gmax)


def _bwd(num_segments, tile, interpret, res, g):
    attn, values, idx, out, sumexp, gmax = res
    f = attn.shape[-1]
    idx32 = idx.astype(jnp.int32)
    # w_i = exp(attn_i - gmax) / sumexp[seg(i)]  (channel-wise)
    if interpret:
        take = lambda table: jnp.take_along_axis(table, idx32[:, :, None],
                                                 axis=1)
        s_at = jnp.maximum(take(sumexp), 1e-30)
        g_at = take(g)
        o_at = take(out)
    else:
        # one fused gather over the three [B, M, F] residual tables: XLA's
        # row gather runs at ~30 GB/s on this runtime (the very cost the
        # forward kernel exists to avoid), so the backward must not
        # reintroduce it — measured ~2.7 ms per [B,40960,64] gather vs
        # ~0.7 ms fused, x3 tables x3 GroupPT calls per geo train step.
        at = gather_rows_fused(jnp.concatenate([sumexp, out, g], axis=-1),
                               idx32, tile)
        s_at = jnp.maximum(at[..., :f], 1e-30)
        o_at = at[..., f:2 * f]
        g_at = at[..., 2 * f:]
    w = jnp.exp(attn - gmax) / s_at                      # [B, N, F]
    # routed-out points (idx outside [0, M)) contributed nothing forward;
    # their gradient is exactly zero (the fused gather already returns
    # zero rows for them, but w is then garbage — mask it)
    valid = ((idx32 >= 0) & (idx32 < num_segments))[:, :, None]
    w = jnp.where(valid, w, 0.0)
    dvalues = w * g_at
    dattn = w * g_at * (values - o_at)
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dattn, dvalues, didx


segment_softmax_attend_fused.defvjp(_fwd, _bwd)


def use_pallas_default(enabled=None) -> bool:
    """Pallas kernels run compiled on TPU only; XLA path elsewhere.

    On this TPU runtime the XLA scatter lowering is catastrophically slow
    (hundreds of seconds for a single 4096-point segmented softmax), so on
    TPU the fused matmul kernels are the only viable path, not merely an
    optimisation.

    Args:
      enabled: optional ``Config.use_pallas`` flag. ``False`` forces the XLA
        path even on TPU; ``True``/``None`` defer to backend capability
        (Pallas never runs compiled on CPU).

    Honours ``jax.default_device`` overrides (e.g. a CPU-baseline run inside
    a TPU process), falling back to the process default backend.
    """
    if enabled is False:
        return False
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", "cpu") != "cpu"
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------
# Fused segment-sum (+count): one-hot matmul accumulation, no scatters.
# --------------------------------------------------------------------------

def _sum_kernel(data_ref, idx_ref, sum_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)

    data = data_ref[0]                        # [T, F]
    m_pad = sum_ref.shape[2]
    tile = data.shape[0]
    seg = jax.lax.broadcasted_iota(jnp.int32, (tile, m_pad), 1)
    onehotT = (seg == idx_ref[0].reshape(tile, 1)).astype(jnp.float32)
    sum_ref[0] += _contractT(data, onehotT)   # [F, M], lanes full


def _segment_sum_fused_impl(data, idx, num_segments: int, tile: int,
                            interpret: bool):
    """data [B,N,F] f32, idx [B,N] -> sums [B,M,F]."""
    b, n, f = data.shape
    m_pad = _round_up(num_segments, 128)  # segment axis rides the lanes
    tile = min(tile, n)
    if n % tile != 0:
        pad = _round_up(n, tile) - n
        data = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad)),
                      constant_values=np.int32(m_pad))  # never matches
        n = data.shape[1]
    n_tiles = n // tile
    idx3 = idx[:, None, :].astype(jnp.int32)

    out = pl.pallas_call(
        _sum_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, f), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bb, tt: (bb, 0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, m_pad), lambda bb, tt: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, m_pad), jnp.float32),
        interpret=interpret,
    )(data, idx3)
    return jnp.swapaxes(out, 1, 2)[:, :num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def segment_sum_fused(data, idx, num_segments: int, tile: int = 512,
                      interpret: bool = False):
    """Batched segment sum ``[B,N,F] x [B,N] -> [B,M,F]`` without scatters.

    Invalid/padded points can be routed out by giving them ``idx >=
    num_segments``.
    """
    return _segment_sum_fused_impl(data, idx, num_segments, tile, interpret)


def _sum_fwd(data, idx, num_segments, tile, interpret):
    out = _segment_sum_fused_impl(data, idx, num_segments, tile, interpret)
    return out, idx


def _sum_bwd(num_segments, tile, interpret, idx, g):
    # linear op: d_data = g[seg(i)], zero for routed-out points
    if interpret:
        safe = jnp.clip(idx, 0, num_segments - 1).astype(jnp.int32)
        gathered = jnp.take_along_axis(g, safe[:, :, None], axis=1)
        valid = (idx >= 0) & (idx < num_segments)
        d_data = jnp.where(valid[:, :, None], gathered, 0.0)
    else:
        # fused one-hot gather (avoids the ~30 GB/s XLA row gather);
        # out-of-range ids yield zero rows — exactly the routed-out case
        d_data = gather_rows_fused(g, idx.astype(jnp.int32), tile)
    return d_data, np.zeros(idx.shape, dtype=jax.dtypes.float0)


segment_sum_fused.defvjp(_sum_fwd, _sum_bwd)


def _shared_sum_kernel(flags_ref, dataT_ref, idx_ref, sum_ref):
    bb, pp, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(t == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)

    n_tiles = pl.num_programs(2)
    flag = flags_ref[(bb * pl.num_programs(1) + pp) * n_tiles + t]

    # Skip tiles with no in-range point: a dead hypothesis (e.g. a yaw
    # candidate pointing the camera away from the cloud) contributes zero
    # to every pixel, so both the one-hot build (the VPU bound) and the
    # matmul are elided exactly. Measured: ~36 ms for 729 hypotheses at
    # K=8192/M=5120 with nothing dead, scaling down linearly with the
    # dead fraction (~22 ms at 55% dead poses).
    @pl.when(flag != 0)
    def _():
        dataT = dataT_ref[0]                  # [F, T] (shared across poses)
        m_pad = sum_ref.shape[3]
        tile = dataT.shape[1]
        # segment axis on the LANES: full 128-wide MXU tiles (the natural
        # [M, T] x [T, F] orientation leaves the F=66 output lanes half
        # empty and measured ~1.5x slower)
        seg = jax.lax.broadcasted_iota(jnp.int32, (tile, m_pad), 1)
        onehotT = (seg == idx_ref[0, 0].reshape(tile, 1)).astype(dataT.dtype)
        sum_ref[0, 0] += jnp.dot(dataT, onehotT,
                                 preferred_element_type=jnp.float32)


def segment_sum_fused_shared(data, idx, num_segments: int, tile: int = 512,
                             interpret: bool = False):
    """Multi-hypothesis segment sum with shared data.

    The cost-volume warp (reference models/IterModel.py:327-351) aggregates
    the SAME per-point features under P different pose-dependent pixel
    assignments. Sharing the data blocks across the hypothesis grid axis
    avoids materialising ``[P, N, F]``, and per-(pose, tile) validity flags
    (scalar-prefetched) skip work for hypotheses that project nothing into
    the image.

    Args:
      data: ``[B, N, F]``.
      idx:  ``[B, P, N]`` (``>= num_segments`` routes a point out).
    Returns:
      ``[B, P, M, F]`` sums.
    """
    b, n, f = data.shape
    p = idx.shape[1]
    m_pad = _round_up(num_segments, 128)
    tile = min(tile, n)
    if n % tile != 0:
        pad = _round_up(n, tile) - n
        data = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)),
                      constant_values=np.int32(m_pad))
        n = data.shape[1]
    n_tiles = n // tile
    idx4 = idx[:, :, None, :].astype(jnp.int32)          # [B, P, 1, N]
    dataT = jnp.swapaxes(data, 1, 2)                     # [B, F, N]
    flags = jnp.any(
        idx.reshape(b, p, n_tiles, tile) < num_segments, axis=-1
    ).astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p, n_tiles),
        in_specs=[
            pl.BlockSpec((1, f, tile), lambda bb, pp, tt, fl: (bb, 0, tt)),
            pl.BlockSpec((1, 1, 1, tile),
                         lambda bb, pp, tt, fl: (bb, pp, 0, tt)),
        ],
        out_specs=pl.BlockSpec((1, 1, f, m_pad),
                               lambda bb, pp, tt, fl: (bb, pp, 0, 0)),
    )
    out = pl.pallas_call(
        _shared_sum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, f, m_pad), jnp.float32),
        interpret=interpret,
    )(flags, dataT, idx4)
    return jnp.swapaxes(out, 2, 3)[:, :, :num_segments]


# --------------------------------------------------------------------------
# Fused exact k-NN: distance tile + iterative argmin extraction in VMEM.
# XLA's lax.top_k lowers to a full sort of the 1280-wide distance rows
# (measured 4.9 ms for [8, 1280, 1280] k=16); extracting k minima with
# argmin+mask rounds over a VMEM-resident tile reads the distances once.
# --------------------------------------------------------------------------

def _knn_kernel(query_ref, xyzT_ref, sqn_ref, out_ref, *, k: int):
    q = query_ref[0]                          # [T, 3] f32
    xyzT = xyzT_ref[0]                        # [3, N]
    # |q - x|^2 up to the row-constant |q|^2 (irrelevant to per-row argmin)
    d = (sqn_ref[0]                           # [1, N] = |x|^2
         - 2.0 * jnp.dot(q, xyzT, preferred_element_type=jnp.float32))
    n = d.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    for kk in range(k):
        best = jnp.argmin(d, axis=1).astype(jnp.int32)        # [T]
        out_ref[0, :, kk] = best
        d = jnp.where(lane == best[:, None], jnp.inf, d)


def knn_fused(xyz, query, k: int, tile: int = 256,
              interpret: bool = False):
    """Exact k nearest neighbours: ``xyz [B,N,3], query [B,M,3] -> [B,M,k]``.

    *Exact* ties break toward the lower index (same policy as
    ``lax.top_k``). Near-ties can differ from the XLA fallback: the kernel
    ranks ``|x|^2 - 2 q.x`` (dropping the row-constant ``|q|^2``), which is
    argmin-equivalent in exact arithmetic but rounds differently from
    ``square_distance`` + ``lax.top_k``, so neighbours whose distances agree
    to within ~1 ulp may swap between the fused and fallback paths.
    """
    b, n, _ = xyz.shape
    m = query.shape[1]
    if k > n:
        raise ValueError(f"knn_fused: k={k} exceeds the {n} candidate "
                         "points; rows would silently pad with index 0")
    tile = min(tile, m)
    m_pad = _round_up(m, tile)
    if m_pad != m:
        query = jnp.pad(query, ((0, 0), (0, m_pad - m), (0, 0)))
    xyzT = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)     # [B, 3, N]
    sqn = jnp.sum(xyz.astype(jnp.float32) ** 2, axis=-1,
                  keepdims=True).reshape(b, 1, n)          # [B, 1, N]

    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=(b, m_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, k), jnp.int32),
        interpret=interpret,
    )(query.astype(jnp.float32), xyzT, sqn)
    return out[:, :m]


# --------------------------------------------------------------------------
# Fused row gather: one-hot matmul (XLA's row gather runs at ~30 GB/s on
# this TPU runtime — 2.7 ms for an [8, 40960, 64] gather that is 0.1 ms at
# the HBM roofline; and its VJP is an XLA scatter-add, which is unusable
# here, see use_pallas_default).
# --------------------------------------------------------------------------

def _gather_kernel(tableT_ref, idx_ref, out_ref):
    tableT = tableT_ref[0]                    # [F, M] (resident)
    m = tableT.shape[1]
    t = out_ref.shape[2]
    # one-hot with the gathered-row axis on the LANES; each output column
    # has exactly one non-zero term, so any accumulation order is exact
    seg = jax.lax.broadcasted_iota(jnp.int32, (m, t), 0)
    onehot = (seg == idx_ref[0, 0].reshape(1, t)).astype(tableT.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if tableT.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    res = jnp.dot(tableT, onehot, precision=prec,
                  preferred_element_type=jnp.float32)
    out_ref[0] = res.astype(out_ref.dtype)


def _gather_rows_impl(table, idx, tile: int, interpret: bool):
    b, m, f = table.shape
    n = idx.shape[1]
    tile = min(tile, _round_up(n, 128))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n)),
                      constant_values=np.int32(m))  # out of range -> zeros
    idx3 = idx[:, None, :].astype(jnp.int32)
    tableT = jnp.swapaxes(table, 1, 2)              # [B, F, M]

    out = pl.pallas_call(
        _gather_kernel,
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, f, m), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda bb, tt: (bb, 0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, tile), lambda bb, tt: (bb, 0, tt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, n_pad), table.dtype),
        interpret=interpret,
    )(tableT, idx3)
    return jnp.swapaxes(out, 1, 2)[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_fused(table, idx, tile: int = 512, interpret: bool = False):
    """Batched row gather ``table [B,M,F] x idx [B,N] -> [B,N,F]``.

    Exact (each output row selects exactly one table row; f32 tables use
    HIGHEST matmul precision so operands are not bf16-truncated).
    Out-of-range indices produce zero rows. Intended for small tables
    (M <= ~2k): the one-hot build costs ``M*N`` VPU ops.
    """
    return _gather_rows_impl(table, idx, tile, interpret)


def _gather_fwd(table, idx, tile, interpret):
    return _gather_rows_impl(table, idx, tile, interpret), \
        (idx, table.shape[1])


def _gather_bwd(tile, interpret, res, g):
    idx, m = res
    d_table = segment_sum_fused(g.astype(jnp.float32), idx, m, tile,
                                interpret).astype(g.dtype)
    return d_table, np.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_fused.defvjp(_gather_fwd, _gather_bwd)


def segment_mean_count_fused(data, idx, num_segments: int, tile: int = 512,
                             interpret: bool = False):
    """Batched segment mean + counts: ``-> (means [B,M,F], counts [B,M])``.

    Count rides along as an extra all-ones channel so a single kernel pass
    produces both. Empty segments mean 0 (torch_scatter semantics).
    """
    ones = jnp.ones(data.shape[:2] + (1,), data.dtype)
    aug = jnp.concatenate([data, ones], axis=-1)
    sums = segment_sum_fused(aug, idx, num_segments, tile, interpret)
    counts = sums[..., -1]
    means = sums[..., :-1] / jnp.maximum(counts[..., None], 1.0)
    return means, counts


# --------------------------------------------------------------------------
# Image-raster segment sum: the episode observation kernel (x10 per episode,
# reference environment/environment.py:67-82).  Three measured refinements
# over the generic segment_sum_fused:
#   * dead-tile skipping — compact_observation_state sorts valid points
#     first, so the routed-out tail is contiguous and whole point tiles
#     carry nothing (same scalar-prefetch gate as the multi-hypothesis
#     cost-volume kernel, which scales linearly with the dead fraction);
#   * bf16 operands — the one-hot is exactly representable and every
#     product is data*{0,1} (exact), accumulation stays f32 via
#     preferred_element_type, so only one bf16 rounding of the inputs is
#     introduced — and the agent consumes the observation in bf16 anyway;
#   * factored hi/lo one-hot ("row/column factoring") — pixel ids are
#     ``y*w + x`` with w <= 128, so instead of materialising a [T, h*w]
#     one-hot (h*w/128 vregs per point row) the kernel builds one [T, 128]
#     column one-hot and gates the data by the row match per y (65-lane
#     masks): ~2x less VPU vreg traffic at identical MXU flops.
# --------------------------------------------------------------------------

def _sum_image_flat_kernel(flags_ref, data_ref, idx_ref, out_ref, *,
                           append_ones: bool = False):
    bb, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    flag = flags_ref[bb * pl.num_programs(1) + t]

    @pl.when(flag != 0)
    def _():
        data = data_ref[0]                    # [T, F]
        m_pad = out_ref.shape[2]
        tile = data.shape[0]
        if append_ones:
            # counts ride as a VMEM-local ones column (exact products) —
            # appending on the host side costs a full [B, N, F+1] copy
            data = jnp.concatenate(
                [data, jnp.ones((tile, 1), data.dtype)], axis=1)
        seg = jax.lax.broadcasted_iota(jnp.int32, (tile, m_pad), 1)
        onehotT = (seg == idx_ref[0, 0].reshape(tile, 1)).astype(data.dtype)
        out_ref[0] += _contractT(data, onehotT, preferred=out_ref.dtype)


def _sum_image_factored_kernel(flags_ref, data_ref, lo_ref, hi_ref, out_ref,
                               *, n_hi: int):
    bb, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    flag = flags_ref[bb * pl.num_programs(1) + t]

    @pl.when(flag != 0)
    def _():
        data = data_ref[0]                    # [T, F]
        tile = data.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
        onehot_lo = (lane == lo_ref[0, 0].reshape(tile, 1)).astype(data.dtype)
        hi = hi_ref[0, 0].reshape(tile, 1)    # [T, 1]
        for h in range(n_hi):                 # static unroll over image rows
            gated = data * (hi == h).astype(data.dtype)
            out_ref[0, h] += _contractT(gated, onehot_lo)   # [F, 128]


def _segment_sum_image_impl(data, idx, h: int, w: int, tile: int,
                            factored: bool, compute_dtype, interpret: bool,
                            append_ones: bool = False):
    b, n, f = data.shape
    f_out = f + 1 if append_ones else f
    num_segments = h * w
    tile = min(tile, n)
    if n % tile != 0:
        pad = _round_up(n, tile) - n
        data = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad)),
                      constant_values=np.int32(num_segments))
        n = data.shape[1]
    n_tiles = n // tile
    idx = idx.astype(jnp.int32)
    dequant_scale = None
    if compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.int8:
        # int8 one-hot matmul: 2x the bf16 MXU rate on v5e, and the int32
        # accumulation is EXACT — the only error is one per-(sample,
        # channel) symmetric absmax quantisation of the inputs. Counts
        # (the appended ones column) stay exact integers.
        absmax = jnp.max(jnp.abs(data.astype(jnp.float32)), axis=1)  # [B,F]
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.round(data.astype(jnp.float32) / scale[:, None, :])
        data = jnp.clip(q, -127, 127).astype(jnp.int8)
        dequant_scale = scale
    elif compute_dtype is not None:
        data = data.astype(compute_dtype)
    flags = jnp.any(
        idx.reshape(b, n_tiles, tile) < num_segments, axis=-1
    ).astype(jnp.int32).reshape(-1)

    if factored:
        if dequant_scale is not None:
            raise ValueError("int8 raster is implemented for the flat "
                             "kernel only")
        if w > 128:
            raise ValueError(f"factored raster kernel needs w <= 128, got {w}")
        # invalid ids (== h*w) land on hi == h, outside the unrolled loop
        lo = (idx % w)[:, None, :]
        hi = (idx // w)[:, None, :]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tile, f), lambda bb, tt, fl: (bb, tt, 0)),
                pl.BlockSpec((1, 1, tile), lambda bb, tt, fl: (bb, 0, tt)),
                pl.BlockSpec((1, 1, tile), lambda bb, tt, fl: (bb, 0, tt)),
            ],
            out_specs=pl.BlockSpec((1, h, f, 128),
                                   lambda bb, tt, fl: (bb, 0, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_sum_image_factored_kernel, n_hi=h),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, f, 128), jnp.float32),
            interpret=interpret,
        )(flags, data, lo, hi)
        # [B, h, F, 128] -> [B, h, w, F] -> [B, h*w, F]
        out = jnp.swapaxes(out, 2, 3)[:, :, :w].reshape(b, num_segments, f)
        return out

    m_pad = _round_up(num_segments, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, f), lambda bb, tt, fl: (bb, tt, 0)),
            pl.BlockSpec((1, 1, tile), lambda bb, tt, fl: (bb, 0, tt)),
        ],
        out_specs=pl.BlockSpec((1, f_out, m_pad),
                               lambda bb, tt, fl: (bb, 0, 0)),
    )
    acc_dtype = jnp.int32 if dequant_scale is not None else jnp.float32
    out = pl.pallas_call(
        functools.partial(_sum_image_flat_kernel, append_ones=append_ones),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f_out, m_pad), acc_dtype),
        interpret=interpret,
    )(flags, data, idx[:, None, :])
    if dequant_scale is not None:
        s = dequant_scale                                 # [B, F]
        if append_ones:                                   # count channel: 1
            s = jnp.concatenate([s, jnp.ones((b, 1), s.dtype)], axis=1)
        out = out.astype(jnp.float32) * s[:, :, None]
    return jnp.swapaxes(out, 1, 2)[:, :num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def segment_sum_image_fused(data, idx, h: int, w: int, tile: int = 512,
                            factored: bool = True, compute_dtype=None,
                            interpret: bool = False):
    """Image-raster segment sum ``[B,N,F] x [B,N] -> [B,h*w,F]``.

    Pixel ids are ``y*w + x``; any id ``>= h*w`` routes the point out.
    ``compute_dtype=jnp.bfloat16`` runs the one-hot matmul in bf16 with f32
    accumulation (exact products, one input rounding). Dead point tiles
    (all ids routed out) are skipped entirely.
    """
    return _segment_sum_image_impl(data, idx, h, w, tile, factored,
                                   compute_dtype, interpret)


def _sum_image_fwd(data, idx, h, w, tile, factored, compute_dtype, interpret):
    out = _segment_sum_image_impl(data, idx, h, w, tile, factored,
                                  compute_dtype, interpret)
    return out, idx


def _sum_image_bwd(h, w, tile, factored, compute_dtype, interpret, idx, g):
    # linear op: d_data = g[seg(i)], zero for routed-out points (the bf16
    # input rounding differentiates as identity)
    if interpret:
        num_segments = h * w
        safe = jnp.clip(idx, 0, num_segments - 1).astype(jnp.int32)
        gathered = jnp.take_along_axis(g, safe[:, :, None], axis=1)
        valid = (idx >= 0) & (idx < num_segments)
        d_data = jnp.where(valid[:, :, None], gathered, 0.0)
    else:
        d_data = gather_rows_fused(g, idx.astype(jnp.int32), tile)
    return d_data, np.zeros(idx.shape, dtype=jax.dtypes.float0)


segment_sum_image_fused.defvjp(_sum_image_fwd, _sum_image_bwd)


# --------------------------------------------------------------------------
# Compacting image-raster kernel: in-tile valid-first permutation + chunk
# gating. Replaces the global top-K compaction (lax.top_k + three
# take_along_axis gathers at the ~30 GB/s XLA gather rate, measured
# ~4.8 ms/iteration at KITTI scale) with a per-tile permutation built and
# applied entirely in VMEM:
#   * prefix ranks via a lower-triangular matmul (the MXU computes the
#     prefix sums; Mosaic has no fast 1-D cumsum),
#   * a [T, T] permutation one-hot packs valid rows to the tile front
#     (2*T*T*F flops — ~10% of the main accumulation matmul),
#   * the segment accumulation then runs per ``chunk`` rows, skipping
#     chunks past the tile's valid count.
# Cost therefore scales with the ACTUAL number of valid points (plus one
# partial chunk per tile) with no global data movement, no top-K sort, and
# no K cap — the semantics are exact for every validity fraction, unlike
# compact_observation_state's "drop beyond K" policy.
# --------------------------------------------------------------------------

def _sum_image_compact_kernel(flags_ref, data_ref, idx_ref, out_ref, *,
                              chunk: int, hw: int):
    bb, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    flag = flags_ref[bb * pl.num_programs(1) + t]

    @pl.when(flag != 0)
    def _():
        data = data_ref[0]                    # [T, F] compute dtype
        ids = idx_ref[0]                      # [1, T] i32; >= hw routed out
        tile = data.shape[0]
        # ids in column layout for the byte-split matmul columns below.
        # An in-kernel [1, T] -> [T, 1] relayout: passing a second
        # [B, N, 1] operand instead makes XLA materialise the id tensor
        # sublane-major (a 40960-wide transpose + 64x lane padding,
        # measured ~1 ms/step at KITTI scale).
        ids_col = jnp.swapaxes(ids, 0, 1)     # [T, 1]

        # Exclusive prefix of the valid mask as a [1, T] x [T, T] triangle
        # matmul (the MXU computes the prefix sums; Mosaic has no fast 1-D
        # cumsum and no 1-D<->2-D vector reshapes). DEFAULT precision is
        # exact: operands are 0/1 (bf16-representable), accumulation is f32.
        # NOTE orientation — a [T, T] LHS with a lane-padded skinny RHS
        # measured ~6x the whole kernel; the [1, T] LHS costs ~1% of it.
        valid = (ids < hw)                    # [1, T]
        v = valid.astype(jnp.float32)
        tri_r = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        tri_c = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        upper = (tri_r < tri_c).astype(jnp.float32)    # strict upper
        rank = jnp.dot(v, upper, preferred_element_type=jnp.float32)
        nvalid = jnp.sum(v)
        # invalid rank = position - valid rank; parked after the valid run
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1).astype(
            jnp.float32)
        dest = jnp.where(valid, rank, nvalid + pos - rank).astype(jnp.int32)

        # permutation matrix P[dst, src] by broadcast-compare (no
        # reshapes); one matmul moves the data AND the ids, the latter
        # split into two bf16-exact byte columns (hi, lo in [0, 128); ids
        # <= h*w < 2^14). The f32 path keeps HIGHEST so the permutation
        # stays an exact row selection (gather_rows_fused policy); bf16
        # data is exact either way.
        perm = (tri_r == dest).astype(data.dtype)      # [T(dst), T(src)]
        ids_hi = (ids_col // 128).astype(data.dtype)   # [T, 1]
        ids_lo = (ids_col % 128).astype(data.dtype)
        aug_in = jnp.concatenate(
            [data, ids_hi, ids_lo], axis=1)            # [T, F+2]
        prec = (jax.lax.Precision.HIGHEST if data.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        comp = jnp.dot(perm, aug_in, precision=prec,
                       preferred_element_type=jnp.float32)  # [T, F+2]
        f = data.shape[1]
        comp_data = comp[:, :f].astype(data.dtype)
        comp_ids = (comp[:, f:f + 1] * 128 + comp[:, f + 1:f + 2]).astype(
            jnp.int32)                                 # [T, 1] exact
        # invalid rows keep id == hw -> never match the one-hot below.

        m_pad = out_ref.shape[2]
        nvalid_i = nvalid.astype(jnp.int32)
        ones = jnp.ones((chunk, 1), data.dtype)
        for c in range(tile // chunk):
            @pl.when(c * chunk < nvalid_i)
            def _(c=c):
                d = comp_data[c * chunk:(c + 1) * chunk]     # [C, F]
                cid = comp_ids[c * chunk:(c + 1) * chunk]    # [C, 1]
                seg = jax.lax.broadcasted_iota(jnp.int32, (chunk, m_pad), 1)
                oh = (seg == cid).astype(data.dtype)
                # counts ride as a VMEM-local ones column (exact products)
                aug = jnp.concatenate([d, ones], axis=1)     # [C, F+1]
                out_ref[0] += _contractT(aug, oh)


def _segment_sum_count_image_compact_impl(data, idx, h: int, w: int,
                                          tile: int, chunk: int,
                                          compute_dtype, interpret: bool):
    b, n, f = data.shape
    hw = h * w
    tile = min(tile, _round_up(n, chunk))
    if n % tile != 0:
        pad = _round_up(n, tile) - n
        data = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=np.int32(hw))
        n = data.shape[1]
    n_tiles = n // tile
    idx = idx.astype(jnp.int32)
    if compute_dtype is not None:
        data = data.astype(compute_dtype)
    m_pad = _round_up(hw, 128)
    flags = jnp.any(
        idx.reshape(b, n_tiles, tile) < hw, axis=-1
    ).astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, f), lambda bb, tt, fl: (bb, tt, 0)),
            pl.BlockSpec((1, 1, tile), lambda bb, tt, fl: (bb, 0, tt)),
        ],
        out_specs=pl.BlockSpec((1, f + 1, m_pad),
                               lambda bb, tt, fl: (bb, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_sum_image_compact_kernel, chunk=chunk, hw=hw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f + 1, m_pad), jnp.float32),
        interpret=interpret,
    )(flags, data, idx[:, None, :])
    out = jnp.swapaxes(out, 1, 2)[:, :hw]                    # [B, hw, F+1]
    return out[..., :f], out[..., f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def segment_sum_count_image_compact(data, idx, h: int, w: int,
                                    tile: int = 512, chunk: int = 128,
                                    compute_dtype=None,
                                    interpret: bool = False):
    """Compacting image-raster segment sum + counts.

    ``[B,N,F] x [B,N] -> (sums [B,h*w,F], counts [B,h*w])``. Pixel ids are
    ``y*w + x``; any id ``>= h*w`` routes the point out. Unlike the
    top-K-compaction + :func:`segment_sum_image_fused` pipeline this needs
    no host-side point reordering: each tile packs its valid rows to the
    front in VMEM and accumulation skips chunks past the valid count, so
    cost scales with the true valid fraction and no points are ever
    dropped. ``compute_dtype=bf16`` runs the matmuls at the bf16 MXU rate
    with f32 accumulation (one input rounding; counts stay exact).
    """
    return _segment_sum_count_image_compact_impl(
        data, idx, h, w, tile, chunk, compute_dtype, interpret)


def _sum_compact_fwd(data, idx, h, w, tile, chunk, compute_dtype, interpret):
    out = _segment_sum_count_image_compact_impl(
        data, idx, h, w, tile, chunk, compute_dtype, interpret)
    return out, idx


def _sum_compact_bwd(h, w, tile, chunk, compute_dtype, interpret, idx, g):
    g_sums, _ = g          # counts carry no data gradient
    if interpret:
        num_segments = h * w
        safe = jnp.clip(idx, 0, num_segments - 1).astype(jnp.int32)
        gathered = jnp.take_along_axis(g_sums, safe[:, :, None], axis=1)
        valid = (idx >= 0) & (idx < num_segments)
        d_data = jnp.where(valid[:, :, None], gathered, 0.0)
    else:
        d_data = gather_rows_fused(g_sums, idx.astype(jnp.int32), tile)
    return d_data, np.zeros(idx.shape, dtype=jax.dtypes.float0)


segment_sum_count_image_compact.defvjp(_sum_compact_fwd, _sum_compact_bwd)


def segment_mean_count_image_fused(data, idx, h: int, w: int,
                                   tile: int = 512, factored: bool = True,
                                   compute_dtype=None,
                                   interpret: bool = False):
    """Image-raster segment mean + counts: ``-> (means [B,h*w,F], counts)``.

    Same contract as :func:`segment_mean_count_fused` with ``num_segments =
    h*w`` implied by the image extent (counts are accumulated in f32 even
    under ``compute_dtype=bf16`` — the ones channel and one-hot products are
    exact, so counts are exact integers either way). On the flat path the
    ones column is appended inside the kernel (a host-side concat costs a
    full [B, N, F+1] copy per step, measured ~0.56 ms/iteration); the
    linear VJP is unchanged (counts carry no data gradient).
    """
    if not factored:
        @jax.custom_vjp
        def _sum_count(d):
            out = _segment_sum_image_impl(d, idx, h, w, tile, False,
                                          compute_dtype, interpret,
                                          append_ones=True)
            return out[..., :-1], out[..., -1]

        def _sc_fwd(d):
            return _sum_count(d), None

        def _sc_bwd(_, g):
            g_sums, _g_counts = g
            if interpret:
                num_segments = h * w
                safe = jnp.clip(idx, 0, num_segments - 1).astype(jnp.int32)
                gathered = jnp.take_along_axis(g_sums, safe[:, :, None],
                                               axis=1)
                ok = (idx >= 0) & (idx < num_segments)
                return (jnp.where(ok[:, :, None], gathered, 0.0),)
            return (gather_rows_fused(g_sums, idx.astype(jnp.int32), tile),)

        _sum_count.defvjp(_sc_fwd, _sc_bwd)
        sums, counts = _sum_count(data)
        means = sums / jnp.maximum(counts[..., None], 1.0)
        return means, counts

    ones = jnp.ones(data.shape[:2] + (1,), data.dtype)
    aug = jnp.concatenate([data, ones], axis=-1)
    sums = segment_sum_image_fused(aug, idx, h, w, tile, factored,
                                   compute_dtype, interpret)
    counts = sums[..., -1]
    means = sums[..., :-1] / jnp.maximum(counts[..., None], 1.0)
    return means, counts


# --------------------------------------------------------------------------
# Fused pointwise dense chain: L x (matmul + bias + LeakyReLU) with an
# optional (projected or identity) residual and an optional running-max
# epilogue, all over one VMEM round trip of the [B, N, C] tensor.
#
# The point stacks (MiniPointNet chains, ConvBNReLURes1D blocks, the
# agent's 3-D state branch — reference models/PointNN.py:96-123,260-282,
# models/CMRAgent.py:25-29,92-101) are memory-bound at 64-128 channels:
# XLA fuses BN+activation into each matmul but still round-trips the
# [B, 40960, C] tensor through HBM once per layer (measured at the ~920
# GB/s roofline). Chaining the layers in VMEM reads the tensor once and
# writes once — weights are tiny ([<=128, <=128]) and stay resident.
# In eval mode BatchNorm folds into the preceding matmul's scale/bias
# (callers fold; this kernel is BN-agnostic). Per-batch biases ([B, C])
# carry the agent's pooled-broadcast contribution without materialising
# the concat (models/agent.py:_SplitInputDense).
# --------------------------------------------------------------------------

def _leaky(x, slope: float):
    return jnp.where(x >= 0, x, x * slope)


def _chain_kernel(*refs, n_layers: int, slopes, residual: str,
                  final_slope, out_max: bool, n_valid: int, tile: int):
    # refs: x, [pooled], (w_i, b_i) x n_layers, [rw, rb], out, [mx]
    it = iter(refs)
    x_ref = next(it)
    pooled_ref = next(it) if residual == "identity_split" else None
    wbs = [(next(it), next(it)) for _ in range(n_layers)]
    rw_ref = rb_ref = None
    if residual == "proj":
        rw_ref, rb_ref = next(it), next(it)
    out_ref = next(it)
    mx_ref = next(it) if out_max else None

    x = x_ref[0]                                   # [T, C0] compute dtype
    h = x
    acc = None
    for i, (w_ref, b_ref) in enumerate(wbs):
        acc = jnp.dot(h, w_ref[...],
                      preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, 0].astype(jnp.float32)  # this batch's bias row
        if slopes[i] is not None:
            acc = _leaky(acc, slopes[i])
        h = acc.astype(x.dtype)
    if residual == "proj":
        s = jnp.dot(x, rw_ref[...], preferred_element_type=jnp.float32)
        s = s + rb_ref[0, 0].astype(jnp.float32)
        acc = acc + s
    elif residual == "identity":
        acc = acc + x.astype(jnp.float32)
    elif residual == "identity_split":
        # identity shortcut over the VIRTUAL concat([x, broadcast(pooled)])
        # — the agent's last 3-D stage — without materialising it in HBM
        prow = pooled_ref[0, 0].astype(jnp.float32)    # [P]
        virt = jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.broadcast_to(prow[None, :], (x.shape[0], prow.shape[0]))],
            axis=1)
        acc = acc + virt
    if final_slope is not None:
        acc = _leaky(acc, final_slope)
    out = acc.astype(out_ref.dtype)
    out_ref[0] = out

    if out_max:
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            mx_ref[:] = jnp.full_like(mx_ref, -jnp.inf)

        # padded rows (beyond the true N) must not contribute to the max
        rows = t * tile + jax.lax.broadcasted_iota(
            jnp.int32, acc.shape, 0)
        masked = jnp.where(rows < n_valid, acc, -jnp.inf)
        mx_ref[0] = jnp.maximum(mx_ref[0],
                                jnp.max(masked, axis=0, keepdims=True))


def _as_batch_bias(b, batch: int):
    """Normalise a bias to [B, C] (per-batch rows ride a (1, C) block)."""
    b = jnp.asarray(b)
    if b.ndim == 1:
        b = jnp.broadcast_to(b[None, :], (batch, b.shape[0]))
    return b.astype(jnp.float32)


def _dense_chain_reference(x, weights, biases, res_weight, res_bias,
                           pooled=None, *,
                           slopes, residual, final_slope, out_max):
    """Pure-jnp mirror of the kernel (same dtype flow); backs the VJP."""
    b = x.shape[0]
    h = x
    acc = None
    for i, (w, bias) in enumerate(zip(weights, biases)):
        acc = jnp.einsum("bnc,cd->bnd", h, w.astype(h.dtype),
                         preferred_element_type=jnp.float32)
        acc = acc + _as_batch_bias(bias, b)[:, None, :]
        if slopes[i] is not None:
            acc = _leaky(acc, slopes[i])
        h = acc.astype(x.dtype)
    if residual == "proj":
        s = jnp.einsum("bnc,cd->bnd", x, res_weight.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        s = s + _as_batch_bias(res_bias, b)[:, None, :]
        acc = acc + s
    elif residual == "identity":
        acc = acc + x.astype(jnp.float32)
    elif residual == "identity_split":
        virt = jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.broadcast_to(pooled.astype(jnp.float32)[:, None, :],
                              (b, x.shape[1], pooled.shape[-1]))], axis=-1)
        acc = acc + virt
    if final_slope is not None:
        acc = _leaky(acc, final_slope)
    out = acc.astype(x.dtype)
    if out_max:
        return out, jnp.max(acc, axis=1).astype(x.dtype)
    return out


def _dense_chain_impl(x, weights, biases, res_weight, res_bias, pooled,
                      slopes, residual, final_slope, out_max, tile,
                      interpret):
    b, n, c0 = x.shape
    n_layers = len(weights)
    c_out = weights[-1].shape[-1]
    if residual == "identity" and c0 != c_out:
        raise ValueError(f"identity residual needs C_in == C_out, got "
                         f"{c0} vs {c_out}")
    if residual == "identity_split":
        if pooled is None or c0 + pooled.shape[-1] != c_out:
            raise ValueError("identity_split needs pooled with "
                             "C_in + P == C_out")
    tile = min(tile, _round_up(n, 8))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    operands = [x]
    in_specs = [pl.BlockSpec((1, tile, c0), lambda bb, tt: (bb, tt, 0))]
    if residual == "identity_split":
        pooled3 = pooled.astype(x.dtype)[:, None, :]        # [B, 1, P]
        operands.append(pooled3)
        in_specs.append(
            pl.BlockSpec((1, 1, pooled3.shape[-1]),
                         lambda bb, tt: (bb, 0, 0)))

    def add_wb(w, bias):
        w = jnp.asarray(w).astype(x.dtype)
        operands.append(w)
        in_specs.append(pl.BlockSpec(w.shape, lambda bb, tt: (0, 0)))
        bb_ = _as_batch_bias(bias, b)[:, None, :]           # [B, 1, C]
        operands.append(bb_)
        in_specs.append(
            pl.BlockSpec((1, 1, bb_.shape[-1]), lambda bb, tt: (bb, 0, 0)))

    for w, bias in zip(weights, biases):
        add_wb(w, bias)
    if residual == "proj":
        add_wb(res_weight, res_bias)

    out_shapes = [jax.ShapeDtypeStruct((b, n_pad, c_out), x.dtype)]
    out_specs = [pl.BlockSpec((1, tile, c_out), lambda bb, tt: (bb, tt, 0))]
    if out_max:
        out_shapes.append(jax.ShapeDtypeStruct((b, 1, c_out), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, 1, c_out), lambda bb, tt: (bb, 0, 0)))

    res = pl.pallas_call(
        functools.partial(_chain_kernel, n_layers=n_layers, slopes=slopes,
                          residual=residual, final_slope=final_slope,
                          out_max=out_max, n_valid=n, tile=tile),
        grid=(b, n_pad // tile),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",
                                 "arbitrary" if out_max else "parallel")),
        interpret=interpret,
    )(*operands)
    if out_max:
        return res[0][:, :n], res[1][:, 0]
    return res[0][:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_dense_chain(x, weights, biases, res_weight=None, res_bias=None,
                      pooled=None, slopes=(), residual="none",
                      final_slope=None, out_max: bool = False,
                      tile: int = 4096, interpret: bool = False):
    """Fused L-layer pointwise chain over ``x [B, N, C0]``.

    ``y_i = leaky(y_{i-1} @ W_i + b_i, slopes[i])`` (``slopes[i] = None``
    skips the activation); optional residual from the input added to the
    final pre-activation (``residual`` in {"none", "identity", "proj"};
    "proj" uses ``res_weight/res_bias``), then ``final_slope`` activation.
    Biases may be ``[C]`` or per-batch ``[B, C]`` (the pooled-broadcast
    trick). With ``out_max`` also returns the per-batch channel max over
    the N axis (the agent's global pooling) accumulated in VMEM.

    Matmuls accumulate in f32 and inter-layer activations round to
    ``x.dtype`` — the same rounding points as the unfused
    Dense -> BatchNorm(f32) -> cast chain. The backward recomputes through
    the pure-jnp reference (the kernel is used in eval/rollout paths;
    training takes the unfused batch-stat path anyway).
    """
    return _dense_chain_impl(x, weights, biases, res_weight, res_bias,
                             pooled, slopes, residual, final_slope,
                             out_max, tile, interpret)


def _chain_fwd(x, weights, biases, res_weight, res_bias, pooled, slopes,
               residual, final_slope, out_max, tile, interpret):
    out = _dense_chain_impl(x, weights, biases, res_weight, res_bias,
                            pooled, slopes, residual, final_slope, out_max,
                            tile, interpret)
    return out, (x, weights, biases, res_weight, res_bias, pooled)


def _chain_bwd(slopes, residual, final_slope, out_max, tile, interpret,
               saved, g):
    x, weights, biases, res_weight, res_bias, pooled = saved
    ref = functools.partial(_dense_chain_reference, slopes=slopes,
                            residual=residual, final_slope=final_slope,
                            out_max=out_max)
    _, vjp = jax.vjp(ref, x, weights, biases, res_weight, res_bias, pooled)
    return vjp(g)


fused_dense_chain.defvjp(_chain_fwd, _chain_bwd)


# --------------------------------------------------------------------------
# Channel-major fused dense chain: same computation as fused_dense_chain on
# a TRANSPOSED [B, C, N] tensor. XLA's TPU layout pads the minormost dim to
# 128 lanes, so every [B, N, 64]-ish stack tensor costs 2x its logical
# bytes (and [B, N, 5] observations cost 25x). With channels on the
# sublanes and points on the lanes the physical footprint equals the
# logical one — the agent's 3-D stack streams at the true roofline.
# --------------------------------------------------------------------------

def _chain_cn_kernel(*refs, n_layers: int, slopes, residual: str,
                     final_slope, out_max: bool, n_valid: int, tile: int):
    # refs: x, [pooled], (w_i, b_i) x n_layers, [rw, rb], out, [mx]
    it = iter(refs)
    x_ref = next(it)
    pooled_ref = next(it) if residual == "identity_split" else None
    wbs = [(next(it), next(it)) for _ in range(n_layers)]
    rw_ref = rb_ref = None
    if residual == "proj":
        rw_ref, rb_ref = next(it), next(it)
    out_ref = next(it)
    mx_ref = next(it) if out_max else None

    x = x_ref[0]                                   # [Cin, T] compute dtype
    h = x
    acc = None
    for i, (w_ref, b_ref) in enumerate(wbs):
        # [Cin, Cout]^T @ [Cin, T] -> [Cout, T] (native transposed LHS)
        acc = _contractT(w_ref[...], h)
        acc = acc + b_ref[0].astype(jnp.float32)   # [Cout, 1] broadcast
        if slopes[i] is not None:
            acc = _leaky(acc, slopes[i])
        h = acc.astype(x.dtype)
    if residual == "proj":
        s = _contractT(rw_ref[...], x) + rb_ref[0].astype(jnp.float32)
        acc = acc + s
    elif residual == "identity":
        acc = acc + x.astype(jnp.float32)
    elif residual == "identity_split":
        prow = pooled_ref[0].astype(jnp.float32)   # [P, 1]
        virt = jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.broadcast_to(prow, (prow.shape[0], x.shape[1]))], axis=0)
        acc = acc + virt
    if final_slope is not None:
        acc = _leaky(acc, final_slope)
    out_ref[0] = acc.astype(out_ref.dtype)

    if out_max:
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            mx_ref[:] = jnp.full_like(mx_ref, -jnp.inf)

        cols = t * tile + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        masked = jnp.where(cols < n_valid, acc, -jnp.inf)
        mx_ref[0] = jnp.maximum(mx_ref[0],
                                jnp.max(masked, axis=1, keepdims=True))


def _dense_chain_cn_reference(x, weights, biases, res_weight, res_bias,
                              pooled=None, *,
                              slopes, residual, final_slope, out_max):
    """Pure-jnp mirror of the cn kernel ([B, C, N]); backs the VJP."""
    b = x.shape[0]
    col = lambda v: _as_batch_bias(v, b)[:, :, None]         # [B, C, 1]
    h = x
    acc = None
    for i, (w, bias) in enumerate(zip(weights, biases)):
        acc = jnp.einsum("cd,bcn->bdn", w.astype(h.dtype), h,
                         preferred_element_type=jnp.float32)
        acc = acc + col(bias)
        if slopes[i] is not None:
            acc = _leaky(acc, slopes[i])
        h = acc.astype(x.dtype)
    if residual == "proj":
        s = jnp.einsum("cd,bcn->bdn", res_weight.astype(x.dtype), x,
                       preferred_element_type=jnp.float32)
        acc = acc + s + col(res_bias)
    elif residual == "identity":
        acc = acc + x.astype(jnp.float32)
    elif residual == "identity_split":
        virt = jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.broadcast_to(pooled.astype(jnp.float32)[:, :, None],
                              (b, pooled.shape[-1], x.shape[-1]))], axis=1)
        acc = acc + virt
    if final_slope is not None:
        acc = _leaky(acc, final_slope)
    out = acc.astype(x.dtype)
    if out_max:
        return out, jnp.max(acc, axis=2).astype(x.dtype)
    return out


def _dense_chain_cn_impl(x, weights, biases, res_weight, res_bias, pooled,
                         slopes, residual, final_slope, out_max, tile,
                         interpret):
    b, c0, n = x.shape
    n_layers = len(weights)
    c_out = weights[-1].shape[-1]
    if residual == "identity" and c0 != c_out:
        raise ValueError(f"identity residual needs C_in == C_out, got "
                         f"{c0} vs {c_out}")
    if residual == "identity_split":
        if pooled is None or c0 + pooled.shape[-1] != c_out:
            raise ValueError("identity_split needs pooled with "
                             "C_in + P == C_out")
    tile = min(tile, _round_up(n, 128))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n)))

    operands = [x]
    in_specs = [pl.BlockSpec((1, c0, tile), lambda bb, tt: (bb, 0, tt))]
    if residual == "identity_split":
        pooled3 = pooled.astype(x.dtype)[:, :, None]        # [B, P, 1]
        operands.append(pooled3)
        in_specs.append(
            pl.BlockSpec((1, pooled3.shape[1], 1),
                         lambda bb, tt: (bb, 0, 0)))

    def add_wb(w, bias):
        w = jnp.asarray(w).astype(x.dtype)
        operands.append(w)
        in_specs.append(pl.BlockSpec(w.shape, lambda bb, tt: (0, 0)))
        bb_ = _as_batch_bias(bias, b)[:, :, None]           # [B, C, 1]
        operands.append(bb_)
        in_specs.append(
            pl.BlockSpec((1, bb_.shape[1], 1), lambda bb, tt: (bb, 0, 0)))

    for w, bias in zip(weights, biases):
        add_wb(w, bias)
    if residual == "proj":
        add_wb(res_weight, res_bias)

    out_shapes = [jax.ShapeDtypeStruct((b, c_out, n_pad), x.dtype)]
    out_specs = [pl.BlockSpec((1, c_out, tile), lambda bb, tt: (bb, 0, tt))]
    if out_max:
        out_shapes.append(jax.ShapeDtypeStruct((b, c_out, 1), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, c_out, 1), lambda bb, tt: (bb, 0, 0)))

    res = pl.pallas_call(
        functools.partial(_chain_cn_kernel, n_layers=n_layers,
                          slopes=slopes, residual=residual,
                          final_slope=final_slope, out_max=out_max,
                          n_valid=n, tile=tile),
        grid=(b, n_pad // tile),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",
                                 "arbitrary" if out_max else "parallel")),
        interpret=interpret,
    )(*operands)
    if out_max:
        return res[0][:, :, :n], res[1][:, :, 0]
    return res[0][:, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_dense_chain_cn(x, weights, biases, res_weight=None, res_bias=None,
                         pooled=None, slopes=(), residual="none",
                         final_slope=None, out_max: bool = False,
                         tile: int = 4096, interpret: bool = False):
    """Channel-major fused dense chain over ``x [B, C0, N]``.

    Same contract as :func:`fused_dense_chain` with the point axis on the
    LANES: ``y_i^T = W_i^T @ y_{i-1}^T + b_i``, biases broadcast along
    points, residual/``identity_split``/``out_max`` as in the row-major
    variant (``out_max`` reduces over the N axis and returns ``[B, C]``).
    """
    return _dense_chain_cn_impl(x, weights, biases, res_weight, res_bias,
                                pooled, slopes, residual, final_slope,
                                out_max, tile, interpret)


def _chain_cn_fwd(x, weights, biases, res_weight, res_bias, pooled, slopes,
                  residual, final_slope, out_max, tile, interpret):
    out = _dense_chain_cn_impl(x, weights, biases, res_weight, res_bias,
                               pooled, slopes, residual, final_slope,
                               out_max, tile, interpret)
    return out, (x, weights, biases, res_weight, res_bias, pooled)


def _chain_cn_bwd(slopes, residual, final_slope, out_max, tile, interpret,
                  saved, g):
    x, weights, biases, res_weight, res_bias, pooled = saved
    ref = functools.partial(_dense_chain_cn_reference, slopes=slopes,
                            residual=residual, final_slope=final_slope,
                            out_max=out_max)
    _, vjp = jax.vjp(ref, x, weights, biases, res_weight, res_bias, pooled)
    return vjp(g)


fused_dense_chain_cn.defvjp(_chain_cn_fwd, _chain_cn_bwd)


# --------------------------------------------------------------------------
# Mask-compaction pack: valid rows first, no ranking, no XLA top_k/gather.
#
# The episode's observation compaction (env.compact_observation_state,
# reference environment/environment.py:48-49 boolean indexing) was
# lax.top_k over [B, 40960] + three take_along_axis row gathers — ~2 ms of
# every bench iteration, almost all of it the full sort top_k lowers to
# (the same pathology as the round-2 knn finding, docs/DESIGN.md). The
# raster is a sum over points, so the pack ORDER is irrelevant: this
# kernel streams the cloud once, packs masked rows first-index-first via a
# per-block permutation one-hot matmul, and writes each block's survivors
# at the running offset with a masked read-modify-write. Drop policy when
# more than ``k`` rows are masked: highest-index overflow drops (top_k
# dropped lowest-score; both are observable via ``raster_dropped``).
# --------------------------------------------------------------------------

def _mask_pack_kernel(mask_ref, pcT_ref, feat_ref, feat_out, pcT_out,
                      count_ref, *, k: int, block: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        count_ref[0] = 0
        feat_out[:] = jnp.zeros_like(feat_out)
        pcT_out[:] = jnp.zeros_like(pcT_out)

    m_row = (mask_ref[0, 0] != 0).reshape(1, block)           # [1, T]
    # inclusive prefix count via a triangular matmul (no Mosaic cumsum):
    # prefix[j] = sum_i m[i] * (i <= j). bf16 0/1 products with f32
    # accumulation are exact at any block size.
    ii = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri = (ii <= jj).astype(jnp.bfloat16)
    prefix = jax.lax.dot_general(
        m_row.astype(jnp.bfloat16), tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)  # [1, T]
    mcount = prefix[0, block - 1]
    count = count_ref[0]
    # Aligned double-width output window: Mosaic requires dynamic lane
    # offsets provably 128-aligned, so the window start is the block-
    # aligned floor of the running count and the window spans 2 blocks
    # (count - w0 < block and <= block new rows always fit).
    w0 = jnp.minimum(count // block, k // block - 2) * block
    w0 = pl.multiple_of(w0, block)
    off = count - w0
    # slot in the 2-block window; == 2*block for dropped/invalid rows
    dest = count + prefix - 1                                 # global row
    slot = jnp.where(m_row & (dest < k), off + prefix - 1, 2 * block)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block, 2 * block), 1)
    onehot = (lane == slot.reshape(block, 1)).astype(feat_ref.dtype)

    # packed [2T, F] = onehot^T @ feat (row-major, straight into the
    # raster kernel's layout); pc_packed [3, 2T] channel-major for the
    # per-step projection chain. HIGHEST precision for f32 operands: the
    # permutation products are exact in any dtype but DEFAULT would
    # bf16-truncate the f32 data itself (same rule as gather_rows_fused).
    prec = (jax.lax.Precision.HIGHEST
            if feat_ref.dtype == jnp.float32 else None)
    packed = jax.lax.dot_general(onehot, feat_ref[0],
                                 (((0,), (0,)), ((), ())),
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
    pc_packed = jax.lax.dot_general(pcT_ref[0].astype(jnp.float32),
                                    onehot.astype(jnp.float32),
                                    (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * block), 1)
    wmask = ((lane_d >= off) & (lane_d < off + mcount)
             & (w0 + lane_d < k))
    # row-oriented twin built from a sublane iota (Mosaic cannot
    # transpose i1 vectors)
    row_d = jax.lax.broadcasted_iota(jnp.int32, (2 * block, 1), 0)
    wmask_r = ((row_d >= off) & (row_d < off + mcount)
               & (w0 + row_d < k))
    cur_f = feat_out[0, pl.ds(w0, 2 * block), :]
    feat_out[0, pl.ds(w0, 2 * block), :] = jnp.where(
        wmask_r, packed.astype(feat_out.dtype), cur_f)
    cur_p = pcT_out[0, :, pl.ds(w0, 2 * block)]
    pcT_out[0, :, pl.ds(w0, 2 * block)] = jnp.where(wmask, pc_packed, cur_p)
    count_ref[0] = jnp.minimum(count + mcount, k)


def mask_compact_pack(mask, pcT, feat, k: int, block: int = 512,
                      interpret: bool = False):
    """Pack masked rows first: ``-> (feat [B,k,F], pcT [B,3,k])``.

    Args:
      mask: ``[B, N]`` bool/int — rows to keep.
      pcT:  ``[B, 3, N]`` float32 coordinates (channel-major).
      feat: ``[B, N, F]`` features (any float dtype; packed exactly — the
        permutation one-hot products are exact in every dtype).
      k: output row budget. When more than ``k`` rows are masked the
        highest-index overflow is dropped (count the loss host-side via
        ``mask.sum() - k``).

    Within the first ``min(count, k)`` output rows, packed order is
    first-index-first; remaining rows are zero. Output row j of ``feat``
    (row-major, the raster kernel's layout) and column j of ``pcT``
    (channel-major, the projection chain's layout) correspond to the same
    input row.
    """
    b, n = mask.shape
    f = feat.shape[-1]
    assert pcT.shape == (b, 3, n), pcT.shape
    assert feat.shape == (b, n, f), feat.shape
    assert n % block == 0, (n, block)
    assert k % block == 0 and k >= 2 * block, (k, block)
    assert block % 128 == 0, block
    n_tiles = n // block
    mask = mask.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda bb, tt: (bb, 0, tt)),
            pl.BlockSpec((1, 3, block), lambda bb, tt: (bb, 0, tt)),
            pl.BlockSpec((1, block, f), lambda bb, tt: (bb, tt, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, f), lambda bb, tt: (bb, 0, 0)),
            pl.BlockSpec((1, 3, k), lambda bb, tt: (bb, 0, 0)),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    feat_out, pcT_out = pl.pallas_call(
        functools.partial(_mask_pack_kernel, k=k, block=block),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, k, f), feat.dtype),
                   jax.ShapeDtypeStruct((b, 3, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # resident [k, F] output + window buffers exceed the 16M
            # default scoped budget at k=20480; v5e has 128M physical VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(mask[:, None, :], pcT, feat)
    return feat_out, pcT_out


# --------------------------------------------------------------------------
# Projection-fused observation raster: SE(3) transform + pinhole projection
# + frustum test + one-hot segment accumulation in ONE kernel.
#
# The per-step 2-D observation (reference environment/environment.py:67-82)
# was project -> round -> mask -> scatter_mean_image: four XLA fusions plus
# a Pallas call whose [B, 1, N] id operand XLA re-lays out per step
# (copy-start pairs in the round-4 trace). Because the transform is affine,
# the whole chain collapses to pix = round((A @ p + b) / z) with
# A = K_cam @ R and b = K_cam @ (mean + t - R @ mean) folded OUTSIDE the
# kernel (9 + 3 floats per sample, SMEM-prefetched): the [3, N] projection
# chain never exists in HBM at all. Valid-first compaction
# (compact_observation_state, either mode) makes dead-tile gating a prefix
# test against the per-sample valid count — no flags tensor either.
# Eval-only (no VJP): training episodes keep the composable path.
# --------------------------------------------------------------------------

def _project_raster_kernel(cnt_ref, ab_ref, pcT_ref, feat_ref, out_ref, *,
                           h: int, w: int, tile: int):
    bb, t = pl.program_id(0), pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    count = cnt_ref[bb]

    @pl.when(t * tile < count)
    def _():
        px = pcT_ref[0, 0:1, :].astype(jnp.float32)           # [1, T]
        py = pcT_ref[0, 1:2, :].astype(jnp.float32)
        pz = pcT_ref[0, 2:3, :].astype(jnp.float32)
        a = lambda i: ab_ref[bb, i]
        xp = a(0) * px + a(1) * py + a(2) * pz + a(9)
        yp = a(3) * px + a(4) * py + a(5) * pz + a(10)
        zp = a(6) * px + a(7) * py + a(8) * pz + a(11)
        zs = jnp.where(jnp.abs(zp) < 1e-10, 1e-10, zp)
        x = xp / zs
        y = yp / zs
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ok = ((x >= 0) & (x <= (w - 1)) & (y >= 0) & (y <= (h - 1))
              & (zp > 0) & (t * tile + lane < count))
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        pix = jnp.where(ok, yi * w + xi, -1)                  # [1, T]

        data = feat_ref[0]                                    # [T, F]
        m_pad = out_ref.shape[2]
        data = jnp.concatenate(
            [data, jnp.ones((tile, 1), data.dtype)], axis=1)  # count col
        seg = jax.lax.broadcasted_iota(jnp.int32, (tile, m_pad), 1)
        onehotT = (seg == pix.reshape(tile, 1)).astype(data.dtype)
        out_ref[0] += _contractT(data, onehotT, preferred=out_ref.dtype)


def segment_mean_count_image_project_fused(pcT, feat, ab, counts,
                                           h: int, w: int, tile: int = 512,
                                           compute_dtype=None,
                                           interpret: bool = False):
    """Fused project+raster mean: ``-> (means [B,h*w,F], counts [B,h*w])``.

    Args:
      pcT:   ``[B, 3, K]`` f32 compacted cloud, channel-major, VALID ROWS
             FIRST (compact_observation_state order).
      feat:  ``[B, K, F]`` features (row j pairs with pcT column j).
      ab:    ``[B, 12]`` f32 — row-major ``A = K_cam @ R`` (9) then
             ``b = K_cam @ (mean + t - R @ mean)`` (3); the pixel of point
             p is ``round((A p + b)_xy / (A p + b)_z)``.
      counts: ``[B]`` int32 number of valid leading rows; rows beyond are
             never read (whole-tile prefix gating).
    """
    b, _, k = pcT.shape
    f = feat.shape[-1]
    assert feat.shape == (b, k, f), feat.shape
    assert ab.shape == (b, 12), ab.shape
    if k % tile != 0:
        raise ValueError(f"K={k} must be a multiple of tile={tile}")
    dequant_scale = None
    if compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.int8:
        # int8 one-hot matmul at the 2x MXU rate with EXACT int32
        # accumulation (same scheme as _segment_sum_image_impl): the only
        # error is one per-(sample, channel) symmetric absmax input
        # quantisation; the appended count column stays exact integers.
        absmax = jnp.max(jnp.abs(feat.astype(jnp.float32)), axis=1)  # [B,F]
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.round(feat.astype(jnp.float32) / scale[:, None, :])
        feat = jnp.clip(q, -127, 127).astype(jnp.int8)
        dequant_scale = scale
    elif compute_dtype is not None:
        feat = feat.astype(compute_dtype)
    m = h * w
    m_pad = _round_up(m, 128)
    n_tiles = k // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda bb, tt, *_: (bb, 0, tt)),
            pl.BlockSpec((1, tile, f), lambda bb, tt, *_: (bb, tt, 0)),
        ],
        out_specs=pl.BlockSpec((1, f + 1, m_pad),
                               lambda bb, tt, *_: (bb, 0, 0)),
    )
    acc_dtype = jnp.int32 if dequant_scale is not None else jnp.float32
    out = pl.pallas_call(
        functools.partial(_project_raster_kernel, h=h, w=w, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f + 1, m_pad), acc_dtype),
        interpret=interpret,
    )(counts.astype(jnp.int32), ab.astype(jnp.float32), pcT, feat)
    if dequant_scale is not None:
        s = jnp.concatenate(
            [dequant_scale, jnp.ones((b, 1), dequant_scale.dtype)], axis=1)
        out = out.astype(jnp.float32) * s[:, :, None]
    out = jnp.swapaxes(out, 1, 2)[:, :m]
    sums, cnt = out[..., :f], out[..., f]
    return sums / jnp.maximum(cnt, 1.0)[..., None], cnt
