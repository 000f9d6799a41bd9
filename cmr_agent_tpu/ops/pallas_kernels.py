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


def _contractT(a, b):
    # a [T, F], b [T, M] -> a^T @ b [F, M] without an explicit transpose
    # (MXU handles the transposed LHS natively via dimension numbers)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


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

def _sum_image_flat_kernel(flags_ref, data_ref, idx_ref, out_ref):
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
        seg = jax.lax.broadcasted_iota(jnp.int32, (tile, m_pad), 1)
        onehotT = (seg == idx_ref[0, 0].reshape(tile, 1)).astype(data.dtype)
        out_ref[0] += _contractT(data, onehotT)


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
                            factored: bool, compute_dtype, interpret: bool):
    b, n, f = data.shape
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
    if compute_dtype is not None:
        data = data.astype(compute_dtype)
    flags = jnp.any(
        idx.reshape(b, n_tiles, tile) < num_segments, axis=-1
    ).astype(jnp.int32).reshape(-1)

    if factored:
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
        out_specs=pl.BlockSpec((1, f, m_pad), lambda bb, tt, fl: (bb, 0, 0)),
    )
    out = pl.pallas_call(
        _sum_image_flat_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f, m_pad), jnp.float32),
        interpret=interpret,
    )(flags, data, idx[:, None, :])
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


def segment_mean_count_image_fused(data, idx, h: int, w: int,
                                   tile: int = 512, factored: bool = True,
                                   compute_dtype=None,
                                   interpret: bool = False):
    """Image-raster segment mean + counts: ``-> (means [B,h*w,F], counts)``.

    Same contract as :func:`segment_mean_count_fused` with ``num_segments =
    h*w`` implied by the image extent (counts are accumulated in f32 even
    under ``compute_dtype=bf16`` — the ones channel and one-hot products are
    exact, so counts are exact integers either way).
    """
    ones = jnp.ones(data.shape[:2] + (1,), data.dtype)
    aug = jnp.concatenate([data, ones], axis=-1)
    sums = segment_sum_image_fused(aug, idx, h, w, tile, factored,
                                   compute_dtype, interpret)
    counts = sums[..., -1]
    means = sums[..., :-1] / jnp.maximum(counts[..., None], 1.0)
    return means, counts
