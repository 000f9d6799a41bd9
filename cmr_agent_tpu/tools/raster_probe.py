"""Observation-raster kernel probe: flat vs factored vs bf16 vs tile-skip.

docs/ROADMAP.md item 5 left the episode's rasterisation kernel (x10 per
episode, reference environment/environment.py:67-82) at its VPU bound with
a declined row/column factoring; this probe measures the full candidate
matrix at the real episode shapes so the decision is numbers, not
estimates:

  base    segment_mean_count_fused       — the shipped generic kernel;
  flat    segment_mean_count_image_fused — same one-hot, plus dead-tile
          skipping (scalar-prefetch gate) [f32 | bf16];
  fact    factored hi/lo one-hot (one [T,128] column one-hot + per-row
          data gates: ~2x less VPU vreg traffic) [f32 | bf16];
  comp    in-kernel valid-first compaction + 128-row chunk gating
          (segment_sum_count_image_compact) [f32 | bf16] — no host-side
          reordering needed; measure with --scattered to model the
          per-step pose-dependent validity the global top-K path cannot
          compact for.

``--valid-frac`` emulates compact_observation_state's contiguous invalid
tail (sorted valid-first), which is what makes whole tiles dead. Run on
the TPU::

    python -m cmr_agent_tpu.tools.raster_probe [--batch 8] [--valid-frac 1.0]

Prints one JSON line; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, args_dev, iters, warmup=5):
    import jax
    import jax.numpy as jnp

    def step(shift, *xs):
        out = fn(*xs, shift)
        return jnp.mean(out.astype(jnp.float32)) * 1e-12

    compiled = jax.jit(step).lower(jnp.zeros((), jnp.float32),
                                   *args_dev).compile()
    shift = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        shift = compiled(shift, *args_dev)
    float(shift)                       # readback = hard sync (axon runtime)
    t0 = time.perf_counter()
    for _ in range(iters):
        shift = compiled(shift, *args_dev)
    float(shift)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from cmr_agent_tpu.ops.pallas_kernels import (
        segment_mean_count_fused, segment_mean_count_image_fused,
        segment_sum_count_image_compact)

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=20480,
                   help="points after top-K compaction (cfg.raster_topk)")
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--h", type=int, default=40)
    p.add_argument("--w", type=int, default=128)
    p.add_argument("--valid-frac", type=float, default=1.0,
                   help="leading fraction of points with in-image ids; the "
                        "tail is routed out (the compacted-episode layout)")
    p.add_argument("--scattered", action="store_true",
                   help="scatter the valid points uniformly instead of "
                        "valid-first (the uncompacted per-step layout)")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)

    from cmr_agent_tpu.cli.common import host_feature_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      host_feature_cache_dir("/tmp/cmr_jax_cache"))
    rng = np.random.default_rng(0)
    m = args.h * args.w
    n_valid = int(args.n * args.valid_frac)
    idx_np = np.full((args.batch, args.n), m, np.int32)
    if args.scattered:
        for b in range(args.batch):
            sel = rng.choice(args.n, size=n_valid, replace=False)
            idx_np[b, sel] = rng.integers(0, m, size=n_valid)
    else:
        idx_np[:, :n_valid] = rng.integers(0, m, size=(args.batch, n_valid))
    feat = jnp.asarray(rng.normal(size=(args.batch, args.n, args.f)),
                       jnp.float32)
    idx = jnp.asarray(idx_np)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind!r}; feat {feat.shape}; m={m} "
        f"valid={n_valid}/{args.n} tile={args.tile}")

    def base(f_, i_, shift):
        out, _ = segment_mean_count_fused(f_ + shift, i_, m, args.tile)
        return out

    def image(factored, dtype):
        def fn(f_, i_, shift):
            out, _ = segment_mean_count_image_fused(
                f_ + shift, i_, args.h, args.w, args.tile, factored, dtype)
            return out
        return fn

    def compact(dtype):
        def fn(f_, i_, shift):
            sums, counts = segment_sum_count_image_compact(
                f_ + shift, i_, args.h, args.w, args.tile,
                compute_dtype=dtype)
            return sums / jnp.maximum(counts[..., None], 1.0)
        return fn

    cases = {
        "base": base,
        "flat_f32": image(False, None),
        "flat_bf16": image(False, jnp.bfloat16),
        "fact_f32": image(True, None),
        "fact_bf16": image(True, jnp.bfloat16),
        "comp_f32": compact(None),
        "comp_bf16": compact(jnp.bfloat16),
    }
    ms = {}
    for name, fn in cases.items():
        ms[name] = time_fn(fn, (feat, idx), args.iters)
        log(f"{name:10s} {ms[name]:7.3f} ms/call")

    best = min(ms, key=ms.get)
    print(json.dumps({
        **{f"{k}_ms": round(v, 4) for k, v in ms.items()},
        "best": best,
        "best_speedup_vs_base": round(ms["base"] / ms[best], 3),
        "valid_frac": args.valid_frac,
    }))


if __name__ == "__main__":
    main()
