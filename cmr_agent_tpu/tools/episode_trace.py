"""Trace-attribute the bench episode: per-op device time from an xplane.

Captures a ``jax.profiler`` trace of the compiled episode program (the
bench.py north-star workload) on the default backend, parses the
``.xplane.pb`` with :class:`jax.profiler.ProfileData`, and prints the
top device ops by total self time — the measurement that drove the
round-2/3 kernel work (docs/DESIGN.md "trace-attributed").

    python -m cmr_agent_tpu.tools.episode_trace [--batch 8] [--iters 3]

Prints one JSON line (top ops + totals); diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def capture(batch_size: int, iters: int, dtype: str, logdir: str,
            topk_override=None):
    import jax
    import jax.numpy as jnp

    from ..config import kitti_config
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "cmr_bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cfg = kitti_config(compute_dtype=dtype)
    batch_np, build_vars, episode = bench.build_workload(cfg, batch_size)

    def step(gv, av, batch, shift):
        final = episode(gv, av, batch, shift)
        return jnp.mean(final) * 1e-12

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    batch = {k: jax.device_put(jnp.asarray(v), dev)
             for k, v in batch_np.items()}
    gv, av = build_vars(batch)
    zero = jnp.zeros((), jnp.float32)
    compiled = jax.jit(step).lower(gv, av, batch, zero).compile()
    shift = zero
    for _ in range(3):
        shift = compiled(gv, av, batch, shift)
    float(shift)
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        shift = compiled(gv, av, batch, shift)
    float(shift)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    log(f"captured {iters} iters in {wall:.3f}s "
        f"({batch_size * iters / wall:.1f} pairs/s during capture)")
    return wall


def attribute(logdir: str, iters: int, top: int = 30):
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    data = ProfileData.from_file(max(paths, key=os.path.getmtime))

    # Device planes are named like '/device:TPU:0'; each line is a core's
    # op stream, each event an executed op instance.
    by_op = collections.Counter()
    occurrences = collections.Counter()
    total_ps = 0
    for plane in data.planes:
        name = plane.name
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "#Chip" not in name and "TPU" not in name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                key = ev.name
                by_op[key] += dur
                occurrences[key] += 1
                total_ps += dur
    return by_op, occurrences, total_ps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args(argv)

    logdir = args.logdir or tempfile.mkdtemp(prefix="cmr_trace_")
    wall = capture(args.batch, args.iters, args.dtype, logdir)
    by_op, occ, total_ns = attribute(logdir, args.iters, args.top)

    rows = []
    for name, ns in by_op.most_common(args.top):
        rows.append({
            "op": name[:120],
            "total_ms": round(ns / 1e6, 3),
            "per_iter_ms": round(ns / 1e6 / args.iters, 3),
            "count": occ[name],
            "pct": round(100 * ns / max(total_ns, 1), 1),
        })
        log(f"{rows[-1]['per_iter_ms']:8.3f} ms/iter {rows[-1]['pct']:5.1f}%"
            f"  x{occ[name]:<5d} {name[:100]}")
    log(f"total device self time: {total_ns / 1e6 / args.iters:.1f} ms/iter"
        f" over {args.iters} iters; wall {wall * 1e3 / args.iters:.1f}"
        " ms/iter")
    print(json.dumps({
        "total_device_ms_per_iter": round(total_ns / 1e6 / args.iters, 2),
        "wall_ms_per_iter": round(wall * 1e3 / args.iters, 2),
        "top": rows,
    }))


if __name__ == "__main__":
    main()
