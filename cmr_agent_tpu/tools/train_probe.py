"""Attribute the geo train-step dispatch residue (sustained vs trace gap).

Round-3 verdict: 134 ms/step sustained vs ~97 ms device self-time at
B=8 — ~37 ms of host-side residue per step with no attribution. This
probe times the SAME jitted step (`train.train_geo.make_geo_train_step`,
donated state, kitti config) under ablated loop conditions so each
suspect is measured, not guessed:

  pure        loop carries only the donated state; one sync at the end.
              This is the dispatch floor.
  lazylog     + keep every step's metrics dict alive (MetricLogger's
              log_dict_lazy buffering pattern) — tests whether holding
              small device buffers blocks donation/reuse.
  sync        + float(metrics["loss"]) every step — the worst-case
              readback pattern (the real loop syncs only every
              log-interval steps).
  hostrng     + jax.random.split on the HOST each step (the real loop
              folds on device; this measures what the naive pattern
              would cost).
  feed        + jax.device_put of a fresh numpy batch every step — the
              host->device input path the real loader pays.

    python -m cmr_agent_tpu.tools.train_probe [--batch 8] [--steps 30]

Prints one JSON line {variant: ms_per_step, ...} plus the modelled
residue split; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke; use the default kitti "
                         "config for the real TPU measurement)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import kitti_config, tiny_config
    from ..data.synthetic import SyntheticDataset
    from ..train.train_geo import create_geo_state, make_geo_train_step

    cfg = (tiny_config(compute_dtype=args.dtype) if args.tiny
           else kitti_config(compute_dtype=args.dtype))
    ds = SyntheticDataset(cfg, length=args.batch, seed=0)
    batch_np = {}
    sample0 = ds[0]
    for k in sample0:
        batch_np[k] = np.stack([ds[i][k] for i in range(args.batch)])
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}; batch {args.batch} {args.dtype}")
    batch = {k: jax.device_put(jnp.asarray(v), dev)
             for k, v in batch_np.items()}

    rng = jax.random.key(0)
    state = create_geo_state(cfg, batch, rng)
    step = make_geo_train_step(cfg)

    # warmup/compile (donation: keep reassigning state)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    np.asarray(metrics["loss"])          # readback sync (see timed())
    log(f"compile+first step {time.perf_counter() - t0:.1f}s")
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    np.asarray(metrics["loss"])

    results = {}

    def timed(name, body):
        nonlocal state
        t0 = time.perf_counter()
        out = body()
        # device->host readback, NOT block_until_ready: on this runtime
        # block_until_ready returns before execution completes (the
        # round-4 probe numbers measured dispatch only — 13 ms/"step" for
        # a 130 ms program). A scalar copy cannot lie.
        np.asarray(out)
        ms = (time.perf_counter() - t0) * 1e3 / args.steps
        results[name] = round(ms, 2)
        log(f"{name:10s} {ms:8.2f} ms/step")

    def pure():
        nonlocal state
        m = None
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        return m["loss"]
    timed("pure", pure)

    def lazylog():
        nonlocal state
        kept = []
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
            kept.append(m)
        return kept[-1]["loss"]
    timed("lazylog", lazylog)

    def sync():
        nonlocal state
        tot = 0.0
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
            tot += float(m["loss"])
        return jnp.zeros(())
    timed("sync", sync)

    def hostrng():
        nonlocal state
        r = rng
        m = None
        for _ in range(args.steps):
            r, sub = jax.random.split(r)
            state, m = step(state, batch, sub)
        return m["loss"]
    timed("hostrng", hostrng)

    def feed():
        nonlocal state
        m = None
        for _ in range(args.steps):
            b = {k: jax.device_put(jnp.asarray(v), dev)
                 for k, v in batch_np.items()}
            state, m = step(state, b, rng)
        return m["loss"]
    timed("feed", feed)

    base = results["pure"]
    split = {k: round(v - base, 2) for k, v in results.items() if k != "pure"}
    print(json.dumps({"ms_per_step": results, "residue_vs_pure_ms": split,
                      "batch": args.batch, "dtype": args.dtype}))


if __name__ == "__main__":
    main()
