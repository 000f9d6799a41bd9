"""Benchmark: KITTI-scale registration episodes (geo forward + 10 agent
steps) — image-PC pairs/sec/chip.

This is the reference's north-star workload (Test_Agent.py:149-191: one-shot
feature extraction then 10 refinement actions per pair, SURVEY.md §3.3),
here compiled as a single on-device program.

``vs_baseline``: the north star is >=5x PyTorch-CPU pairs/sec/chip
(BASELINE.json). The reference cannot run here (its torch_scatter CUDA dep
is absent), so the baseline denominator is the same workload executed by
the XLA CPU backend on this host — a generous stand-in for the torch CPU
reference (same math, compiled). vs_baseline = tpu_rate / cpu_rate.

Compute dtype: defaults to bfloat16 activations (the idiomatic TPU serving
configuration; params, BN stats, geo features and logits stay float32 —
measured +43% over f32 with ~0.05% loss delta). Override with
``CMR_BENCH_DTYPE=float32``.

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_workload(cfg, batch_size: int):
    import jax
    import jax.numpy as jnp
    from cmr_agent_tpu.data import SyntheticDataset, collate
    from cmr_agent_tpu.models import MultiHeadModel, CMRAgent
    from cmr_agent_tpu.env import init_poses, run_episode
    from cmr_agent_tpu.ops import to_disentangled

    ds = SyntheticDataset(cfg, length=batch_size)
    batch_np = collate([ds[i] for i in range(batch_size)])

    model = MultiHeadModel(cfg)
    agent = CMRAgent(cfg)

    def build_vars(batch):
        g_init = jax.jit(lambda rngs, b: model.init(rngs, b, train=False,
                                                    with_loss=False))
        gv = g_init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, batch)
        h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
        a_init = jax.jit(lambda r, o2, o3: agent.init({"params": r}, o2, o3,
                                                      train=False))
        av = a_init(jax.random.key(2),
                    jnp.zeros((batch_size, h, w, 2 * f)),
                    jnp.zeros((batch_size, cfg.num_pt, 5)))
        return gv, av

    def episode(gv, av, batch, shift):
        # ``shift`` (a scalar derived from the previous iteration's result)
        # forces a serial dependency between timing iterations: the axon
        # remote runtime does not synchronise on block_until_ready, so
        # independent calls would overlap/defer and inflate throughput.
        batch = dict(batch, pc=batch["pc"] + shift)
        out = model.apply(gv, batch, train=False, with_loss=False)
        state = {
            "pc": out["pc"],
            "K": batch["K"],
            "pc_overlap_pred": out["pc_overlap_pred"],
            "pc_geo_feat": out["pc_geo_feat"],
            "img_geo_feat": out["img_geo_feat"],
            "pc_in_cam_space": batch["pc_in_cam_space"],
            "pc_mask": batch["pc_mask"],
            "P": batch["P"],
        }
        pose_src, pose_tgt = init_poses(state)
        pose_tgt = to_disentangled(pose_tgt, state["pc"])

        def apply_fn(avars, o2, o3):
            return agent.apply(avars, o2, o3, train=False)

        topk = cfg.episode_raster_topk()
        final, _ = run_episode(apply_fn, av, state, pose_src, pose_tgt, cfg,
                               deterministic=True, raster_topk=topk)
        return final

    return batch_np, build_vars, episode


#: dense bf16 peak FLOP/s per chip by device kind substring (public specs)
PEAK_FLOPS = (("v6e", 918e12), ("v5p", 459e12), ("v5e", 197e12),
              ("v5litepod", 197e12), ("v5 lite", 197e12), ("v4", 275e12),
              ("v3", 123e12), ("v2", 45e12))


def peak_flops_for(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in PEAK_FLOPS:
        if sub in kind:
            return peak
    return None


def time_backend(device, cfg, batch_size: int, iters: int, warmup: int,
                 repeats: int = 1):
    """Returns (per-repeat rates, compile_s, cost_analysis dict or None).

    Steady-state discipline: one compile + ``warmup`` iterations are
    discarded, then ``repeats`` independently-timed blocks of ``iters``
    iterations run back-to-back — the caller takes the median block rate,
    so a single slow block (tunnel hiccup, host contention) cannot set the
    headline number (VERDICT r2 weak #1).
    """
    import jax
    import jax.numpy as jnp

    batch_np, build_vars, episode = build_workload(cfg, batch_size)

    def step(gv, av, batch, shift):
        final = episode(gv, av, batch, shift)
        # scalar carried into the next iteration (serial dependency) —
        # numerically negligible (~1e-11) but not removable by the compiler
        return jnp.mean(final) * 1e-12

    # Phase breadcrumbs: a wedged remote grant/compile service stalls with
    # no output otherwise (observed: 20 min of silence after device
    # listing) — the last line printed tells the caller WHICH phase hung.
    t_p = time.perf_counter()
    phase = lambda m: log(f"[bench +{time.perf_counter() - t_p:.0f}s] {m}")
    with jax.default_device(device):
        phase(f"device_put batch on {device.platform}")
        batch = {k: jax.device_put(jnp.asarray(v), device)
                 for k, v in batch_np.items()}
        phase("init model/agent variables (first device compile)")
        gv, av = build_vars(batch)
        zero = jnp.zeros((), jnp.float32)
        t_c0 = time.perf_counter()
        phase("compile episode program")
        compiled = jax.jit(step).lower(gv, av, batch, zero).compile()
        try:
            ca = compiled.cost_analysis()
            cost = ca[0] if isinstance(ca, (list, tuple)) else ca
        except Exception:
            cost = None
        phase("first execution")
        float(compiled(gv, av, batch, zero))  # readback = real execution
        compile_s = time.perf_counter() - t_c0
        phase(f"warmup + {repeats} timed blocks")
        shift = zero
        for _ in range(warmup):
            shift = compiled(gv, av, batch, shift)
        float(shift)
        rates = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                shift = compiled(gv, av, batch, shift)
            float(shift)  # host readback = hard synchronisation
            rates.append(batch_size * iters / (time.perf_counter() - t0))
    return rates, compile_s, cost


def main():
    import jax
    from cmr_agent_tpu.config import kitti_config

    # Persistent compile cache: the remote compile service's first
    # compilation in a process costs minutes; caching cuts repeat runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cmr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dtype = os.environ.get("CMR_BENCH_DTYPE", "bfloat16")
    cfg = kitti_config(compute_dtype=dtype)

    # Watchdog: a dead/wedged device grant makes jax.devices() block
    # forever (claim_timeout -1; observed after a client was killed
    # mid-step). Emit an explicit error line instead of hanging the
    # caller. Generous default: per-process runtime warm-up through the
    # tunnel is ~1-5 min when healthy.
    import threading
    init_done = threading.Event()
    timeout_s = float(os.environ.get("CMR_BENCH_DEVICE_TIMEOUT", "900"))

    def _watchdog():
        if not init_done.wait(timeout_s):
            log(f"device initialization exceeded {timeout_s:.0f}s — "
                "wedged device grant?")
            print(json.dumps({
                "metric": "kitti_episode_pairs_per_sec_per_chip",
                "value": None, "unit": "pairs/s", "vs_baseline": None,
                "error": f"device init timed out after {timeout_s:.0f}s",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    cpu_devices = jax.devices("cpu")
    init_done.set()
    log(f"devices listed: {[d.device_kind for d in tpu_devices]} "
        f"+ {len(cpu_devices)} cpu")

    if tpu_devices:
        dev = tpu_devices[0]
        bsz = 8
        rates, tpu_compile, cost = time_backend(
            dev, cfg, batch_size=bsz, iters=10, warmup=3, repeats=5)
        tpu_rate = float(np.median(rates))
        log(f"TPU ({dtype}, {dev.device_kind!r}): median {tpu_rate:.3f} "
            f"pairs/s over {len(rates)} blocks "
            f"[{min(rates):.1f}..{max(rates):.1f}] "
            f"(compile {tpu_compile:.1f}s)")
        if cost and cost.get("flops"):
            flops = float(cost["flops"]) / bsz        # per pair
            achieved = flops * tpu_rate
            peak = peak_flops_for(dev)
            mfu = f", MFU {100 * achieved / peak:.1f}% of " \
                  f"{peak / 1e12:.0f} TF peak ({dev.device_kind})" \
                  if peak else ""
            log(f"cost model: {flops / 1e9:.2f} GFLOP/pair, achieved "
                f"{achieved / 1e12:.2f} TFLOP/s{mfu}")
            ba = cost.get("bytes accessed")
            if ba:
                log(f"HBM traffic model: {float(ba) / bsz / 1e6:.1f} MB/pair "
                    f"-> {float(ba) / bsz * tpu_rate / 1e9:.0f} GB/s achieved")
    else:
        rates, tpu_compile, _ = time_backend(
            cpu_devices[0], cfg, batch_size=2, iters=2, warmup=1)
        tpu_rate = float(np.median(rates))
        log(f"no TPU found; CPU stand-in rate {tpu_rate:.3f} pairs/s")

    try:
        # warmup=1 + median of 2 timed blocks: the round-2 artifact showed
        # the cold single-iteration denominator drifting 0.171->0.196
        # pairs/s run-to-run, which moved vs_baseline by ~15%
        cpu_rates, _, _ = time_backend(cpu_devices[0], cfg, batch_size=1,
                                       iters=2, warmup=1, repeats=2)
        cpu_rate = float(np.median(cpu_rates))
        log(f"CPU baseline: {cpu_rate:.4f} pairs/s")
    except Exception as e:  # CPU backend may be absent under some runtimes
        log(f"CPU baseline unavailable ({type(e).__name__}: {e})")
        cpu_rate = None

    vs_baseline = (tpu_rate / cpu_rate) if cpu_rate else None
    print(json.dumps({
        "metric": "kitti_episode_pairs_per_sec_per_chip",
        "value": round(tpu_rate, 4),
        "unit": "pairs/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
