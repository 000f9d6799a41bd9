"""Benchmark: KITTI-scale registration episodes (geo forward + 10 agent
steps) — image-PC pairs/sec/chip.

This is the reference's north-star workload (Test_Agent.py:149-191: one-shot
feature extraction then 10 refinement actions per pair, SURVEY.md §3.3),
here compiled as a single on-device program.

``vs_baseline``: the north star is >=5x PyTorch-CPU pairs/sec/chip
(BASELINE.json). The denominator is the REAL reference — /root/reference's
own torch code run on this host's CPU via tools/reference_shim.py under the
reference's own Test_Agent protocol — measured by
``python -m cmr_agent_tpu.tools.torch_cpu_baseline`` and cached in
``TORCH_CPU_BASELINE.json`` (re-measuring a minutes-long CPU run inside
every bench would burn the bench's wall budget). vs_baseline = tpu_rate /
torch_cpu_rate. Set ``CMR_BENCH_XLA_CPU=1`` to additionally measure the
old XLA-CPU stand-in (reported as ``vs_xla_cpu``).

Hang-proofing (VERDICT r3, missing #1): one global watchdog covers EVERY
phase — device listing, variable init, compile, first execution, warmup,
timed blocks. If the total wall exceeds ``CMR_BENCH_TOTAL_BUDGET`` (default
460 s) the watchdog prints a JSON line naming the wedged phase — with the
best partial rate if at least one timed block finished, else value null —
and exits. The driver therefore always gets a parseable line, never a bare
rc=124.

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
import threading
import time

import numpy as np

METRIC = "kitti_episode_pairs_per_sec_per_chip"


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# watchdog: every phase is covered; timeout emits JSON and exits
# --------------------------------------------------------------------------

_T0 = time.perf_counter()
_STATE = {"phase": "startup", "rates": [], "baseline": None, "done": False}
_LOCK = threading.Lock()


def phase(msg: str):
    with _LOCK:
        _STATE["phase"] = msg
    log(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}")


def _emit(value, vs_baseline, extra=None):
    out = {"metric": METRIC,
           "value": round(value, 4) if value is not None else None,
           "unit": "pairs/s",
           "vs_baseline": round(vs_baseline, 3) if vs_baseline else None}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def _vs(rate, baseline):
    return (rate / baseline["pairs_per_sec"]) if (rate and baseline) else None


def _watchdog(budget_s: float):
    while True:
        remaining = budget_s - (time.perf_counter() - _T0)
        if remaining <= 0:
            break
        with _LOCK:
            if _STATE["done"]:
                return
        time.sleep(min(5.0, remaining))
    with _LOCK:
        if _STATE["done"]:
            return
        wedged, rates = _STATE["phase"], list(_STATE["rates"])
        baseline = _STATE["baseline"]
    log(f"WATCHDOG: total budget {budget_s:.0f}s exceeded in phase "
        f"{wedged!r}; {len(rates)} timed blocks completed")
    rate = float(np.median(rates)) if rates else None
    _emit(rate, _vs(rate, baseline), {
        "error": f"budget {budget_s:.0f}s exceeded in phase: {wedged}",
        "partial": True, "timed_blocks_completed": len(rates)})
    os._exit(3)


# --------------------------------------------------------------------------
# workload
# --------------------------------------------------------------------------

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
                 repeats: int = 1, record_blocks: bool = False):
    """Returns (per-repeat rates, compile_s, cost_analysis dict or None).

    Steady-state discipline: one compile + ``warmup`` iterations are
    discarded, then ``repeats`` independently-timed blocks of ``iters``
    iterations run back-to-back — the caller takes the median block rate,
    so a single slow block (tunnel hiccup, host contention) cannot set the
    headline number (VERDICT r2 weak #1). With ``record_blocks`` each
    finished block's rate lands in the watchdog's partial-result store.
    """
    import jax
    import jax.numpy as jnp

    batch_np, build_vars, episode = build_workload(cfg, batch_size)

    def step(gv, av, batch, shift):
        final = episode(gv, av, batch, shift)
        # scalar carried into the next iteration (serial dependency) —
        # numerically negligible (~1e-11) but not removable by the compiler
        return jnp.mean(final) * 1e-12

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
        phase(f"warmup ({warmup} iters)")
        shift = zero
        for _ in range(warmup):
            shift = compiled(gv, av, batch, shift)
        float(shift)
        rates = []
        for r in range(repeats):
            phase(f"timed block {r + 1}/{repeats}")
            t0 = time.perf_counter()
            for _ in range(iters):
                shift = compiled(gv, av, batch, shift)
            float(shift)  # host readback = hard synchronisation
            rates.append(batch_size * iters / (time.perf_counter() - t0))
            if record_blocks:
                with _LOCK:
                    _STATE["rates"] = list(rates)
    return rates, compile_s, cost


def main():
    # 800 s: a COLD compile of the episode program on the remote compile
    # service measured >460 s once (round 5, first run after the int8
    # default flip); warm-cache runs finish in ~55 s total.
    budget = float(os.environ.get("CMR_BENCH_TOTAL_BUDGET", "800"))
    threading.Thread(target=_watchdog, args=(budget,), daemon=True).start()

    phase("import jax")
    import jax
    from cmr_agent_tpu.config import kitti_config
    from cmr_agent_tpu.tools.torch_cpu_baseline import load_cached

    # Persistent compile cache: the remote compile service's first
    # compilation in a process costs minutes; caching cuts repeat runs.
    try:
        from cmr_agent_tpu.cli.common import host_feature_cache_dir
        jax.config.update("jax_compilation_cache_dir",
                          host_feature_cache_dir("/tmp/cmr_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dtype = os.environ.get("CMR_BENCH_DTYPE", "bfloat16")
    overrides = {}
    if os.environ.get("CMR_BENCH_RASTER_MODE"):     # A/B hook
        overrides["raster_mode"] = os.environ["CMR_BENCH_RASTER_MODE"]
    if os.environ.get("CMR_BENCH_RASTER_INT8") == "1":
        overrides["raster_int8"] = True
    if os.environ.get("CMR_BENCH_OBS3D") :      # A/B hook: "compact"
        overrides["obs3d_source"] = os.environ["CMR_BENCH_OBS3D"]
    cfg = kitti_config(compute_dtype=dtype, **overrides)

    baseline = load_cached()
    with _LOCK:
        _STATE["baseline"] = baseline
    if baseline:
        log(f"torch-CPU baseline: {baseline['pairs_per_sec']:.4f} pairs/s "
            f"({baseline['implementation']}; measured "
            f"{(time.time() - baseline['measured_unix_time']) / 3600:.1f} h "
            "ago; refresh: python -m cmr_agent_tpu.tools.torch_cpu_baseline)")
    else:
        log("no TORCH_CPU_BASELINE.json — vs_baseline will be null "
            "(run python -m cmr_agent_tpu.tools.torch_cpu_baseline)")

    # a dead/wedged device grant makes jax.devices() block forever
    # (claim_timeout -1) — covered by the global watchdog
    phase("list devices (tunnel grant)")
    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    cpu_devices = jax.devices("cpu")
    log(f"devices listed: {[d.device_kind for d in tpu_devices]} "
        f"+ {len(cpu_devices)} cpu")

    extra = {}
    if tpu_devices:
        dev = tpu_devices[0]
        bsz = 8
        # iters=25/block: at ~50 ms/iter a 10-iter block was ~0.5 s and the
        # artifact's block spread (+-3%, BENCH_r04) could not resolve the
        # +1.5-3% kernel gains being claimed; 25 iters keeps 5 blocks well
        # inside the driver budget and tightens the spread (VERDICT r4 #7).
        rates, tpu_compile, cost = time_backend(
            dev, cfg, batch_size=bsz, iters=25, warmup=3, repeats=5,
            record_blocks=True)
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
            cpu_devices[0], cfg, batch_size=2, iters=2, warmup=1,
            record_blocks=True)
        tpu_rate = float(np.median(rates))
        log(f"no TPU found; CPU stand-in rate {tpu_rate:.3f} pairs/s")
        extra["note"] = "no TPU device; rate is the XLA-CPU stand-in"

    if os.environ.get("CMR_BENCH_XLA_CPU") == "1":
        # legacy stand-in denominator, off by default (it costs minutes of
        # CPU compile + execution inside the bench budget)
        try:
            cpu_rates, _, _ = time_backend(cpu_devices[0], cfg, batch_size=1,
                                           iters=2, warmup=1, repeats=2)
            xla_cpu = float(np.median(cpu_rates))
            log(f"XLA-CPU stand-in: {xla_cpu:.4f} pairs/s")
            extra["vs_xla_cpu"] = round(tpu_rate / xla_cpu, 3)
        except Exception as e:
            log(f"XLA-CPU stand-in unavailable ({type(e).__name__}: {e})")

    if baseline:
        extra["torch_cpu_pairs_per_sec"] = baseline["pairs_per_sec"]
        extra["baseline_source"] = ("reference torch code on this host CPU "
                                    "(TORCH_CPU_BASELINE.json, tools/"
                                    "torch_cpu_baseline.py)")
    # the artifact must prove WHICH config it measured (VERDICT r4 #7)
    extra["config"] = {"raster_mode": cfg.raster_mode,
                       "raster_int8": cfg.raster_int8,
                       "obs3d_source": cfg.obs3d_source,
                       "compute_dtype": cfg.compute_dtype}
    if rates:
        extra["block_pairs_per_sec"] = [round(float(r), 3) for r in rates]
    with _LOCK:
        _STATE["done"] = True
    _emit(tpu_rate, _vs(tpu_rate, baseline), extra)


if __name__ == "__main__":
    main()
