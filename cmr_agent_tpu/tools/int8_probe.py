"""int8 activation-storage probe for the 40960-point dense stacks.

SURVEY.md §7 step 9 named an int8 experiment on the bandwidth-bound point
stacks; VERDICT r2 asked for a measured accept/reject note. This probe
isolates the representative subgraph — the per-point Dense/BN/LeakyReLU
chains that dominate the episode's HBM traffic (docs/DESIGN.md: the
non-conv, non-scan remainder of the 52 ms iteration) — and times three
storage strategies for the inter-layer [B, N, F] tensors:

  bf16   activations stored bf16 (the shipped design);
  int8   activations quantised to int8 *at layer boundaries* (fixed
         power-of-two scale, symmetric), matmuls still bf16 — isolates
         the HBM-traffic effect of halving the stored bytes;
  int8mm activations stored int8 AND the matmul executed in int8xint8
         with per-output-channel weight scales (preferred_element_type
         int32) — adds the MXU int8 rate (2x bf16 on v5e) on top.

The probe reports ms/iter for each and the implied episode-level gain if
the measured stack share (~27 ms of 52 ms at B=8) scaled the same way.
It is a *perf ceiling* probe: the fixed activation scale is calibration-
free, so accuracy is NOT evaluated here — integration would need a
calibration pass plus the parity suite. Run on the TPU::

    python -m cmr_agent_tpu.tools.int8_probe [--batch 8] [--iters 30]

Prints one JSON line; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _chain_params(rng, layers, f_in, f_out):
    ws, bs = [], []
    fi = f_in
    for _ in range(layers):
        ws.append(rng.normal(size=(fi, f_out), scale=fi ** -0.5))
        bs.append(rng.normal(size=(f_out,), scale=0.01))
        fi = f_out
    return ws, bs


def build_fns(batch, n, f, layers):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ws_np, bs_np = _chain_params(rng, layers, f, f)
    x_np = rng.normal(size=(batch, n, f)).astype(np.float32)

    ws = [jnp.asarray(w, jnp.bfloat16) for w in ws_np]
    bs = [jnp.asarray(b, jnp.bfloat16) for b in bs_np]
    x0 = jnp.asarray(x_np, jnp.bfloat16)

    def leaky(x):
        return jnp.where(x > 0, x, 0.2 * x)

    # fixed symmetric scale: activations after LeakyReLU at this init sit
    # in ~[-4, 4]; 1/16 quantum keeps clipping negligible for the probe
    ACT_S = 16.0

    def q8(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) * ACT_S),
                        -127, 127).astype(jnp.int8)

    def dq8(x8):
        return (x8.astype(jnp.float32) * (1.0 / ACT_S)).astype(jnp.bfloat16)

    def fwd_bf16(x, shift):
        x = x + shift.astype(x.dtype)
        for w, b in zip(ws, bs):
            x = leaky(jnp.dot(x, w) + b)
        return x

    def fwd_int8_store(x, shift):
        x = x + shift.astype(x.dtype)
        x8 = q8(x)
        for w, b in zip(ws, bs):
            x = leaky(jnp.dot(dq8(x8), w) + b)
            x8 = q8(x)            # stored boundary tensor is int8
        return dq8(x8)

    # int8 x int8 matmul with per-output-channel weight scales
    w8s = []
    for w in ws_np:
        s = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
        w8s.append((jnp.asarray(np.round(w / s), jnp.int8),
                    jnp.asarray(s, jnp.float32)))

    def fwd_int8_mm(x, shift):
        import jax.lax as lax
        x = x + shift.astype(x.dtype)
        x8 = q8(x)
        for (w8, s), b in zip(w8s, bs):
            acc = lax.dot_general(
                x8, w8, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (s[None, None, :] / ACT_S)
            x8 = q8(leaky(y.astype(jnp.bfloat16) + b))
        return dq8(x8)

    return x0, {"bf16": fwd_bf16, "int8": fwd_int8_store,
                "int8mm": fwd_int8_mm}


def time_fn(fn, x, iters, warmup=5):
    import jax
    import jax.numpy as jnp

    def step(x, shift):
        out = fn(x, shift)
        return jnp.mean(out.astype(jnp.float32)) * 1e-12

    compiled = jax.jit(step).lower(x, jnp.zeros((), jnp.float32)).compile()
    shift = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        shift = compiled(x, shift)
    float(shift)                       # readback = hard sync (axon runtime)
    t0 = time.perf_counter()
    for _ in range(iters):
        shift = compiled(x, shift)
    float(shift)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=40960)
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--layers", type=int, default=9,
                   help="Dense/BN/LReLU layers at N points: raw_mlp(3) + "
                        "point_mlp_0(3) + point_mlp_1(3)")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    from cmr_agent_tpu.cli.common import host_feature_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      host_feature_cache_dir("/tmp/cmr_jax_cache"))
    x, fns = build_fns(args.batch, args.n, args.f, args.layers)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind!r}; x {x.shape} {x.dtype}; "
        f"{args.layers} layers")

    ms = {}
    for name, fn in fns.items():
        ms[name] = time_fn(fn, x, args.iters)
        log(f"{name:7s} {ms[name]:7.2f} ms/iter")

    # episode-level implication at B=8: stacks ~= 27 ms of the 52 ms iter
    stack_ms, iter_ms = 27.0, 52.0
    proj = {}
    for name in ("int8", "int8mm"):
        scaled = stack_ms * ms[name] / ms["bf16"]
        proj[name] = iter_ms / (iter_ms - stack_ms + scaled)
    print(json.dumps({
        "bf16_ms": round(ms["bf16"], 3),
        "int8_ms": round(ms["int8"], 3),
        "int8mm_ms": round(ms["int8mm"], 3),
        "int8_speedup": round(ms["bf16"] / ms["int8"], 3),
        "int8mm_speedup": round(ms["bf16"] / ms["int8mm"], 3),
        "projected_episode_gain_int8": round(proj["int8"], 3),
        "projected_episode_gain_int8mm": round(proj["int8mm"], 3),
    }))


if __name__ == "__main__":
    main()
