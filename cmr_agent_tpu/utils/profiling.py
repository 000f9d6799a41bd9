"""Profiling and tracing hooks.

The reference's only observability is ad-hoc ``time.time()`` wall-clocks
(Test_Agent.py:151,193-201) and a ``timeit`` print helper
(models/pointnet_util.py:8-10). Here:

* :class:`PhaseTimer` — named phase accumulation with device
  synchronisation (a host readback; on this runtime ``block_until_ready``
  alone does not guarantee completion).
* :func:`trace_context` — ``jax.profiler`` trace capture around a code
  region, viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x=None) -> None:
    """Hard synchronisation: force a scalar host readback.

    ``jax.block_until_ready`` is insufficient on runtimes with deferred
    remote execution; reading a value back is the only reliable barrier.
    """
    if x is None:
        x = jnp.zeros(())
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


class PhaseTimer:
    """Accumulate wall time per named phase.

    Example::

        timer = PhaseTimer(sync=True)
        with timer("geo_forward"):
            out = fwd(params, batch)
        print(timer.report())
    """

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._last_result = None

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync:
            device_sync(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t:8.3f}s total  {t / c * 1e3:8.2f}ms/call"
                         f"  x{c}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
    """jax.profiler trace capture (no-op when ``logdir`` is falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
