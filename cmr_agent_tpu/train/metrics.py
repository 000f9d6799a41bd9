"""Evaluation metrics + metric logging.

Registration metrics per reference Test_Agent.py:193-206: recall mask
(RTE < 5 m AND RRE < 10 deg), then RTE/RRE mean/std over recalled samples.
MetricLogger wraps tensorboardX when available (the reference logs the same
scalars, Train_Geo.py:144-184) and always keeps an in-memory history.
"""

from __future__ import annotations

import atexit
import weakref
from typing import Dict, List, Optional

import numpy as np


def registration_metrics(rte: np.ndarray, rre: np.ndarray,
                         rte_thresh: float = 5.0,
                         rre_thresh: float = 10.0) -> Dict[str, float]:
    rte = np.asarray(rte, dtype=np.float64)
    rre = np.asarray(rre, dtype=np.float64)
    mask = (rte < rte_thresh) & (rre < rre_thresh)
    out = {"registration_recall": float(mask.sum() / max(mask.size, 1)),
           # medians over ALL samples (not only recalled): the demo's
           # half-solved-vs-uniformly-stuck diagnostic (CONVERGENCE.md
           # section 9); the reference reports only recalled-mean/std
           "rte_median_all": float(np.median(rte)) if rte.size else
           float("nan"),
           "rre_median_all": float(np.median(rre)) if rre.size else
           float("nan")}
    if mask.any():
        out.update(rte_mean=float(rte[mask].mean()),
                   rte_std=float(rte[mask].std()),
                   rre_mean=float(rre[mask].mean()),
                   rre_std=float(rre[mask].std()))
    else:
        out.update(rte_mean=float("nan"), rte_std=float("nan"),
                   rre_mean=float("nan"), rre_std=float("nan"))
    return out


class MetricLogger:
    """Scalar logger: in-memory history + optional tensorboardX backend."""

    def __init__(self, logdir: Optional[str] = None):
        self.history: Dict[str, List] = {}
        self._pending: List = []
        self._writer = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter
                self._writer = SummaryWriter(log_dir=logdir)
            except Exception:
                self._writer = None
        # Crash-safe flush: an abnormal exit (unhandled exception, step-cap
        # miscount, SIGTERM-handled shutdown) would otherwise drop up to
        # FLUSH_EVERY lazily-buffered entries — exactly the steps a crash
        # triage needs. Registered via weakref so the hook never extends
        # the logger's lifetime; a SIGKILL/OOM still loses the window.
        atexit.register(_flush_at_exit, weakref.ref(self))

    def log(self, tag: str, value, step: int) -> None:
        self.history.setdefault(tag, []).append((step, float(value)))
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), global_step=step)

    def log_dict(self, metrics: Dict, step: int, prefix: str = "") -> None:
        for k, v in metrics.items():
            self.log(prefix + k, v, step)

    # ---- lag-buffered logging -------------------------------------------
    # On remote-dispatch runtimes any host read (float()) drains the device
    # pipeline (docs/DESIGN.md), so training loops enqueue device scalars
    # here and the readback happens a flush interval late, when the values
    # are already resident. `steps_axis=True` logs a dict of stacked [S]
    # arrays (from make_geo_multi_step) as S consecutive steps with ONE
    # readback per key.

    FLUSH_EVERY = 32

    def log_dict_lazy(self, metrics: Dict, step: int, prefix: str = "",
                      steps_axis: bool = False) -> None:
        self._pending.append((metrics, step, prefix, steps_axis))
        if len(self._pending) >= self.FLUSH_EVERY:
            self.flush()

    def flush(self) -> None:
        for metrics, step, prefix, steps_axis in self._pending:
            vals = {k: np.asarray(v) for k, v in metrics.items()}
            if steps_axis:
                s = next(iter(vals.values())).shape[0]
                for i in range(s):
                    self.log_dict({k: float(v[i]) for k, v in vals.items()},
                                  step + i, prefix)
            else:
                self.log_dict({k: float(v) for k, v in vals.items()},
                              step, prefix)
        self._pending.clear()

    def close(self) -> None:
        self.flush()
        if self._writer is not None:
            self._writer.close()


def _flush_at_exit(ref) -> None:
    logger = ref()
    if logger is not None:
        try:
            logger.flush()
        except Exception:
            pass  # device backend may already be torn down at exit
