"""Evaluation metrics + metric logging.

Registration metrics per reference Test_Agent.py:193-206: recall mask
(RTE < 5 m AND RRE < 10 deg), then RTE/RRE mean/std over recalled samples.
MetricLogger wraps tensorboardX when available (the reference logs the same
scalars, Train_Geo.py:144-184) and always keeps an in-memory history.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def registration_metrics(rte: np.ndarray, rre: np.ndarray,
                         rte_thresh: float = 5.0,
                         rre_thresh: float = 10.0) -> Dict[str, float]:
    rte = np.asarray(rte, dtype=np.float64)
    rre = np.asarray(rre, dtype=np.float64)
    mask = (rte < rte_thresh) & (rre < rre_thresh)
    out = {"registration_recall": float(mask.sum() / max(mask.size, 1))}
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
        self._writer = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter
                self._writer = SummaryWriter(log_dir=logdir)
            except Exception:
                self._writer = None

    def log(self, tag: str, value, step: int) -> None:
        self.history.setdefault(tag, []).append((step, float(value)))
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), global_step=step)

    def log_dict(self, metrics: Dict, step: int, prefix: str = "") -> None:
        for k, v in metrics.items():
            self.log(prefix + k, v, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
