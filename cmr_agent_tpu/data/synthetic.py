"""Synthetic scene generator for tests and benchmarks.

No reference analog (the reference has no test suite, SURVEY.md §4). Emits
raw (img, pc_cam, K) triplets that are geometrically consistent — a
structured cloud in front of a pinhole camera with a matching gradient
image — and runs them through the exact shared geometry pipeline, so every
downstream component (masks, circle-loss sampling, episode engine, cost
volume) is exercised with realistic statistics without KITTI on disk.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import Config
from .pipeline import build_geometry_sample


def make_synthetic_raw(rng: np.random.Generator, img_h: int, img_w: int,
                       num_pt: int):
    """Random scene: ~60% of points inside the frustum, the rest around it.

    Returns ``(img [H,W,3] float32 in [0,1], pc_cam [N,3], K [3,3])`` with
    ``K`` already at the 1/4 PnP scale of (img_h, img_w).
    """
    h4, w4 = img_h // 4, img_w // 4
    f = 1.2 * w4
    K = np.array([[f, 0, w4 / 2], [0, f, h4 / 2], [0, 0, 1]], np.float64)

    n_in = int(num_pt * 0.6)
    z = rng.uniform(2.0, 40.0, size=n_in)
    u = rng.uniform(0, w4 - 1, size=n_in)
    v = rng.uniform(0, h4 - 1, size=n_in)
    x = (u - K[0, 2]) * z / K[0, 0]
    y = (v - K[1, 2]) * z / K[1, 1]
    inside = np.stack([x, y, z], axis=1)

    n_out = num_pt - n_in
    outside = rng.normal(size=(n_out, 3)) * np.array([15.0, 3.0, 15.0])
    outside[:, 2] += 5.0
    pc = np.concatenate([inside, outside], axis=0)
    pc = pc[rng.permutation(num_pt)]

    yy, xx = np.mgrid[0:img_h, 0:img_w]
    img = np.stack([xx / img_w, yy / img_h,
                    (xx + yy) / (img_h + img_w)], axis=-1)
    img = (img + 0.1 * rng.random((img_h, img_w, 3))).clip(0, 1)
    return img.astype(np.float32), pc, K


class SyntheticDataset:
    """Map-style synthetic dataset running the real geometry pipeline."""

    def __init__(self, cfg: Config, length: int = 64, seed: int = 0,
                 fps_fn=None, nn_fn=None):
        self.cfg = cfg
        self.length = length
        self.seed = seed
        self.fps_fn = fps_fn
        self.nn_fn = nn_fn
        self._epoch = 0

    def __len__(self) -> int:
        return self.length

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        # epoch folds into the stream like the real datasets (kitti.py:117);
        # epoch 0 keeps the historical (seed, index) key so fixed-seed
        # benchmarks/demos are unchanged
        key = ((self.seed, index) if self._epoch == 0
               else (self.seed, self._epoch, index))
        rng = np.random.default_rng(key)
        img, pc, K = make_synthetic_raw(rng, cfg.cropped_img_h,
                                        cfg.cropped_img_w, cfg.num_pt)
        return build_geometry_sample(
            rng, img, pc, K,
            num_node=cfg.num_node,
            circle_loss_num=cfg.circle_loss_num,
            t_amplitude=(cfg.p_tx_amplitude, cfg.p_ty_amplitude,
                         cfg.p_tz_amplitude),
            r_amplitude=(cfg.p_rx_amplitude, cfg.p_ry_amplitude,
                         cfg.p_rz_amplitude),
            nlabel=cfg.nlabel,
            fps_fn=self.fps_fn, nn_fn=self.nn_fn,
            knn_k=cfg.knn_k if cfg.use_gnn_embedding else 0)
