"""Fixed-seed golden capture of the reference ``__getitem__`` + replay.

The reference's per-sample host pipeline
(/root/reference/dataset/KittiDataset.py:258-423) chains numpy / python /
torchvision RNG in an order that is impractical to emulate bit-for-bit
(SURVEY.md §7 hard part (d)); the agreed strategy is to *capture* its
outputs once under fixed seeds and *replay* them through our pipeline and
models. This module is both halves:

capture (requires the reference's host deps — cv2/PIL — and a real
dataset on disk)::

    python -m cmr_agent_tpu.tools.goldens capture \
        --data-root /data/kitti --out goldens/kitti --num 16

replay (works anywhere)::

    python -m cmr_agent_tpu.tools.goldens replay --dir goldens/kitti

Each golden is one ``.npz`` holding the reference sample dict verbatim
(reference key names, channels-first layout) plus capture metadata.
``load_golden_as_sample`` converts a golden to OUR sample schema
(channels-last, int32 indices, the reconstructed keys the reference never
emitted — ``point_xy_float_all`` and the cost-volume labels), so a golden
drops into any loader/test in place of a dataset sample.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random

import numpy as np

#: keys the reference __getitem__ returns (KittiDataset.py:400-423)
REFERENCE_KEYS = (
    "img", "pc", "K", "P", "img_mask", "pc_mask",
    "pc_idx_for_circle_loss", "pc_xy_float_for_circle_loss",
    "pc_xy_int_for_circle_loss", "pc_in_cam_space", "pt2node", "node",
    "angles", "translation",
)


def capture_goldens(data_root: str, out_dir: str, num: int = 16,
                    mode: str = "test", seed: int = 2023,
                    dataset: str = "kitti") -> list:
    """Run the reference dataset under fixed per-sample seeds; dump .npz."""
    from .reference_shim import install_reference_imports
    install_reference_imports()
    import importlib

    if dataset == "kitti":
        cfg_mod = importlib.import_module("config.KittiConfig")
        ds_mod = importlib.import_module("dataset.KittiDataset")
        rcfg = cfg_mod.KittiConfiguration(data_root)
        ds = ds_mod.KittiDataset(rcfg, mode=mode)
    else:
        cfg_mod = importlib.import_module("config.NuScenesConfig")
        ds_mod = importlib.import_module("dataset.NuScenesDataset")
        rcfg = cfg_mod.NuScenesConfiguration(data_root)
        ds = ds_mod.NuScenesDataset(rcfg, mode=mode)

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n = min(num, len(ds))
    for i in range(n):
        # the reference seeds once per process (Test_Agent.py set_seed);
        # per-sample reseeding makes each golden independently reproducible
        random.seed(seed + i)
        np.random.seed(seed + i)
        try:
            import torch
            torch.manual_seed(seed + i)
        except ImportError:
            pass
        sample = ds[i]
        arrays = {k: np.asarray(v) for k, v in sample.items()}
        arrays["__meta__"] = np.frombuffer(json.dumps({
            "dataset": dataset, "mode": mode, "index": i,
            "seed": seed + i}).encode(), dtype=np.uint8)
        path = os.path.join(out_dir, f"golden_{mode}_{i:05d}.npz")
        np.savez_compressed(path, **arrays)
        paths.append(path)
        print(f"captured {path}")
    return paths


def load_golden_as_sample(path: str, nlabel: int = 9):
    """A golden .npz (reference layout) -> our sample schema.

    Layout changes: channels-last image, ``[N,3]`` clouds, int32 indices.
    Reconstructed keys (the reference never emitted them, SURVEY §2.4
    drift): ``point_xy_float_all`` re-projected from the stored cam-space
    cloud, and the cost-volume labels from the stored perturbation
    (``angles``/``translation``) with the KITTI ±10 m / ±π amplitudes.
    """
    from ..data.pipeline import cost_volume_labels

    g = dict(np.load(path, allow_pickle=False))
    g.pop("__meta__", None)

    pc_cam = g["pc_in_cam_space"].astype(np.float32)      # [3, N]
    K = g["K"].astype(np.float32)
    proj = K @ pc_cam
    # signed-z division, matching data/pipeline.py:project_and_masks —
    # behind-camera points (z<0, masked out by pc_mask downstream) keep
    # the same sign-flipped projections a pipeline sample would carry
    z = proj[2:3]
    xy_float = (proj[:2] / np.where(np.abs(z) < 1e-12, 1e-12, z)
                ).astype(np.float32)                       # [2, N]

    angles = g["angles"].astype(np.float32)
    translation = g["translation"].astype(np.float32)
    r_amp, t_amp = float(np.pi), 10.0   # KittiConfig.py:19-24
    label_r, label_tx, label_tz = cost_volume_labels(
        angles, translation, r_amp, t_amp, nlabel)

    return {
        "img": np.moveaxis(g["img"].astype(np.float32), 0, -1),
        "pc": np.ascontiguousarray(g["pc"].astype(np.float32).T),
        "K": K,
        "P": g["P"].astype(np.float32),
        "img_mask": g["img_mask"].astype(np.int32),
        "pc_mask": g["pc_mask"].astype(np.int32),
        "pc_idx_for_circle_loss":
            g["pc_idx_for_circle_loss"].astype(np.int32),
        "pc_xy_float_for_circle_loss":
            g["pc_xy_float_for_circle_loss"].astype(np.float32),
        "pc_xy_int_for_circle_loss":
            g["pc_xy_int_for_circle_loss"].astype(np.int32),
        "pc_in_cam_space": np.ascontiguousarray(pc_cam.T),
        "pt2node": g["pt2node"].astype(np.int32),
        "node": np.ascontiguousarray(g["node"].astype(np.float32).T),
        "angles": angles,
        "translation": translation,
        "point_xy_float_all": xy_float,
        "R_amplitude": np.float32(r_amp),
        "T_amplitude": np.float32(t_amp),
        "label_R": label_r,
        "label_T_x": label_tx,
        "label_T_z": label_tz,
    }


class GoldenDataset:
    """Map-style dataset over a directory of goldens — drops into
    ``DataLoader``/CLIs anywhere a real dataset would go."""

    gil_bound = False   # pure numpy load

    def __init__(self, golden_dir: str, nlabel: int = 9):
        self.paths = sorted(glob.glob(os.path.join(golden_dir,
                                                   "golden_*.npz")))
        if not self.paths:
            raise FileNotFoundError(f"no goldens under {golden_dir}")
        self.nlabel = nlabel

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        return load_golden_as_sample(self.paths[i], self.nlabel)


def fabricate_golden(path: str, *, num_pt=512, num_node=64, img_h=32,
                     img_w=64, circle=16, seed=0) -> str:
    """A synthetic golden in the exact reference .npz layout — keeps the
    replay path testable in environments without the reference's host deps
    or data (schema source: KittiDataset.py:400-423)."""
    rng = np.random.default_rng(seed)
    pc_cam = (rng.normal(size=(3, num_pt)) * 3 +
              np.array([[0.0], [0.0], [12.0]])).astype(np.float32)
    K = np.array([[80.0, 0, img_w / 2], [0, 80.0, img_h / 2], [0, 0, 1.0]],
                 dtype=np.float32)
    arrays = {
        "img": rng.uniform(0, 1, (3, img_h * 4, img_w * 4)
                           ).astype(np.float32),
        "pc": (rng.normal(size=(3, num_pt)) * 3).astype(np.float32),
        "K": K,
        "P": np.eye(4, dtype=np.float32),
        "img_mask": rng.integers(0, 2, (img_h, img_w)).astype(np.int64),
        "pc_mask": rng.integers(0, 2, num_pt).astype(np.int64),
        "pc_idx_for_circle_loss":
            rng.integers(0, num_pt, circle).astype(np.int64),
        "pc_xy_float_for_circle_loss":
            rng.uniform(0, img_w - 1, (2, circle)).astype(np.float32),
        "pc_xy_int_for_circle_loss":
            rng.integers(0, img_h, (2, circle)).astype(np.int64),
        "pc_in_cam_space": pc_cam,
        "pt2node": np.concatenate(
            [np.arange(num_node),
             rng.integers(0, num_node, num_pt - num_node)]
        ).astype(np.int64),
        "node": (rng.normal(size=(3, num_node)) * 3).astype(np.float32),
        "angles": rng.uniform(-1, 1, 3).astype(np.float32),
        "translation": rng.uniform(-5, 5, 3).astype(np.float32),
        "__meta__": np.frombuffer(json.dumps(
            {"dataset": "fabricated", "seed": seed}).encode(),
            dtype=np.uint8),
    }
    np.savez_compressed(path, **arrays)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("capture", help="dump reference __getitem__ goldens")
    c.add_argument("--data-root", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--num", type=int, default=16)
    c.add_argument("--mode", default="test")
    c.add_argument("--seed", type=int, default=2023)
    c.add_argument("--dataset", default="kitti",
                   choices=["kitti", "nuscenes"])

    r = sub.add_parser("replay", help="summarise goldens in our schema")
    r.add_argument("--dir", required=True)

    args = p.parse_args(argv)
    if args.cmd == "capture":
        paths = capture_goldens(args.data_root, args.out, args.num,
                                args.mode, args.seed, args.dataset)
        print(f"{len(paths)} goldens -> {args.out}")
    else:
        ds = GoldenDataset(args.dir)
        s = ds[0]
        print(f"{len(ds)} goldens; sample 0 in our schema:")
        for k, v in s.items():
            v = np.asarray(v)
            print(f"  {k:32s} {str(v.shape):16s} {v.dtype}")


if __name__ == "__main__":
    main()
