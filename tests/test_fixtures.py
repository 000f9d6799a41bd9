"""Real-format on-disk fixtures for the dataset classes.

No KITTI/NuScenes dumps exist in this environment, so these tests write
synthetic files in the exact on-disk formats the reference consumes
(calib.txt per KITTI odometry; the %06d.npy triplets of the NuScenes
pre-dump, dataset/NuScenesDataset.py:76-87; the npy image/cloud dumps of
dataset/KittiDataset.py:263-264) and run both ``__getitem__`` pipelines
end to end on them.
"""

import os

import numpy as np

from cmr_agent_tpu.config import tiny_config
from cmr_agent_tpu.data import KittiDataset, NuScenesDataset
from cmr_agent_tpu.data.kitti import KittiCalib

CALIB_TXT = """P0: 7.188560000000e+02 0.000000000000e+00 6.071928000000e+02 0.000000000000e+00 0.000000000000e+00 7.188560000000e+02 1.852157000000e+02 0.000000000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 0.000000000000e+00
P1: 7.188560000000e+02 0.000000000000e+00 6.071928000000e+02 -3.861448000000e+02 0.000000000000e+00 7.188560000000e+02 1.852157000000e+02 0.000000000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 0.000000000000e+00
P2: 7.188560000000e+02 0.000000000000e+00 6.071928000000e+02 4.538225000000e+01 0.000000000000e+00 7.188560000000e+02 1.852157000000e+02 -1.130887000000e-01 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 3.779761000000e-03
P3: 7.188560000000e+02 0.000000000000e+00 6.071928000000e+02 -3.372877000000e+02 0.000000000000e+00 7.188560000000e+02 1.852157000000e+02 2.369057000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 4.915215000000e-03
Tr: 4.276802385584e-04 -9.999672484946e-01 -8.084491683471e-03 -1.198459927713e-02 -7.210626507497e-03 8.081198471645e-03 -9.999413164504e-01 -5.403984729748e-02 9.999738645903e-01 4.859485810390e-04 -7.206933692422e-03 -2.921968648686e-01
"""


def _write_kitti_tree(root, cfg, n_pts=6000, h=220, w=600):
    rng = np.random.default_rng(0)
    for seq in ("00", "09"):
        os.makedirs(os.path.join(root, "calib", seq), exist_ok=True)
        with open(os.path.join(root, "calib", seq, "calib.txt"), "w") as f:
            f.write(CALIB_TXT)
        for cam in ("image_2", "image_3"):
            d = os.path.join(root, cfg.data_color, "sequences/", seq, cam)
            os.makedirs(d, exist_ok=True)
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            np.save(os.path.join(d, "000000.npy"), img)
        d = os.path.join(root, cfg.data_velodyne, "sequences/", seq,
                         "voxel0.1-SNr0.6")
        os.makedirs(d, exist_ok=True)
        # velodyne frame: x forward, points around the sensor
        pc = rng.uniform(-1, 1, (3, n_pts)) * np.array([[30], [10], [2.0]])
        pc[0] = np.abs(pc[0]) + 2.0
        np.save(os.path.join(d, "000000.npy"), pc.astype(np.float32))


def test_kitti_calib_parses_real_format(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "calib", "05"))
    with open(os.path.join(root, "calib", "05", "calib.txt"), "w") as f:
        f.write(CALIB_TXT)
    calib = KittiCalib(root)

    K = calib.get(5, "P2_K")
    np.testing.assert_allclose(K[0, 0], 718.856, rtol=1e-6)
    np.testing.assert_allclose(K[0, 2], 607.1928, rtol=1e-6)
    assert K[2, 2] == 1.0

    # translation recovery from P = K [I|t]: t = K^-1 P[:,3]
    P2 = np.fromstring(CALIB_TXT.splitlines()[2][4:], sep=" ").reshape(3, 4)
    want_t = np.linalg.solve(np.asarray(K, np.float64), P2[:, 3])
    np.testing.assert_allclose(calib.get(5, "P2")[:3, 3], want_t, rtol=1e-4)

    tr = calib.get(5, "Tr")
    assert tr.shape == (4, 4)
    np.testing.assert_allclose(tr[3], [0, 0, 0, 1])
    np.testing.assert_allclose(
        tr[:3, :],
        np.fromstring(CALIB_TXT.splitlines()[4][4:], sep=" ").reshape(3, 4),
        rtol=1e-6)


def test_kitti_dataset_end_to_end_on_fixture_tree(tmp_path):
    cfg = tiny_config()
    _write_kitti_tree(str(tmp_path), cfg)
    cfg = tiny_config(dataset_root=str(tmp_path))

    for mode, n_seq in (("train", 1), ("test", 1)):
        ds = KittiDataset(cfg, mode)
        assert len(ds) == 2 * n_seq  # P2 + P3 per frame
        s = ds[0]
        assert s["pc"].shape == (cfg.num_pt, 3)
        assert s["img"].shape == (cfg.cropped_img_h, cfg.cropped_img_w, 3)
        assert s["node"].shape == (cfg.num_node, 3)
        assert s["pt2node"].shape == (cfg.num_pt,)
        assert s["img_mask"].shape == (cfg.image_h, cfg.image_w)
        assert 0.0 <= float(s["img"].min()) and float(s["img"].max()) <= 1.0
        assert s["P"].shape == (4, 4)


def test_nuscenes_dataset_end_to_end_with_intensity(tmp_path):
    cfg = tiny_config(cropped_img_w=128, cropped_img_h=64)
    root = str(tmp_path)
    rng = np.random.default_rng(1)
    n_raw = 5000
    for sub in ("train", "test"):
        for d in ("PC", "img", "K"):
            os.makedirs(os.path.join(root, sub, d), exist_ok=True)
        pc = rng.uniform(-1, 1, (3, n_raw)) * np.array([[10], [3], [15.0]])
        pc[2] = np.abs(pc[2]) + 2.0
        # intensity channel = the raw point index, so selection is checkable
        data = np.concatenate([pc, np.arange(n_raw)[None]], axis=0)
        np.save(os.path.join(root, sub, "PC", "000000.npy"),
                data.astype(np.float32))
        img = rng.integers(0, 255, (cfg.cropped_img_h, cfg.cropped_img_w, 3),
                           dtype=np.uint8)
        np.save(os.path.join(root, sub, "img", "000000.npy"), img)
        K = np.array([[400.0, 0, cfg.cropped_img_w / 2],
                      [0, 400.0, cfg.cropped_img_h / 2], [0, 0, 1.0]])
        np.save(os.path.join(root, sub, "K", "000000.npy"), K)

    cfg = tiny_config(dataset_root=root, cropped_img_w=128, cropped_img_h=64)
    ds = NuScenesDataset(cfg, "train")
    assert len(ds) == 1
    s = ds[0]
    assert s["pc"].shape == (cfg.num_pt, 3)
    assert s["pc_intensity"].shape == (cfg.num_pt,)

    # intensity was downsampled with the SAME index selection as the cloud:
    # pc_in_cam_space (the pre-perturbation cloud) must equal the raw cloud
    # re-gathered at the intensity values
    raw = np.load(os.path.join(root, "train", "PC", "000000.npy"))
    sel = s["pc_intensity"].astype(np.int64)
    np.testing.assert_allclose(s["pc_in_cam_space"],
                               raw[0:3, sel].T, rtol=1e-5, atol=1e-5)
