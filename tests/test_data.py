"""Data pipeline tests: geometry self-consistency + loader + model feed."""

import numpy as np
import jax
import jax.numpy as jnp

from cmr_agent_tpu.config import tiny_config
from cmr_agent_tpu.data import (
    SyntheticDataset, DataLoader, collate, make_synthetic_raw,
    project_and_masks, cost_volume_labels, farthest_point_sample_np,
    nearest_assign_np, load_label_mapping, camera_matrix_scaling,
    camera_matrix_cropping, angles_to_rotation_matrix,
)
from cmr_agent_tpu.models import MultiHeadModel


CFG = tiny_config()


def test_sample_keys_shapes_and_consistency():
    ds = SyntheticDataset(CFG, length=4)
    s = ds[0]
    N, M, S = CFG.num_pt, CFG.num_node, CFG.circle_loss_num
    h, w = CFG.image_h, CFG.image_w
    assert s["img"].shape == (CFG.cropped_img_h, CFG.cropped_img_w, 3)
    assert s["pc"].shape == (N, 3)
    assert s["pc_in_cam_space"].shape == (N, 3)
    assert s["node"].shape == (M, 3)
    assert s["pt2node"].shape == (N,) and s["pt2node"].max() < M
    assert s["img_mask"].shape == (h, w)
    assert s["pc_mask"].shape == (N,)
    assert s["pc_idx_for_circle_loss"].shape == (S,)
    assert s["pc_xy_float_for_circle_loss"].shape == (2, S)
    assert s["point_xy_float_all"].shape == (2, N)
    assert s["label_R"].shape == (CFG.nlabel,)

    # P is the inverse of the applied perturbation: P @ pc == pc_in_cam_space
    P = s["P"]
    restored = (P[:3, :3] @ s["pc"].T + P[:3, 3:]).T
    np.testing.assert_allclose(restored, s["pc_in_cam_space"], atol=1e-3)

    # circle-loss samples are in-view points
    assert s["pc_mask"][s["pc_idx_for_circle_loss"]].all()
    # their int xy are within image bounds
    assert (s["pc_xy_int_for_circle_loss"][0] < w).all()
    assert (s["pc_xy_int_for_circle_loss"][1] < h).all()

    # pt2node is a true 1-NN assignment
    d = np.linalg.norm(s["pc"][:10, None, :] - s["node"][None], axis=-1)
    np.testing.assert_array_equal(d.argmin(1), s["pt2node"][:10])

    # img_mask marks exactly the pixels hit by in-view points
    xy, in_pic, img_mask = project_and_masks(
        s["pc_in_cam_space"].astype(np.float64), s["K"].astype(np.float64),
        h, w)
    np.testing.assert_array_equal(img_mask, s["img_mask"])
    np.testing.assert_array_equal(in_pic.astype(np.int32), s["pc_mask"])


def test_structured_scene_full_amplitude_observability():
    """The structured generator (VERDICT r2 next-round #4) must keep the
    imitation problem observable at the reference's full +-10 m/+-pi
    protocol: structure in the frustum under ANY yaw, an image computed
    from the scene geometry, and the shared-pipeline contract intact."""
    from cmr_agent_tpu.data.synthetic import make_structured_raw

    rng = np.random.default_rng(0)
    h, w = CFG.cropped_img_h, CFG.cropped_img_w
    img, pc, K = make_structured_raw(rng, h, w, CFG.num_pt)
    assert img.shape == (h, w, 3) and img.dtype == np.float32
    assert (img.max(-1) > 0.03).mean() > 0.2      # rendered, not empty

    # structure survives worst-case perturbations: rotate the cloud
    # through 8 yaws + a 10 m shift; every pose keeps points in frustum
    for yaw in np.linspace(-np.pi, np.pi, 8, endpoint=False):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pert = pc @ R.T + np.array([10.0, 0.0, -10.0])
        _, mask, _ = project_and_masks(pert, K, CFG.image_h, CFG.image_w)
        assert mask.mean() > 0.005, f"yaw {yaw:.2f}: frustum starved"

    # same sample schema as the random generator (drop-in for the CLIs)
    s_struct = SyntheticDataset(CFG, length=1, scene="structured")[0]
    s_rand = SyntheticDataset(CFG, length=1)[0]
    assert set(s_struct) == set(s_rand)
    for k in s_rand:
        assert np.asarray(s_struct[k]).shape == np.asarray(s_rand[k]).shape

    # deterministic per (seed, index)
    s2 = SyntheticDataset(CFG, length=1, scene="structured")[0]
    np.testing.assert_array_equal(s_struct["pc"], s2["pc"])


def test_angles_and_labels():
    R = angles_to_rotation_matrix([0.0, 0.3, 0.0])
    c, s = np.cos(0.3), np.sin(0.3)
    np.testing.assert_allclose(R, [[c, 0, s], [0, 1, 0], [-s, 0, c]],
                               atol=1e-12)

    lr, ltx, ltz = cost_volume_labels(
        np.array([0.0, 0.5, 0.0]), np.array([2.0, 0.0, -9.0]),
        np.pi, 10.0, 9)
    grid_r = np.linspace(-np.pi, np.pi, 9)
    grid_t = np.linspace(-10, 10, 9)
    assert lr.argmax() == np.abs(grid_r - 0.5).argmin()
    assert ltx.argmax() == np.abs(grid_t - 2.0).argmin()
    assert ltz.argmax() == np.abs(grid_t + 9.0).argmin()


def test_fps_and_nn_np():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3))
    idx = farthest_point_sample_np(rng, pts, 32)
    assert len(set(idx.tolist())) == 32
    centers = pts[idx]
    assign = nearest_assign_np(pts, centers, block=128)
    d = np.linalg.norm(pts[:, None] - centers[None], axis=-1)
    np.testing.assert_array_equal(assign, d.argmin(1))


def test_camera_matrix_helpers():
    K = np.array([[100.0, 0, 50], [0, 100.0, 25], [0, 0, 1]])
    Ks = camera_matrix_scaling(K.copy(), 0.5)
    np.testing.assert_allclose(Ks, [[50, 0, 25], [0, 50, 12.5], [0, 0, 1]])
    Kc = camera_matrix_cropping(K.copy(), dx=10, dy=5)
    assert Kc[0, 2] == 40 and Kc[1, 2] == 20


def test_loader_batching_and_prefetch():
    ds = SyntheticDataset(CFG, length=6)
    for workers in (0, 2):
        loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=workers)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["pc"].shape == (2, CFG.num_pt, 3)
    # reproducible shuffle per epoch
    l1 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0, seed=1)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0, seed=1)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["pc"], b2["pc"])


def test_synthetic_batch_feeds_model():
    ds = SyntheticDataset(CFG, length=2)
    batch = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = MultiHeadModel(CFG)
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   batch, train=False, with_loss=True)
    out = model.apply(v, batch, train=False, with_loss=True)
    assert np.isfinite(float(out["loss"]))
    # on a geometrically consistent sample, some points project in view
    assert float(batch["pc_mask"].sum()) > 100


def test_label_mapping():
    m = load_label_mapping("semantic-kitti")
    assert m["learning_map"][10] == 1  # car
    assert m["learning_map_inv"][1] == 10
    assert m["learning_ignore"][0] is True
    assert 8 in m["split"]["valid"]
    n = load_label_mapping("nuscenes")
    assert set(n) == {"labels", "labels_16", "learning_map"}
    assert n["learning_map"][9] == 1
    assert n["labels"][17] == "vehicle.car"
    assert n["labels_16"][4] == "car"
    # every raw id has a name and a learning id; every learning id a name
    assert set(n["learning_map"]) == set(n["labels"]) == set(range(32))
    assert set(n["learning_map"].values()) == set(n["labels_16"])


def test_nuscenes_label_mapping_matches_reference_yaml():
    """Key-for-key parity with /root/reference/config/label_mapping/
    nuscenes.yaml (SURVEY.md §2.1)."""
    import os
    path = os.path.join(
        os.environ.get("CMR_REFERENCE_ROOT", "/root/reference"),
        "config", "label_mapping", "nuscenes.yaml")
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference yaml not available")
    import yaml
    with open(path) as f:
        ref = yaml.safe_load(f)
    ours = load_label_mapping("nuscenes")
    assert set(ours) == set(ref)
    for key in ref:
        assert ours[key] == ref[key], f"mismatch in {key}"


def test_process_pool_loader_matches_thread_loader():
    from cmr_agent_tpu.data import DataLoader, SyntheticDataset
    from cmr_agent_tpu.config import tiny_config

    ds = SyntheticDataset(tiny_config(), length=6, seed=0)
    lt = DataLoader(ds, 2, shuffle=True, num_workers=2, seed=3)
    lp = DataLoader(ds, 2, shuffle=True, num_workers=2, seed=3,
                    use_processes=True)
    bt, bp = list(lt), list(lp)
    lp.close()
    assert len(bt) == len(bp) == 3
    for a, b in zip(bt, bp):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_process_pool_loader_sees_set_epoch():
    # the pool pickles the dataset once; set_epoch must still reach the
    # workers (it rides along with every task)
    ds = SyntheticDataset(tiny_config(), length=4, seed=0)
    sync = DataLoader(ds, 2, shuffle=False, num_workers=0)
    proc = DataLoader(ds, 2, shuffle=False, num_workers=2,
                      use_processes=True)
    try:
        sync.set_epoch(1)
        proc.set_epoch(1)
        for a, b in zip(sync, proc):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        # epoch actually changes the stream (guards a no-op set_epoch);
        # fresh dataset instance — set_epoch mutates the shared object
        ds0 = SyntheticDataset(tiny_config(), length=4, seed=0)
        sync0 = DataLoader(ds0, 2, shuffle=False, num_workers=0)
        diff = False
        for a, b in zip(sync, sync0):
            diff = diff or any(not np.array_equal(a[k], b[k]) for k in a)
        assert diff
    finally:
        proc.close()


def test_thread_pool_loader_is_ordered_and_complete():
    ds = SyntheticDataset(tiny_config(), length=8, seed=0)
    ref = list(DataLoader(ds, 2, shuffle=True, num_workers=0, seed=5))
    got = list(DataLoader(ds, 2, shuffle=True, num_workers=3, seed=5,
                          prefetch=2))
    assert len(ref) == len(got) == 4
    for a, b in zip(ref, got):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
