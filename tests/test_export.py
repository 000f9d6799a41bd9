"""Serving export round-trip: StableHLO artifact == live apply."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmr_agent_tpu.config import micro_config
from cmr_agent_tpu.data import SyntheticDataset, collate
from cmr_agent_tpu.models import MultiHeadModel, CMRAgent
from cmr_agent_tpu.env import run_episode
from cmr_agent_tpu.train.export import (export_geo_forward, export_episode,
                                        load_exported)

CFG = micro_config()


def _setup():
    ds = SyntheticDataset(CFG, length=2)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    model = MultiHeadModel(CFG)
    gv = jax.jit(lambda r, b: model.init(r, b, train=False, with_loss=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    return model, gv, batch


@pytest.mark.slow
def test_geo_forward_export_roundtrip(tmp_path):
    model, gv, batch = _setup()
    path = str(tmp_path / "geo.stablehlo")
    export_geo_forward(CFG, gv, batch, path)

    art = load_exported(path)
    got = art.call({k: np.asarray(v) for k, v in batch.items()})
    want = model.apply(gv, batch, train=False, with_loss=False)
    for k in ("pc_geo_feat", "img_geo_feat"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["pc_overlap_pred"]),
                                  np.asarray(want["pc_overlap_pred"]))


def test_episode_export_roundtrip(tmp_path):
    model, gv, batch = _setup()
    out = model.apply(gv, batch, train=False, with_loss=False)
    # no ground-truth "P": serving has none (the deterministic episode
    # needs only the geo outputs + camera)
    state = {
        "pc": out["pc"],
        "K": batch["K"],
        "pc_overlap_pred": out["pc_overlap_pred"],
        "pc_is_in_cam_scores": out["pc_is_in_cam_scores"],
        "pc_geo_feat": out["pc_geo_feat"],
        "img_geo_feat": out["img_geo_feat"],
    }
    agent = CMRAgent(CFG)
    h, w, f = CFG.image_h, CFG.image_w, CFG.embed_dim
    b = batch["pc"].shape[0]
    av = jax.jit(lambda r, o2, o3: agent.init({"params": r}, o2, o3,
                                              train=False))(
        jax.random.key(2), jnp.zeros((b, h, w, 2 * f)),
        jnp.zeros((b, CFG.num_pt, 5)))

    blob = export_episode(CFG, av, state)
    art = load_exported(blob)
    got = art.call({k: np.asarray(v) for k, v in state.items()})

    pose_src = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                (b, 4, 4))
    want, _ = run_episode(
        lambda avars, o2, o3: agent.apply(avars, o2, o3, train=False),
        av, state, pose_src, None, CFG, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_episode_export_honours_bearing_init(tmp_path):
    """An agent trained with Config.bearing_init must be served with the
    same episode initialisation (round-3 review: export_episode hardcoded
    identity)."""
    from cmr_agent_tpu.env import bearing_init_pose

    cfg = micro_config(action_num=2, bearing_init=True)
    ds = SyntheticDataset(cfg, length=2)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    model = MultiHeadModel(cfg)
    gv = jax.jit(lambda r, b: model.init(r, b, train=False, with_loss=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    out = model.apply(gv, batch, train=False, with_loss=False)
    state = {
        "pc": out["pc"],
        "K": batch["K"],
        # frustum mask as the overlap prediction: nonzero bearing
        "pc_overlap_pred": batch["pc_mask"].astype(bool),
        "pc_is_in_cam_scores": batch["pc_mask"].astype(jnp.float32),
        "pc_geo_feat": out["pc_geo_feat"],
        "img_geo_feat": out["img_geo_feat"],
    }
    agent = CMRAgent(cfg)
    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    b = batch["pc"].shape[0]
    av = jax.jit(lambda r, o2, o3: agent.init({"params": r}, o2, o3,
                                              train=False))(
        jax.random.key(2), jnp.zeros((b, h, w, 2 * f)),
        jnp.zeros((b, cfg.num_pt, 5)))

    blob = export_episode(cfg, av, state)
    got = load_exported(blob).call({k: np.asarray(v)
                                    for k, v in state.items()})

    pose_src = bearing_init_pose(state)
    assert not np.allclose(np.asarray(pose_src),
                           np.broadcast_to(np.eye(4, dtype=np.float32),
                                           (b, 4, 4)))
    want, _ = run_episode(
        lambda avars, o2, o3: agent.apply(avars, o2, o3, train=False),
        av, state, pose_src, None, cfg, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_composed_pipeline_export_roundtrip(tmp_path):
    """The flagship coarse->K-hypothesis-fine->verify pipeline
    (CONVERGENCE.md §16 stage 4) serialises as ONE program whose inputs
    are inference-only (no ground truth) and whose selected pose is a
    rigid SE(3) consistent with its candidate scores."""
    from cmr_agent_tpu.models import IterModel
    from cmr_agent_tpu.train.train_iter import iter_model_state
    from cmr_agent_tpu.train.export import export_composed_pipeline

    model, gv, batch = _setup()
    geo_out = model.apply(gv, batch, train=False, with_loss=False)
    st = iter_model_state(geo_out, batch)
    iterm = IterModel(CFG)
    iv = jax.jit(lambda r, s: iterm.init({"params": r}, s, train=False,
                                         with_loss=False))(
        jax.random.key(1), st)
    agent = CMRAgent(CFG)
    h, w, f = CFG.image_h, CFG.image_w, CFG.embed_dim
    b = batch["pc"].shape[0]
    av = jax.jit(lambda r, o2, o3: agent.init({"params": r}, o2, o3,
                                              train=False))(
        jax.random.key(2), jnp.zeros((b, h, w, 2 * f)),
        jnp.zeros((b, CFG.num_pt, CFG.obs3d_channels)))

    path = str(tmp_path / "pipeline.stablehlo")
    export_composed_pipeline(CFG, gv, iv, av, batch, hypotheses=2,
                             iter_iters=2, iter_shrink=0.25,
                             hypo_score="combo", refine_rounds=1,
                             refine_beam=("combo", "combo:2", "mean_valid"),
                             beam_score="above50_norm",
                             beam_frame="shared", path=path)

    inp = {k: np.asarray(batch[k]) for k in
           ("img", "pc", "node", "pt2node", "K",
            "R_amplitude", "T_amplitude")}
    got = load_exported(path).call(inp)
    pose = np.asarray(got["pose"])
    scores = np.asarray(got["candidate_scores"])
    assert pose.shape == (b, 4, 4) and scores.shape == (b, 2)
    assert np.isfinite(pose).all() and np.isfinite(scores).all()
    # with refinement the reported score is the beam re-vote's (not the
    # pre-refine candidate max); it must still be finite per sample
    assert np.isfinite(np.asarray(got["score"])).all()
    # the absolute pose is rigid: orthonormal rotation, unit determinant,
    # affine bottom row
    R = pose[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3, dtype=np.float32),
                                               (b, 3, 3)), atol=1e-3)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(b), atol=1e-3)
    np.testing.assert_allclose(pose[:, 3], np.broadcast_to(
        np.array([0, 0, 0, 1], np.float32), (b, 4)), atol=1e-6)
