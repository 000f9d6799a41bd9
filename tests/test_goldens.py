"""Golden capture/replay kit (VERDICT r2 next-round #3b).

Real goldens need the reference's host deps + a dataset on disk, neither
of which exist here — so the replay path is proven on a *fabricated*
golden in the exact reference .npz layout, and a second test replays real
goldens whenever CMR_GOLDEN_DIR points at a capture.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmr_agent_tpu.config import micro_config
from cmr_agent_tpu.data import SyntheticDataset, collate
from cmr_agent_tpu.tools.goldens import (GoldenDataset, fabricate_golden,
                                         load_golden_as_sample)

CFG = micro_config()


def _fabricate(tmp_path, n=2):
    for i in range(n):
        fabricate_golden(
            os.path.join(str(tmp_path), f"golden_test_{i:05d}.npz"),
            num_pt=CFG.num_pt, num_node=CFG.num_node,
            img_h=CFG.image_h, img_w=CFG.image_w,
            circle=CFG.circle_loss_num, seed=i)
    return GoldenDataset(str(tmp_path), nlabel=CFG.nlabel)


def test_golden_replay_matches_our_schema(tmp_path):
    """A golden replayed through load_golden_as_sample must be a drop-in
    for a dataset sample: same keys, shapes and dtypes as the shipped
    pipeline's output."""
    ds = _fabricate(tmp_path)
    golden = ds[0]
    ours = SyntheticDataset(CFG, length=1, seed=0)[0]

    assert set(golden) == set(ours), (
        set(golden) ^ set(ours))
    for k in ours:
        g, o = np.asarray(golden[k]), np.asarray(ours[k])
        assert g.shape == o.shape, f"{k}: {g.shape} vs {o.shape}"
        assert g.dtype == o.dtype, f"{k}: {g.dtype} vs {o.dtype}"

    # reconstructed projections must be consistent with the stored
    # cam-space cloud
    proj = golden["K"] @ np.asarray(golden["pc_in_cam_space"]).T
    np.testing.assert_allclose(
        golden["point_xy_float_all"],
        proj[:2] / np.maximum(np.abs(proj[2:3]), 1e-8), rtol=1e-5)


def test_golden_replays_through_geo_forward(tmp_path):
    """Replayed goldens flow through the model stack end to end."""
    from cmr_agent_tpu.train import create_geo_state
    from cmr_agent_tpu.train.train_geo import make_geo_forward

    ds = _fabricate(tmp_path)
    batch = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_geo_state(CFG, batch, jax.random.key(0))
    out = make_geo_forward(CFG)(state.params, state.batch_stats, batch)
    assert np.isfinite(np.asarray(out["pc_geo_feat"])).all()


@pytest.mark.skipif(not os.environ.get("CMR_GOLDEN_DIR"),
                    reason="set CMR_GOLDEN_DIR to a real golden capture")
def test_real_goldens_replay():
    """With a real capture (tools/goldens.py capture on a machine that has
    the reference deps + data), the same replay path runs at full scale."""
    from cmr_agent_tpu.config import kitti_config
    from cmr_agent_tpu.train import create_geo_state
    from cmr_agent_tpu.train.train_geo import make_geo_forward

    cfg = kitti_config("")
    ds = GoldenDataset(os.environ["CMR_GOLDEN_DIR"], nlabel=cfg.nlabel)
    batch = collate([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_geo_state(cfg, batch, jax.random.key(0))
    out = make_geo_forward(cfg)(state.params, state.batch_stats, batch)
    assert np.isfinite(np.asarray(out["pc_geo_feat"])).all()
