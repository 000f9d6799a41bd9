"""Episode visualiser tool: frames render, errors.json tracks the expert."""

import json
import os

import numpy as np


def test_expert_visualisation_renders_and_converges(tmp_path):
    from cmr_agent_tpu.config import micro_config
    from cmr_agent_tpu.data import SyntheticDataset, collate
    from cmr_agent_tpu.tools.visualize import run_and_render

    cfg = micro_config(action_num=6)
    ds = SyntheticDataset(cfg, length=1, seed=3)
    batch = collate([ds[0]])
    out = str(tmp_path / "viz")

    errs = run_and_render(cfg, batch, out, policy="expert", make_gif=True)

    assert len(errs) == cfg.action_num + 1
    # the analytic expert must reduce both errors from the initial state
    assert errs[-1][0] < errs[0][0]
    assert errs[-1][1] < errs[0][1]
    for step in range(cfg.action_num + 1):
        assert os.path.exists(os.path.join(out, f"step-{step:02d}.png"))
    assert os.path.exists(os.path.join(out, "episode.gif"))
    rec = json.load(open(os.path.join(out, "errors.json")))
    np.testing.assert_allclose(rec["rte"], [e[0] for e in errs], rtol=1e-6)


def test_untrained_agent_policy_runs(tmp_path):
    """The agent-policy path (obs -> CMRAgent -> argmax) renders frames."""
    import jax
    import jax.numpy as jnp

    from cmr_agent_tpu.config import micro_config
    from cmr_agent_tpu.data import SyntheticDataset, collate
    from cmr_agent_tpu.tools.visualize import run_and_render
    from cmr_agent_tpu.train import create_agent_state

    cfg = micro_config(action_num=2)
    ds = SyntheticDataset(cfg, length=1, seed=5)
    batch = collate([ds[0]])

    rng = np.random.default_rng(0)
    n, f = cfg.num_pt, cfg.embed_dim
    h, w = cfg.image_h, cfg.image_w
    geo_vars = {
        "pc_overlap_pred": jnp.asarray(rng.integers(0, 2, (1, n)), bool),
        "pc_geo_feat": jnp.asarray(rng.normal(size=(1, n, f)), jnp.float32),
        "img_geo_feat": jnp.asarray(rng.normal(size=(1, h, w, f)),
                                    jnp.float32),
    }
    agent_state = create_agent_state(
        cfg, jnp.zeros((1, h, w, 2 * f)), jnp.zeros((1, n, 5)),
        jax.random.key(0))

    out = str(tmp_path / "viz")
    errs = run_and_render(cfg, batch, out, policy="untrained",
                          geo_vars=geo_vars, agent_state=agent_state,
                          make_gif=False)
    assert len(errs) == cfg.action_num + 1
    assert os.path.exists(os.path.join(out, "step-02.png"))


def test_bearing_init_changes_the_rendered_start(tmp_path):
    """cfg.bearing_init must move the episode's step-0 pose (round-3
    review: the visualizer's --bearing-init was a silent no-op)."""
    import jax
    import jax.numpy as jnp

    from cmr_agent_tpu.config import micro_config
    from cmr_agent_tpu.data import SyntheticDataset, collate
    from cmr_agent_tpu.env import bearing_init_pose
    from cmr_agent_tpu.ops import pose_diff, to_disentangled
    from cmr_agent_tpu.tools.visualize import run_and_render
    from cmr_agent_tpu.train import create_agent_state

    cfg = micro_config(action_num=1, bearing_init=True)
    ds = SyntheticDataset(cfg, length=1, seed=11)
    batch = collate([ds[0]])

    n, f = cfg.num_pt, cfg.embed_dim
    h, w = cfg.image_h, cfg.image_w
    # overlap = the true frustum mask: a nonzero-yaw sample gives a
    # nonzero bearing, so the init must differ from identity
    geo_vars = {
        "pc_overlap_pred": jnp.asarray(batch["pc_mask"], bool),
        "pc_geo_feat": jnp.zeros((1, n, f), jnp.float32),
        "img_geo_feat": jnp.zeros((1, h, w, f), jnp.float32),
    }
    agent_state = create_agent_state(
        cfg, jnp.zeros((1, h, w, 2 * f)), jnp.zeros((1, n, 5)),
        jax.random.key(0))

    errs = run_and_render(cfg, batch, str(tmp_path / "viz"),
                          policy="untrained", geo_vars=geo_vars,
                          agent_state=agent_state, make_gif=False)

    state = {"pc": jnp.asarray(batch["pc"]),
             "pc_overlap_pred": geo_vars["pc_overlap_pred"]}
    pose0 = bearing_init_pose(state)
    pose_tgt = to_disentangled(jnp.asarray(batch["P"]),
                               jnp.asarray(batch["pc"]))
    want_rte, want_rre = (float(np.asarray(x)[0])
                          for x in pose_diff(pose0, pose_tgt))
    np.testing.assert_allclose(errs[0], (want_rte, want_rre), rtol=1e-4)
    # and it genuinely moved: identity-start RRE differs
    id_rte, id_rre = (float(np.asarray(x)[0]) for x in pose_diff(
        jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4)),
        pose_tgt))
    assert abs(errs[0][1] - id_rre) > 1e-3
