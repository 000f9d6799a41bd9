"""End-to-end CLI flow on the tiny synthetic config:
train_geo -> checkpoint -> train_agent (loading the geo ckpt) -> test_agent.
"""

import glob
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_train_eval_roundtrip(tmp_path, monkeypatch):
    # the CLI round-trip asserts wiring, not math: swap the --tiny
    # config for micro (compile time dominates on this host)
    from cmr_agent_tpu.config import micro_config
    import cmr_agent_tpu.cli.common as cli_common
    monkeypatch.setattr(cli_common, "tiny_config", micro_config)
    from cmr_agent_tpu.cli import train_geo, train_agent, test_agent, test_geo

    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    common = ["--dataset", "synthetic", "--tiny", "--synthetic-length", "2",
              "--batch-size", "2", "--logdir", log, "--ckpt-dir", ckpt]

    train_geo.main(common + ["--steps", "1"])
    geo_ckpts = glob.glob(os.path.join(ckpt, "*", "epoch-*"))
    assert geo_ckpts, "train_geo produced no checkpoint"

    train_agent.main(common + ["--steps", "1", "--geo-ckpt", geo_ckpts[0]])
    agent_ckpts = [p for p in glob.glob(os.path.join(ckpt, "*_IL_*", "epoch-*"))]
    assert agent_ckpts, "train_agent produced no checkpoint"

    m = test_agent.main(["--dataset", "synthetic", "--tiny",
                         "--synthetic-length", "2", "--eval-batch-size", "2",
                         "--max-batches", "1",
                         "--geo-ckpt", geo_ckpts[0],
                         "--agent-ckpt", agent_ckpts[0]])
    assert 0.0 <= m["registration_recall"] <= 1.0
    assert np.isfinite(m["avg_episode_time_s"])

    r = test_geo.main(["--dataset", "synthetic", "--tiny",
                       "--synthetic-length", "2", "--max-batches", "1",
                       "--geo-ckpt", geo_ckpts[0]])
    assert 0.0 <= r["matching_inlier_ratio"] <= 1.0


@pytest.mark.slow
def test_cli_coarse_to_fine_pipeline(tmp_path, monkeypatch):
    """IterModel coarse -> re-perceive -> agent fine, composed in
    test_agent via --iter-ckpt (env.apply_coarse_pose re-bases the
    problem under the coarse pose)."""
    from cmr_agent_tpu.config import micro_config
    import cmr_agent_tpu.cli.common as cli_common
    monkeypatch.setattr(cli_common, "tiny_config", micro_config)
    from cmr_agent_tpu.cli import train_geo, train_iter, test_agent

    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    common = ["--dataset", "synthetic", "--tiny", "--synthetic-length", "2",
              "--batch-size", "2", "--logdir", log, "--ckpt-dir", ckpt]
    train_geo.main(common + ["--steps", "1"])
    geo_ckpts = glob.glob(os.path.join(ckpt, "*", "epoch-*"))
    assert geo_ckpts, "train_geo produced no checkpoint"
    train_iter.main(common + ["--steps", "1", "--unmasked-warp"])
    iter_ckpts = glob.glob(os.path.join(ckpt, "iter_*", "epoch-*"))
    assert iter_ckpts, "train_iter produced no checkpoint"

    m = test_agent.main(["--dataset", "synthetic", "--tiny",
                         "--synthetic-length", "2", "--eval-batch-size", "2",
                         "--max-batches", "1", "--unmasked-warp",
                         "--iter-ckpt", iter_ckpts[0], "--iter-iters", "2",
                         # second iteration re-spans the first's residual
                         # with a 4x finer grid (--iter-shrink)
                         "--iter-shrink", "0.25",
                         # per-stage perception: coarse keeps the random
                         # init (no --geo-ckpt), fine loads the trained geo
                         "--fine-geo-ckpt", geo_ckpts[0]])
    assert 0.0 <= m["registration_recall"] <= 1.0
    assert np.isfinite(m["coarse_rte_mean"])
    assert np.isfinite(m["coarse_rre_mean"])

    # multi-hypothesis composition: top-3 yaw candidates, each refined and
    # verification-selected (env.alignment_score)
    m2 = test_agent.main(["--dataset", "synthetic", "--tiny",
                          "--synthetic-length", "2", "--eval-batch-size", "2",
                          "--max-batches", "1", "--unmasked-warp",
                          "--iter-ckpt", iter_ckpts[0], "--iter-iters", "1",
                          "--iter-hypotheses", "3",
                          "--fine-geo-ckpt", geo_ckpts[0]])
    assert m2["hypo_k"] == 3
    # the ANY-candidate ceiling dominates both the first-candidate
    # baseline and the verification-selected result, which must agree
    # with the reported recall (selection IS the pipeline output)
    assert m2["rr_any_hypothesis"] >= m2["rr_first_hypothesis"]
    assert m2["rr_any_hypothesis"] >= m2["rr_selected"]
    assert abs(m2["rr_selected"] - m2["registration_recall"]) < 1e-9
    # every alignment_stats selector is reported as a what-if, and the
    # configured one (default sum_norm) is the pipeline output
    for k in ("smooth_mean", "sum_norm", "mean_valid", "frac_valid",
              "above50_norm", "above70_norm",
              # spatial-consistency (matching-IR-at-pose) family
              "ir_smooth", "ir_mean", "ir_norm"):
        assert f"rr_sel_{k}" in m2
        assert m2[f"rr_sel_{k}"] <= m2["rr_any_hypothesis"] + 1e-9
    assert abs(m2["rr_sel_smooth_mean"] - m2["rr_selected"]) < 1e-9
    assert "rr_sel_combo" in m2

    # verified refinement rounds on the composed estimate, selecting with
    # the combined statistic; acceptance is gated so metrics stay finite
    m3 = test_agent.main(["--dataset", "synthetic", "--tiny",
                          "--synthetic-length", "2", "--eval-batch-size", "2",
                          "--max-batches", "1", "--unmasked-warp",
                          "--iter-ckpt", iter_ckpts[0], "--iter-iters", "1",
                          "--iter-hypotheses", "2", "--hypo-score", "combo",
                          "--refine-rounds", "1", "--refine-iter",
                          "--fine-geo-ckpt", geo_ckpts[0]])
    assert m3["refine_rounds"] == 1
    assert 0.0 <= m3["rr_pre_refine"] <= 1.0
    # rte/rre_mean are recalled-only (NaN at RR=0 with random weights);
    # the all-sample medians must always be finite
    assert np.isfinite(m3["rte_median_all"])
    assert np.isfinite(m3["rre_median_all"])

    # refinement beam: each portfolio statistic's top candidate is
    # refined, the final pose is re-voted across the refined beam
    m5 = test_agent.main(["--dataset", "synthetic", "--tiny",
                          "--synthetic-length", "2", "--eval-batch-size", "2",
                          "--max-batches", "1", "--unmasked-warp",
                          "--iter-ckpt", iter_ckpts[0], "--iter-iters", "1",
                          "--iter-hypotheses", "2", "--hypo-score", "combo",
                          "--refine-rounds", "1",
                          "--refine-beam", "combo,combo:2,mean_valid",
                          "--beam-score", "above50_norm",
                          "--fine-geo-ckpt", geo_ckpts[0]])
    assert m5["refine_beam"] == "combo,combo:2,mean_valid"
    assert m5["beam_score"] == "above50_norm"
    assert m5["beam_frame"] == "own"
    assert "rr_beamsel_above50_norm" in m5
    # the beam re-vote picks among refined members, so its RR is bounded
    # by the post-refinement any-member ceiling
    assert m5["registration_recall"] <= m5["rr_beam_any"] + 1e-9
    assert np.isfinite(m5["rte_median_all"])

    # shared-frame re-vote: every member's pose scored in every member's
    # perception frame (comparable scores), vote on frame-averaged z
    m6 = test_agent.main(["--dataset", "synthetic", "--tiny",
                          "--synthetic-length", "2", "--eval-batch-size", "2",
                          "--max-batches", "1", "--unmasked-warp",
                          "--iter-ckpt", iter_ckpts[0], "--iter-iters", "1",
                          "--iter-hypotheses", "2", "--hypo-score", "combo",
                          "--refine-rounds", "1",
                          "--refine-beam", "combo,combo:2,mean_valid",
                          "--beam-score", "above50_norm",
                          "--beam-frame", "shared",
                          "--fine-geo-ckpt", geo_ckpts[0]])
    assert m6["beam_frame"] == "shared"
    assert "rr_beamsel_above50_norm" in m6
    assert m6["registration_recall"] <= m6["rr_beam_any"] + 1e-9
    assert np.isfinite(m6["rte_median_all"])

    # refinement without a coarse stage (agent-only pipeline)
    m4 = test_agent.main(["--dataset", "synthetic", "--tiny",
                          "--synthetic-length", "2", "--eval-batch-size", "2",
                          "--max-batches", "1",
                          "--geo-ckpt", geo_ckpts[0],
                          "--refine-rounds", "1"])
    assert m4["refine_rounds"] == 1
    assert np.isfinite(m4["rte_median_all"])
    assert np.isfinite(m4["rre_median_all"])


def test_stop_file_checkpoints_and_exits(tmp_path, monkeypatch):
    """--stop-file must exit cleanly with a resumable checkpoint (killing
    a mid-step TPU process can wedge the device grant on remote
    runtimes)."""
    from cmr_agent_tpu.config import micro_config
    import cmr_agent_tpu.cli.common as cli_common
    monkeypatch.setattr(cli_common, "tiny_config", micro_config)
    from cmr_agent_tpu.cli import train_geo

    stop = tmp_path / "stop"
    stop.write_text("")
    ckpt = str(tmp_path / "ckpt")
    train_geo.main(["--dataset", "synthetic", "--tiny",
                    "--synthetic-length", "2", "--batch-size", "2",
                    "--logdir", str(tmp_path / "log"), "--ckpt-dir", ckpt,
                    "--steps", "5", "--stop-file", str(stop)])
    stops = glob.glob(os.path.join(ckpt, "*", "stop-epoch-*"))
    assert stops, "stop-file exit produced no checkpoint"
    # the stop checkpoint is a full train state (two-tree layout)
    assert os.path.isdir(os.path.join(stops[0], "model"))


def test_make_loader_worker_policy(monkeypatch):
    """The CLIs must honour cfg.num_workers (VERDICT r2: hardcoded 2
    starves a real TPU host) and pick the process pool for GIL-bound
    datasets."""
    import argparse
    import os

    import cmr_agent_tpu.cli.common as cli_common
    from cmr_agent_tpu.config import micro_config
    from cmr_agent_tpu.data import SyntheticDataset

    cfg = micro_config(num_workers=12)
    ds = SyntheticDataset(cfg, length=4, seed=0)
    ds.gil_bound = True                  # stand-in for kitti __getitem__
    ns = argparse.Namespace(num_workers=None, loader_backend="auto",
                            dataset="kitti")
    monkeypatch.setattr(os, "cpu_count", lambda: 16)
    ld = cli_common.make_loader(cfg, ns, ds, batch_size=2)
    assert ld.num_workers == 12          # cfg wins below the core count
    assert ld.use_processes              # kitti __getitem__ is GIL-bound

    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    ld = cli_common.make_loader(cfg, ns, ds, batch_size=2)
    assert ld.num_workers == 4           # capped at host cores

    ns.dataset = "synthetic"
    ds.gil_bound = False                 # dataset attribute drives the choice
    ld = cli_common.make_loader(cfg, ns, ds, batch_size=2)
    assert not ld.use_processes          # numpy pipeline: threads suffice

    ns.num_workers = 7
    ns.loader_backend = "processes"
    ld = cli_common.make_loader(cfg, ns, ds, batch_size=2)
    assert ld.num_workers == 7 and ld.use_processes  # explicit flags win

    ns.loader_backend = "sync"
    ld = cli_common.make_loader(cfg, ns, ds, batch_size=2)
    assert ld.num_workers == 0


def test_resume_rollout_step_arithmetic():
    """--resume must continue the rollout counter (DAgger beta anneal, rng
    stream), converting optimizer updates back to rollout steps."""
    from cmr_agent_tpu.cli.train_agent import resume_rollout_step
    from cmr_agent_tpu.config import micro_config

    cfg = micro_config()
    assert resume_rollout_step(cfg, 0) == 0          # fresh start untouched
    n_flush = cfg.num_trajectory * cfg.train_batch_size * cfg.action_num
    upd = max(1, n_flush // cfg.ppo_batch_size)
    # exactly k flushes of updates -> k * num_trajectory rollouts
    for k in (1, 2, 5):
        assert resume_rollout_step(cfg, k * upd) == k * cfg.num_trajectory
    # a partial flush rounds UP to the next flush boundary (never rewinds
    # beta below where the checkpointed run had annealed it to)
    assert resume_rollout_step(cfg, upd + 1) == 2 * cfg.num_trajectory


def test_agent_lr_schedule_counts_optimizer_updates():
    """StepLR pacing: the agent runs several optimizer updates per loader
    batch, so steps_per_epoch must be updates-per-DATASET-epoch (the
    reference steps its scheduler once per epoch, Train_Agent.py:317)."""
    from cmr_agent_tpu.cli.train_agent import agent_updates_per_epoch
    from cmr_agent_tpu.config import kitti_config, micro_config

    cfg = kitti_config(train_batch_size=8, num_trajectory=2,
                       ppo_batch_size=8)
    # 2 trajectories x 8 samples x 10 steps = 160 flattened samples
    # -> 20 minibatch updates per 2-batch flush -> 10 updates/batch
    assert agent_updates_per_epoch(cfg, 100) == 1000
    assert agent_updates_per_epoch(cfg, 0) >= 1      # empty loader guard

    cfg = micro_config()
    per_flush = (cfg.num_trajectory * cfg.train_batch_size
                 * cfg.action_num) // cfg.ppo_batch_size
    assert (agent_updates_per_epoch(cfg, 6)
            == 6 * per_flush // cfg.num_trajectory)


def test_enable_compile_cache_policy(monkeypatch):
    import jax
    from cmr_agent_tpu.cli.common import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        # an explicitly-configured cache (conftest sets one) is never
        # overridden by the CLI default
        assert prev  # conftest configured it
        monkeypatch.delenv("CMR_COMPILE_CACHE", raising=False)
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == prev
        # CMR_COMPILE_CACHE wins over any existing setting — keyed by the
        # host CPU-feature hash (round 5: a cached AOT executable from a
        # different host must miss, not SIGILL)
        from cmr_agent_tpu.cli.common import host_feature_cache_dir
        monkeypatch.setenv("CMR_COMPILE_CACHE", "/tmp/cmr_cache_override")
        enable_compile_cache()
        assert (jax.config.jax_compilation_cache_dir
                == host_feature_cache_dir("/tmp/cmr_cache_override"))
        # empty env var disables the override entirely
        jax.config.update("jax_compilation_cache_dir", prev)
        monkeypatch.setenv("CMR_COMPILE_CACHE", "")
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == prev
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_apply_obs_overrides_single_mapping():
    """cli.common.apply_obs_overrides is THE flag->config mapping shared
    by every CLI/tool (demo and diagnose included since round 3) —
    amplitude, optimizer, width and observation flags all route through
    it, including the aux-head -> bearing-channels implication."""
    import argparse

    from cmr_agent_tpu.cli.common import apply_obs_overrides
    from cmr_agent_tpu.config import micro_config

    cfg = micro_config()
    args = argparse.Namespace(
        pose_aware=True, obs_bearing=False, aux_head=True,
        bearing_init=True, lr=3e-4, t_amp=2.5, r_amp=0.5,
        w_entropy=1e-2, alpha=0.7, embed_dim=128, mlp_dim=256)
    out = apply_obs_overrides(cfg, args)
    assert out.pose_aware_observation and out.bearing_init
    assert out.obs_bearing_channels and out.policy_aux_state  # implication
    assert out.obs3d_channels == 7
    assert (out.lr, out.w_entropy, out.alpha) == (3e-4, 1e-2, 0.7)
    assert (out.p_tx_amplitude, out.p_tz_amplitude) == (2.5, 2.5)
    assert out.p_ry_amplitude == 0.5
    assert (out.embed_dim, out.mlp_dim) == (128, 256)
    # unmasked-warp routes through the same mapping
    um = apply_obs_overrides(cfg, argparse.Namespace(unmasked_warp=True))
    assert um.cost_volume_unmasked
    # absent attributes are skipped; 0/None sentinels keep defaults
    plain = apply_obs_overrides(cfg, argparse.Namespace(embed_dim=0))
    assert plain == cfg


def test_build_config_dtype_override():
    """--dtype maps onto Config.compute_dtype for every CLI."""
    import argparse

    from cmr_agent_tpu.cli.common import build_config

    args = argparse.Namespace(
        dataset="synthetic", data_root="", tiny=True, batch_size=None,
        epochs=None, seed=None, logdir=None, ckpt_dir=None,
        dtype="bfloat16", debug_nans=False)
    assert build_config(args).compute_dtype == "bfloat16"
    args.dtype = None
    assert build_config(args).compute_dtype == "float32"
