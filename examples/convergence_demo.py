"""Learning-convergence demonstration on synthetic data.

Trains the geo model, then the agent by behaviour cloning, and shows:

1. geo loss decreasing,
2. the trained agent reducing pose error vs the untrained agent,
3. the expert's 10-step error as the floor.

Runs anywhere (CPU ok); no dataset on disk required::

    python examples/convergence_demo.py [--geo-steps N] [--agent-steps M]

``--full`` switches from the tiny config to full KITTI scale (40960
points, 160x512 images, bf16 activations) — the TPU convergence evidence
recorded in docs/CONVERGENCE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from cmr_agent_tpu.config import tiny_config
from cmr_agent_tpu.data import SyntheticDataset, DataLoader, collate
from cmr_agent_tpu.env import (TrajectoryBuffer, init_poses, expert_action,
                               apply_action, run_episode)
from cmr_agent_tpu.ops import pose_diff, to_disentangled
from cmr_agent_tpu.train import (create_geo_state, make_geo_train_step,
                                 create_agent_state, make_rollout_fn,
                                 make_ppo_update_step, make_val_episode_fn,
                                 registration_metrics)
from cmr_agent_tpu.train.train_geo import (make_geo_forward,
                                            wrap_oracle_overlap)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--geo-steps", type=int, default=40)
    p.add_argument("--agent-steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--full", action="store_true",
                   help="full KITTI scale (bf16) instead of the tiny config")
    p.add_argument("--embed-dim", type=int, default=0,
                   help="override cfg.embed_dim (0 keeps the config "
                        "default). Capacity probe for the CONVERGENCE.md "
                        "section-11 finding that the reference-scale "
                        "64-channel encoder cannot fit synthetic overlap "
                        "localisation at the full protocol: e.g. "
                        "--embed-dim 128 doubles every feature width "
                        "(image/point branches, fusion, heads) — all "
                        "shapes derive from the config, nothing else to "
                        "change")
    p.add_argument("--mlp-dim", type=int, default=0,
                   help="override cfg.mlp_dim (ViT MLP width); 0 keeps "
                        "the config default. Usually scaled with "
                        "--embed-dim (reference ratio is 16x embed_dim)")
    p.add_argument("--t-amp", type=float, default=None,
                   help="translation perturbation amplitude (m); the KITTI "
                        "default +-10 m throws most of a random synthetic "
                        "cloud out of the frustum, starving the 2-D "
                        "observation — a reduced amplitude keeps the demo's "
                        "imitation problem observable")
    p.add_argument("--r-amp", type=float, default=None,
                   help="yaw perturbation amplitude (rad)")
    p.add_argument("--scene", default="random",
                   choices=["random", "structured"],
                   help="'structured' (persistent ground+boxes + rendered "
                        "image) keeps the full reference +-10 m/+-pi "
                        "protocol observable — use it with NO --t-amp/"
                        "--r-amp reduction for the full-amplitude run")
    p.add_argument("--pool-size", type=int, default=16,
                   help="scenes per training pool")
    p.add_argument("--refresh-every", type=int, default=0,
                   help="regenerate the training pool (fresh scenes AND "
                        "fresh perturbations via dataset.set_epoch) every N "
                        "agent steps; 0 keeps the historical fixed-pool "
                        "behaviour. At the full +-10 m/+-pi protocol a "
                        "frozen 16-perturbation pool is far too sparse to "
                        "learn from (round-3 run: agreement 24%% but RTE "
                        "diverged); refreshing makes the perturbation "
                        "space effectively unlimited, like a real dataset")
    p.add_argument("--geo-refresh-every", type=int, default=0,
                   help="same for geo training steps; 0 = fixed pool")
    p.add_argument("--geo-curriculum", type=float, default=0.0,
                   help="amplitude curriculum for the GEO stage: the "
                        "training pool's yaw amplitude ramps linearly from "
                        "--geo-r-start to the full configured amplitude "
                        "over this fraction of geo steps (translation "
                        "stays at full amplitude throughout; the held-out "
                        "pool always draws at full amplitude). Motivated "
                        "by docs/CONVERGENCE.md section 13: held-out "
                        "overlap generalisation turns on at +-45 deg but "
                        "is blind cold at +-90 deg within the budget — "
                        "this tests whether warm low-amplitude perception "
                        "extends the frontier. Requires "
                        "--geo-refresh-every; 0 disables")
    p.add_argument("--geo-r-start", type=float, default=0.7854,
                   help="starting yaw amplitude (rad) for "
                        "--geo-curriculum (default pi/4, the measured "
                        "turn-on point of the amplitude-frontier study)")
    p.add_argument("--geo-select-ir", action="store_true",
                   help="select the best geo snapshot by held-out matching "
                        "inlier ratio instead of overlap accuracy — for "
                        "runs whose consumer is the cost volume (which "
                        "matches circle-loss features under explicit "
                        "hypothesis warps) rather than the overlap head")
    p.add_argument("--geo-warm-start", action="store_true",
                   help="with --load-geo: continue stage-1 training from "
                        "the checkpoint instead of skipping it (fresh "
                        "optimizer state) — a two-phase curriculum across "
                        "separate runs, e.g. train at +-45 deg, then warm-"
                        "start a +-90 deg run from the saved snapshot")
    p.add_argument("--curriculum", type=float, default=0.0,
                   help="fraction of agent steps over which the TRAINING "
                        "perturbation amplitude ramps 0.15->1.0 of full "
                        "(validation always runs at full amplitude). "
                        "Standard imitation-learning trick: early pools "
                        "keep the policy near states where BC labels are "
                        "informative; 0 disables. Requires --refresh-every")
    p.add_argument("--amp-mixture", action="store_true",
                   help="per-sample amplitude mixture instead of a time "
                        "curriculum: every pool sample draws its own "
                        "(t, r) amplitude from the reference's T_list/"
                        "R_list design (NuScenesDataset.py:64-65, dead "
                        "upstream) — easy samples anchor BC while "
                        "full-amplitude ones train the hard regime from "
                        "step 0. Applies to geo and agent pools; "
                        "overrides --curriculum; requires --refresh-every")
    p.add_argument("--w-entropy", type=float, default=None,
                   help="override cfg.w_entropy (the PPO entropy bonus): "
                        "at +-pi yaw the deterministic-argmax policy can "
                        "fall into a rotation-frozen local optimum (always "
                        "the 0-degree step scores a constant val RRE equal "
                        "to the initial error); a larger entropy bonus "
                        "keeps rotation exploration alive long enough for "
                        "the PPO term to reward committed rotation")
    p.add_argument("--expert-beta-frac", type=float, default=0.0,
                   help="DAgger scheduled sampling: rollouts take the "
                        "EXPERT action with probability beta, annealed "
                        "1->0 over this fraction of agent steps. The "
                        "reference's pure on-policy BC (beta=0) parks "
                        "early rollouts in far states whose labels are "
                        "all saturated max-steps — at the full +-10 m/"
                        "+-pi protocol it never recovers (round-3 runs A/"
                        "B). beta-annealing visits the expert's own "
                        "state distribution first, then hands over")
    p.add_argument("--expert-beta-floor", type=float, default=0.0,
                   help="lower bound for the annealed expert beta: keep "
                        "this fraction of expert actions in rollouts for "
                        "the whole run, so the buffer never loses the "
                        "expert's state distribution (round-3 run D: full "
                        "anneal to 0 let the on-policy phase re-collapse "
                        "onto the max-step action marginal)")
    p.add_argument("--alpha", type=float, default=None,
                   help="override cfg.alpha (PPO weight vs BC); 0 = pure "
                        "behaviour cloning")
    p.add_argument("--pose-aware", action="store_true",
                   help="pose-aware 3-D observation (Config."
                        "pose_aware_observation): the point branch sees the "
                        "cloud under the current estimate, so consecutive "
                        "observations differ even when a large yaw error "
                        "empties the raster — the repeat-action translation "
                        "runaway of runs D/E cannot occur")
    p.add_argument("--obs-bearing", action="store_true",
                   help="append the overlap-sector bearing (unit x,z of "
                        "its centroid under the current estimate) as two "
                        "3-D observation channels — the diagnose_agent "
                        "oracle shows yaw direction is an ~0.88-accurate "
                        "function of this statistic while trained "
                        "policies guess it (docs/CONVERGENCE.md sec. 9)")
    p.add_argument("--lr", type=float, default=None,
                   help="override cfg.lr for BOTH stages")
    p.add_argument("--lr-epoch-steps", type=int, default=0,
                   help="pace the agent's StepLR schedule: optimizer steps "
                        "per 'epoch' (decay x0.6 every step_size=4 "
                        "epochs). The historical default (1000) decays "
                        "every ~400 demo agent steps — each agent step "
                        "runs ~K*B/ppo_batch optimizer updates — so runs "
                        "beyond ~4000 steps train at lr < 1e-5: the "
                        "round-3 A-F plateaus were partly a dead learning "
                        "rate, not a learnability ceiling. 0 keeps the "
                        "historical default; pass e.g. total_updates/16 "
                        "to spread the reference's 16 decays (64 epochs / "
                        "step_size 4, KittiConfig.py:35-38) over the run")
    p.add_argument("--load-agent", default="",
                   help="orbax dir to warm-start the agent from (a "
                        "--save-agent snapshot; optimizer state starts "
                        "fresh)")
    p.add_argument("--save-geo", default="",
                   help="orbax dir to save the stage-1 geo model to (the "
                        "full-scale geo stage costs ~27 min on one chip; "
                        "saving it lets ablation runs share it)")
    p.add_argument("--load-geo", default="",
                   help="orbax dir to load the geo model from, skipping "
                        "stage 1 (must match the config's scale)")
    p.add_argument("--save-agent", default="",
                   help="orbax dir to save the best-validation agent "
                        "snapshot to (params + batch_stats), for later "
                        "evaluation/visualisation")
    p.add_argument("--val-every", type=int, default=0,
                   help="validate (and consider a best snapshot) every N "
                        "agent steps; 0 = max(10, agent_steps/8)")
    p.add_argument("--aux-head", action="store_true",
                   help="feed the bearing statistic straight into the "
                        "policy/value heads (Config.policy_aux_state; "
                        "implies --obs-bearing)")
    p.add_argument("--bearing-init", action="store_true",
                   help="coarse-to-fine: start every episode (rollout and "
                        "eval) from the bearing-aligned yaw "
                        "(Config.bearing_init)")
    p.add_argument("--oracle-overlap", action="store_true",
                   help="ABLATION: feed the agent ground-truth overlap "
                        "flags instead of the geo head's predictions, "
                        "which memorise the training scenes "
                        "(docs/CONVERGENCE.md section 11); results are "
                        "labelled oracle-perception")
    p.add_argument("--select-median", action="store_true",
                   help="pick the best-validation snapshot by (solved "
                        "scenes, median RRE + 2*median RTE) instead of the "
                        "outlier-dominated mean score (CONVERGENCE.md "
                        "section 9)")
    p.add_argument("--stop-file", default="",
                   help="graceful stop: when this file appears, finish the "
                        "current step, run the final evaluation and save "
                        "snapshots. Killing the process mid-TPU-step can "
                        "wedge the device grant on remote runtimes — this "
                        "is the safe way to cut a run short")
    p.add_argument("--val-size", type=int, default=0,
                   help="held-out validation scenes at FULL amplitude "
                        "(fixed seed, disjoint from training); 0 = "
                        "historical behaviour (validate on the train pool)")
    args = p.parse_args(argv)
    if args.select_median and not args.val_size:
        # without a held-out pool, eval_agent scores the *train* pool,
        # which --refresh-every/--curriculum regenerate at varying
        # difficulty — solved counts across pools of different difficulty
        # are not comparable, so the lexicographic selection would freeze
        # on the easiest pool
        p.error("--select-median requires --val-size (a fixed held-out "
                "validation pool)")
    if args.geo_curriculum > 0 and not args.geo_refresh_every:
        # the curriculum acts through pool regeneration; without refresh
        # the initial reduced-amplitude pool would silently train forever
        p.error("--geo-curriculum requires --geo-refresh-every")
    if args.geo_warm_start and not args.load_geo:
        p.error("--geo-warm-start requires --load-geo (the snapshot to "
                "continue from)")

    from cmr_agent_tpu.cli.common import apply_obs_overrides

    fps_fn = nn_fn = None
    if args.full:
        from cmr_agent_tpu.config import kitti_config
        jax.config.update("jax_compilation_cache_dir", "/tmp/cmr_jax_cache")
        cfg = kitti_config(compute_dtype="bfloat16",
                           train_batch_size=args.batch_size,
                           num_trajectory=2, ppo_batch_size=8)
        from cmr_agent_tpu.native import get_fast_host_ops
        fps_fn, nn_fn = get_fast_host_ops()
    else:
        cfg = tiny_config(train_batch_size=args.batch_size,
                          num_trajectory=2, ppo_batch_size=8)
    # one shared flag->config mapping for every CLI/tool (cli.common)
    cfg = apply_obs_overrides(cfg, args)

    def scaled_cfg(scale: float, r_scale: float | None = None):
        """cfg with training perturbation amplitudes scaled (curriculum /
        mixture). ``r_scale`` defaults to ``scale`` (coupled)."""
        import dataclasses
        rs = scale if r_scale is None else r_scale
        if scale >= 1.0 and rs >= 1.0:
            return cfg
        return dataclasses.replace(
            cfg,
            p_tx_amplitude=cfg.p_tx_amplitude * scale,
            p_ty_amplitude=cfg.p_ty_amplitude * scale,
            p_tz_amplitude=cfg.p_tz_amplitude * scale,
            p_rx_amplitude=cfg.p_rx_amplitude * rs,
            p_ry_amplitude=cfg.p_ry_amplitude * rs,
            p_rz_amplitude=cfg.p_rz_amplitude * rs)

    # Per-sample amplitude mixture, the reference's own (dead-code) design:
    # NuScenesDataset.py:64-65 defines T_list=[0.5..10] m and
    # R_list=[0.9..180] deg for random_RT_amplitude — every training sample
    # draws its own difficulty, so easy samples anchor BC while hard ones
    # feed the full-protocol signal from step 0. Expressed as fractions of
    # the full amplitude:
    T_MIX = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
    R_MIX = (0.005, 0.01, 0.02, 0.04, 0.08, 0.16, 0.32, 0.64, 1.0)

    def make_pool(length: int, *, seed: int, epoch: int = 0,
                  scale: float = 1.0, r_scale: float | None = None,
                  shuffle: bool = True, mixture: bool = False):
        """Materialise a pool of device batches: fresh scenes AND fresh
        perturbations per (seed, epoch). All shapes are constant across
        pools, so the compiled train/rollout programs are reused. With
        ``mixture=True`` every sample draws its own (t, r) amplitude pair
        from T_MIX x R_MIX (mixed WITHIN each batch). ``r_scale``
        decouples the yaw amplitude from ``scale`` (geo curriculum keeps
        translation at full amplitude while ramping yaw)."""
        if not mixture:
            ds = SyntheticDataset(scaled_cfg(scale, r_scale), length=length,
                                  seed=seed, fps_fn=fps_fn, nn_fn=nn_fn,
                                  scene=args.scene)
            ds.set_epoch(epoch)
            loader = DataLoader(ds, args.batch_size, shuffle=shuffle,
                                num_workers=0, seed=seed + epoch)
            return [dict((k, jnp.asarray(v)) for k, v in b.items())
                    for b in loader]
        rng = np.random.default_rng((seed, epoch, 77))
        samples = []
        for i in range(length):
            t_s = float(rng.choice(T_MIX))
            r_s = float(rng.choice(R_MIX))
            ds = SyntheticDataset(scaled_cfg(t_s, r_s), length=length,
                                  seed=seed, fps_fn=fps_fn, nn_fn=nn_fn,
                                  scene=args.scene)
            ds.set_epoch(epoch)
            samples.append(ds[i])
        order = rng.permutation(length) if shuffle else np.arange(length)
        bs = args.batch_size
        return [dict((k, jnp.asarray(v)) for k, v in
                     collate([samples[j] for j in order[s:s + bs]]).items())
                for s in range(0, length - bs + 1, bs)]

    # ---- stage 1: geo model ----
    def geo_r_scale(i: int) -> float:
        """Geo-curriculum yaw-amplitude scale at geo step ``i``: linear
        ramp from --geo-r-start to the full configured amplitude over
        --geo-curriculum * geo_steps, then flat at 1.0."""
        if args.geo_curriculum <= 0:
            return 1.0
        target = max(cfg.p_ry_amplitude, 1e-9)
        start = min(1.0, args.geo_r_start / target)
        ramp = max(1.0, args.geo_curriculum * args.geo_steps)
        return min(1.0, start + (1.0 - start) * i / ramp)

    batches = make_pool(args.pool_size, seed=0, mixture=args.amp_mixture,
                        r_scale=geo_r_scale(0))
    # held-out validation pool: full amplitude always, disjoint seed
    val_batches = (make_pool(args.val_size, seed=7919, shuffle=False)
                   if args.val_size > 0 else None)
    geo_state = create_geo_state(cfg, batches[0], jax.random.key(0))
    geo_step = make_geo_train_step(cfg)
    raw_fwd = make_geo_forward(cfg)
    # oracle-perception ablation (shared wrapper — section 11); results
    # produced under --oracle-overlap are labelled as an ablation
    fwd = (wrap_oracle_overlap(raw_fwd) if args.oracle_overlap
           else raw_fwd)

    def geo_holdout_overlap(state):
        """Held-out per-point overlap accuracy / prediction rate / gt rate.

        The training-pool accuracy the stage prints at the end is measured
        on scenes the model trains on; run J's geo read 0.991 there while
        collapsing to 1.8%-firing majority-class predictions on the
        held-out pool (below the ~0.87 majority baseline) — which starves
        every downstream signal (raster, overlap flags, bearing). This
        metric makes that visible in-run (docs/CONVERGENCE.md section 11).
        """
        if val_batches is None:
            return None
        from cmr_agent_tpu.models.multi_head import matching_inlier_ratio
        ir_fn = jax.jit(jax.vmap(
            lambda pf, imf, m, xy: matching_inlier_ratio(
                pf, imf, m, xy, cfg.image_w, cfg.image_h)))
        accs, rates, gts, irs = [], [], [], []
        for vb in val_batches:
            out = raw_fwd(state.params, state.batch_stats, vb)
            pred = np.asarray(out["pc_overlap_pred"])
            gt = np.asarray(vb["pc_mask"]).astype(bool)
            accs.append((pred == gt).mean())
            rates.append(pred.mean())
            gts.append(gt.mean())
            # circle-loss feature quality, independent of the overlap head:
            # held-out matching inlier ratio (Test_Geo protocol, <=3 px)
            irs.append(float(np.mean(np.asarray(ir_fn(
                out["pc_geo_feat"], out["img_geo_feat"],
                jnp.asarray(vb["pc_mask"]).astype(bool),
                vb["point_xy_float_all"])))))
        return (float(np.mean(accs)), float(np.mean(rates)),
                float(np.mean(gts)), float(np.mean(irs)))

    t0 = time.time()
    losses = []
    if args.load_geo:
        from cmr_agent_tpu.train.checkpoint import restore_checkpoint
        tpl = {"params": geo_state.params,
               "batch_stats": geo_state.batch_stats}
        m = restore_checkpoint(args.load_geo, template=tpl)
        geo_state = geo_state.replace(params=m["params"],
                                      batch_stats=m["batch_stats"])
        losses = [float("nan")]
        print(f"[geo] loaded from {args.load_geo}"
              + ("" if args.geo_warm_start else ", skipping stage 1"),
              flush=True)
    if args.load_geo and not args.geo_warm_start:
        pass
    else:
        if args.geo_warm_start:
            losses = []
        from cmr_agent_tpu.train.checkpoint import save_checkpoint

        def _save_geo():
            save_checkpoint(args.save_geo,
                            {"params": geo_state.params,
                             "batch_stats": geo_state.batch_stats})

        best_geo_acc = -1.0
        for i in range(args.geo_steps):
            if args.stop_file and os.path.exists(args.stop_file):
                print(f"[geo] stop-file {args.stop_file} found at step {i}",
                      flush=True)
                break
            if (args.geo_refresh_every and i > 0
                    and i % args.geo_refresh_every == 0):
                batches = make_pool(args.pool_size, seed=0,
                                    epoch=i // args.geo_refresh_every,
                                    mixture=args.amp_mixture,
                                    r_scale=geo_r_scale(i))
            geo_state, metrics = geo_step(geo_state,
                                          batches[i % len(batches)],
                                          jax.random.key(i))
            losses.append(float(metrics["loss"]))
            if i % 10 == 0:
                print(f"[geo] step {i:3d} loss {losses[-1]:.4f}", flush=True)
            if val_batches is not None and i > 0 and \
                    i % max(100, args.geo_steps // 20) == 0:
                acc, rate, gtr, ir = geo_holdout_overlap(geo_state)
                # keep the BEST held-out snapshot, saved incrementally
                # (like the agent stage): the held-out accuracy
                # oscillates ~1pp between checkpoints, so the final
                # state can be a weak point (run P1: final 0.884 with
                # pred-rate 0.025 vs best 0.895 with 0.134)
                tag = ""
                sel = ir if args.geo_select_ir else acc
                if args.save_geo and sel > best_geo_acc:
                    best_geo_acc = sel
                    _save_geo()
                    tag = "  *saved*"
                amp = (f" train-r-amp {geo_r_scale(i) * cfg.p_ry_amplitude:.3f}"
                       if args.geo_curriculum > 0 else "")
                print(f"[geo-val] step {i:3d} pc-acc {acc:.3f} "
                      f"pred-rate {rate:.3f} gt-rate {gtr:.3f} "
                      f"IR {ir:.3f}{amp}{tag}", flush=True)
        print(f"[geo] loss {losses[0]:.4f} -> {losses[-1]:.4f} "
              f"({time.time()-t0:.0f}s)")
        if args.geo_curriculum <= 0 and not args.geo_warm_start:
            # with a curriculum the pool difficulty GROWS over the run and
            # a warm start begins already-descended, so first-vs-last loss
            # is not a monotone descent check in either mode
            assert losses[-1] < losses[0]
        print(f"[geo] overlap acc: "
              f"pc {float(metrics['pc_overlap_accuracy']):.3f}"
              f" img {float(metrics['img_overlap_accuracy']):.3f}",
              flush=True)
        if args.save_geo:
            final_hold = geo_holdout_overlap(geo_state)
            sel_idx = 3 if args.geo_select_ir else 0
            if final_hold is None or final_hold[sel_idx] > best_geo_acc:
                _save_geo()
                print(f"[geo] saved to {args.save_geo}", flush=True)
            else:
                # reload the best snapshot so the in-process agent stage
                # (and the returned holdout numbers) use what was saved
                from cmr_agent_tpu.train.checkpoint import (
                    restore_checkpoint)
                m = restore_checkpoint(
                    args.save_geo,
                    template={"params": geo_state.params,
                              "batch_stats": geo_state.batch_stats})
                geo_state = geo_state.replace(
                    params=m["params"], batch_stats=m["batch_stats"])
                print(f"[geo] kept best held-out snapshot in "
                      f"{args.save_geo} "
                      f"({'IR' if args.geo_select_ir else 'acc'} "
                      f"{best_geo_acc:.3f} > final "
                      f"{final_hold[sel_idx]:.3f}) and reloaded it",
                      flush=True)

    holdout = geo_holdout_overlap(geo_state)
    if holdout is not None:
        print(f"[geo-val] final pc-acc {holdout[0]:.3f} "
              f"pred-rate {holdout[1]:.3f} gt-rate {holdout[2]:.3f} "
              f"IR {holdout[3]:.3f}", flush=True)
    if args.agent_steps == 0:
        # geo-only run (e.g. the held-out-overlap diversity experiments)
        return {"geo_losses": losses, "geo_holdout": holdout}

    # ---- stage 2: agent by behaviour cloning ----
    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    agent_state = create_agent_state(
        cfg, jnp.zeros((args.batch_size, h, w, 2 * f)),
        jnp.zeros((args.batch_size, cfg.num_pt, cfg.obs3d_channels)), jax.random.key(1),
        steps_per_epoch=args.lr_epoch_steps or 1000)
    # deep-copy: the PPO update donates its input state's buffers
    untrained = jax.tree.map(jnp.copy, agent_state)
    if args.load_agent:
        from cmr_agent_tpu.train.checkpoint import restore_model_variables
        av = restore_model_variables(
            args.load_agent, {"params": agent_state.params,
                              "batch_stats": agent_state.batch_stats})
        agent_state = agent_state.replace(params=av["params"],
                                          batch_stats=av["batch_stats"])
        print(f"[agent] warm-started from {args.load_agent}", flush=True)

    # Decay cadence up front: each agent step runs ~B*K/ppo_batch optimizer
    # updates, so StepLR (step_size epochs of lr_epoch_steps updates) decays
    # every step_size*lr_epoch_steps/updates_per_step agent steps. Runs A-F
    # silently trained at lr <= 1.3e-4 after step 2000 because nothing
    # printed this (docs/CONVERGENCE.md section 4).
    upd_per_step = max(1, (args.batch_size * cfg.action_num)
                       // cfg.ppo_batch_size)
    eff_epoch = args.lr_epoch_steps or 1000
    print(f"[agent] lr {cfg.lr:g}, x{cfg.scheduler_gamma:g} every "
          f"{cfg.step_size * eff_epoch // upd_per_step} agent steps "
          f"(~{upd_per_step} updates/step, lr-epoch-steps {eff_epoch})",
          flush=True)

    rollout = make_rollout_fn(cfg)
    update = make_ppo_update_step(cfg)
    val = make_val_episode_fn(cfg)

    @jax.jit
    def rollout_det(agent_state, geo_out, batch):
        from cmr_agent_tpu.train.train_agent import _episode_state
        state = _episode_state(geo_out, batch)
        pose_src, pose_tgt = init_poses(state)
        if cfg.bearing_init:
            from cmr_agent_tpu.env import bearing_init_pose
            pose_src = bearing_init_pose(state)
        pose_tgt = to_disentangled(pose_tgt, state["pc"])
        apply_fn = lambda v, o2, o3: agent_state.apply_fn(v, o2, o3,
                                                          train=False)
        avars = {"params": agent_state.params,
                 "batch_stats": agent_state.batch_stats}
        return run_episode(apply_fn, avars, state, pose_src, pose_tgt, cfg,
                           deterministic=True, with_expert=True,
                           collect_trajectory=True)[1], 0, 0
    buffer = TrajectoryBuffer(cfg.gamma, cfg.gae_lambda)
    rng = np.random.default_rng(0)

    def eval_agent(state, detail: bool = False):
        rte_all, rre_all = [], []
        for batch in (val_batches if val_batches is not None else batches):
            geo_out = fwd(geo_state.params, geo_state.batch_stats, batch)
            _, rte, rre = val(state, geo_out, batch)
            rte_all += np.asarray(rte).tolist()
            rre_all += np.asarray(rre).tolist()
        rte_a, rre_a = np.asarray(rte_all), np.asarray(rre_all)
        stats = {"median_rte": float(np.median(rte_a)),
                 "median_rre": float(np.median(rre_a)),
                 "solved": int(((rre_a < 10.0) & (rte_a < 5.0)).sum()),
                 "n": len(rte_a)}
        if detail:
            # mean RRE is dominated by wrap-region stragglers (a single
            # yaw~180 sample reads ~360 on the euler-sum metric); median +
            # solved count tell "half solved" apart from "uniformly stuck"
            print(f"[val-detail] solved(RR thresholds) "
                  f"{stats['solved']}/{stats['n']}"
                  f"  median RTE {stats['median_rte']:.2f}"
                  f"  median RRE {stats['median_rre']:.2f}", flush=True)
        return float(np.mean(rte_all)), float(np.mean(rre_all)), stats

    # Best-validation selection over the run, like the reference's
    # save-on-improvement protocol (Train_Agent.py:170-212): on-policy BC
    # is noisy late in training, so the returned agent is the best
    # val snapshot, not the final step. Score weights RRE:RTE as the
    # registration-recall thresholds do (10 deg : 5 m).
    val_every = args.val_every or max(10, args.agent_steps // 8)
    best_score, best_snap = (np.inf, np.inf), None

    def cur_scale(i: int) -> float:
        """Curriculum amplitude scale at agent step ``i`` (0.15 -> 1.0)."""
        if args.curriculum <= 0:
            return 1.0
        ramp = max(1.0, args.curriculum * args.agent_steps)
        return min(1.0, 0.15 + 0.85 * i / ramp)

    t0 = time.time()
    bc_first = bc_last = None
    for i in range(args.agent_steps):
        if args.stop_file and os.path.exists(args.stop_file):
            print(f"[agent] stop-file {args.stop_file} found at step {i}",
                  flush=True)
            break
        if args.refresh_every and i % args.refresh_every == 0:
            # agent-stage pools: own seed stream (disjoint from geo's),
            # fresh scenes + perturbations, curriculum- or mixture-scaled
            batches = make_pool(args.pool_size, seed=1000,
                                epoch=i // args.refresh_every,
                                scale=cur_scale(i),
                                mixture=args.amp_mixture)
        batch = batches[i % len(batches)]
        geo_out = fwd(geo_state.params, geo_state.batch_stats, batch)
        if args.expert_beta_frac > 0 or args.expert_beta_floor > 0:
            if args.expert_beta_frac > 0:
                ramp = args.expert_beta_frac * args.agent_steps
                annealed = 1.0 - i / max(1.0, ramp)
            else:           # floor-only: constant mixing from step 0
                annealed = 0.0
            beta = jnp.asarray(max(args.expert_beta_floor, annealed),
                               jnp.float32)
            traj, _, _ = rollout(agent_state, geo_out, batch,
                                 jax.random.key(i), beta)
        else:
            traj, _, _ = rollout(agent_state, geo_out, batch,
                                 jax.random.key(i))
        buffer.add(traj)
        if len(buffer) == cfg.num_trajectory:
            samples = buffer.samples()
            n = samples["state_2d"].shape[0]
            order = rng.permutation(n)
            for s in range(0, n - cfg.ppo_batch_size + 1, cfg.ppo_batch_size):
                rows = jnp.asarray(order[s:s + cfg.ppo_batch_size])
                mb = {k: jnp.take(v, rows, axis=0)
                      for k, v in samples.items()}
                agent_state, m = update(agent_state, mb)
                bc_last = float(m["bc_loss"])
                if bc_first is None:
                    bc_first = bc_last
            buffer.clear()
            print(f"[agent] step {i:3d} bc_loss {bc_last:.4f}", flush=True)
        if (i + 1) % val_every == 0 or i == args.agent_steps - 1:
            v_rte, v_rre, v_stats = eval_agent(agent_state, detail=True)
            if args.select_median:
                # lexicographic: maximise solved scenes (the actual RR
                # target), tie-break by the outlier-robust median score.
                # Run K's mean-based selection picked a step-1199 snapshot
                # over step-4199/4799 ones with 4x the expert agreement
                # because the mean is dominated by the wrap-region
                # stragglers (docs/CONVERGENCE.md section 9).
                score = (-v_stats["solved"],
                         v_stats["median_rre"] + 2.0 * v_stats["median_rte"])
            else:
                score = (0, v_rre + 2.0 * v_rte)
            # a diverged validation (NaN) must never win: with tuple scores
            # (0, nan) < (inf, inf) is True on the constant first element,
            # unlike the old scalar nan < inf
            if not all(np.isfinite(s) for s in score):
                score = best_score
            mark = " *" if score < best_score else ""
            # per-head expert agreement on one val batch: splits "policy
            # can't infer rotation" from "can't infer translation" (run D
            # diverged in translation only; this makes that visible live)
            vb = (val_batches if val_batches is not None else batches)[0]
            tr, _, _ = rollout_det(
                agent_state, fwd(geo_state.params, geo_state.batch_stats,
                                 vb), vb)
            ag_r = float((np.asarray(tr["action_r"])
                          == np.asarray(tr["expert_action_r"])).mean())
            ag_t = float((np.asarray(tr["action_t"])
                          == np.asarray(tr["expert_action_t"])).mean())
            # current lr from the schedule at the optimizer-update counter:
            # the dead-lr defect behind runs A-F was invisible because no
            # per-run log line carried it (docs/CONVERGENCE.md section 4)
            from cmr_agent_tpu.train.optim import make_lr_schedule
            cur_lr = float(make_lr_schedule(
                cfg, args.lr_epoch_steps or 1000)(int(agent_state.step)))
            print(f"[agent] step {i:3d} val RTE {v_rte:.3f} RRE {v_rre:.3f}"
                  f" agree r {ag_r:.2f} t {ag_t:.2f}"
                  f" lr {cur_lr:.2e}{mark}", flush=True)
            if score < best_score:
                best_score = score
                # snapshot params AND BatchNorm running stats: the eval
                # behaviour depends on both
                best_snap = jax.tree.map(
                    jnp.copy, (agent_state.params, agent_state.batch_stats))
                if args.save_agent:
                    # persist on every improvement (orbax overwrite): a
                    # multi-hour run that dies late must not lose its best
                    # snapshot to the end-of-run save
                    from cmr_agent_tpu.train.checkpoint import save_checkpoint
                    save_checkpoint(args.save_agent,
                                    {"params": best_snap[0],
                                     "batch_stats": best_snap[1]})
    if bc_first is not None:
        print(f"[agent] bc_loss {bc_first:.4f} -> {bc_last:.4f} "
              f"({time.time()-t0:.0f}s)")
    if best_snap is not None:
        agent_state = agent_state.replace(params=best_snap[0],
                                          batch_stats=best_snap[1])
    if args.save_agent:
        from cmr_agent_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.save_agent,
                        {"params": agent_state.params,
                         "batch_stats": agent_state.batch_stats})
        print(f"[agent] best snapshot saved to {args.save_agent}",
              flush=True)

    # ---- evaluation ----
    def eval_agreement(state):
        """Deterministic-policy agreement with the expert along its own
        trajectory (what behaviour cloning optimises)."""
        agree, total = 0, 0
        for batch in (val_batches if val_batches is not None else batches):
            geo_out = fwd(geo_state.params, geo_state.batch_stats, batch)
            traj, _, _ = rollout_det(state, geo_out, batch)
            for k in ("r", "t"):
                a = np.asarray(traj[f"action_{k}"])
                e = np.asarray(traj[f"expert_action_{k}"])
                agree += (a == e).sum()
                total += a.size
        return agree / total

    def eval_expert():
        r_steps = jnp.asarray(cfg.r_steps_array())
        t_steps = jnp.asarray(cfg.t_steps_array())
        rte_all, rre_all = [], []
        for batch in (val_batches if val_batches is not None else batches):
            pose, tgt = init_poses(batch)
            tgt = to_disentangled(tgt, batch["pc"])
            for _ in range(cfg.action_num):
                ar, at = expert_action(pose, tgt, r_steps, t_steps)
                pose = apply_action(ar, at, pose, r_steps, t_steps)
            rte, rre = pose_diff(pose, tgt)
            rte_all += np.asarray(rte).tolist()
            rre_all += np.asarray(rre).tolist()
        return float(np.mean(rte_all)), float(np.mean(rre_all))

    u_agree = eval_agreement(untrained)
    t_agree = eval_agreement(agent_state)
    u_rte, u_rre, _ = eval_agent(untrained, detail=True)
    t_rte, t_rre, _ = eval_agent(agent_state, detail=True)
    e_rte, e_rre = eval_expert()
    print("\n                 expert-agreement   RTE (m)   RRE (deg)")
    print(f"untrained agent        {u_agree:6.1%}   {u_rte:8.3f} {u_rre:10.3f}")
    print(f"trained agent          {t_agree:6.1%}   {t_rte:8.3f} {t_rre:10.3f}")
    print(f"expert (floor)              -   {e_rte:8.3f} {e_rre:10.3f}")
    assert t_agree > u_agree, "BC should raise expert-action agreement"
    return {"agreement": (u_agree, t_agree),
            "untrained": (u_rte, u_rre), "trained": (t_rte, t_rre),
            "expert": (e_rte, e_rre), "geo_losses": losses,
            "bc": (bc_first, bc_last)}


if __name__ == "__main__":
    main()
