"""Evaluate iterative agent registration (reference Test_Agent.py).

Runs the full episode (geo forward + K deterministic refinement steps) per
batch and reports Registration Recall, RTE/RRE mean/std and episode timing
— the reference's headline metrics (Test_Agent.py:193-206).

Usage::

    python -m cmr_agent_tpu.cli.test_agent --dataset synthetic --tiny
    python -m cmr_agent_tpu.cli.test_agent --dataset kitti --data-root ... \
        --geo-ckpt .../geo_feat.pth --agent-ckpt .../agent.pth
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pose_diff
from ..train import (create_agent_state, make_val_episode_fn,
                     restore_model_variables,
                     registration_metrics, convert_torch_agent)
from ..train.train_geo import make_geo_forward
from .common import (add_common_args, apply_obs_overrides,
                     build_config, build_dataset,
                     make_loader, maybe_initialize_distributed, set_seed)
from .train_agent import load_geo_variables


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--geo-ckpt", default="")
    p.add_argument("--agent-ckpt", default="",
                   help="orbax checkpoint dir or reference agent.pth")
    p.add_argument("--iter-ckpt", default="",
                   help="coarse-to-fine: an IterModel checkpoint (orbax "
                        "dir or torch .pth) runs --iter-iters cost-volume "
                        "iterations FIRST, the problem is re-based under "
                        "the coarse pose (env.apply_coarse_pose), the geo "
                        "model re-perceives the near-aligned cloud, and "
                        "the agent refines from there. Composes the "
                        "reference's two alternative pose heads "
                        "(IterModel + CMRAgent) into one pipeline — the "
                        "cost volume's hypothesis warps cover the +-pi "
                        "yaw regime where one-shot overlap perception is "
                        "blind, the agent covers fine refinement")
    p.add_argument("--iter-iters", type=int, default=2,
                   help="cost-volume iterations before the agent episode")
    p.add_argument("--iter-hypotheses", type=int, default=1,
                   help="multi-hypothesis composition: refine the top-N "
                        "yaw candidates of the FIRST cost-volume decode "
                        "through the full fine stage (re-perception + "
                        "agent episode) and keep, per sample, the "
                        "candidate with the best ground-truth-free "
                        "feature-alignment score (env.alignment_score). "
                        "At +-pi the first decode's yaw accuracy caps the "
                        "pipeline (docs/CONVERGENCE.md section 16); "
                        "verification recovers the scenes where the true "
                        "yaw bin is ranked 2nd..Nth. Costs N fine stages. "
                        "1 = single-hypothesis (reference-style decode)")
    p.add_argument("--hypo-score", default="smooth_mean",
                   choices=["smooth_mean", "sum_norm", "mean_valid",
                            "frac_valid", "above50_norm", "above70_norm",
                            "ir_smooth", "ir_mean", "ir_norm", "combo"],
                   help="which verification statistic selects among "
                        "--iter-hypotheses candidates: the "
                        "env.alignment_stats cosine family, the "
                        "env.nn_alignment_stats spatial-consistency "
                        "(matching-IR-at-pose) family, or 'combo' — "
                        "z(smooth_mean) + 0.3 z(ir_smooth), z-scored "
                        "across the candidates per sample (all "
                        "statistics are computed and reported; with "
                        "--save-mat the full per-candidate matrices are "
                        "dumped for offline selector study)")
    p.add_argument("--refine-rounds", type=int, default=0,
                   help="after the (selected) fine stage, run this many "
                        "verified refinement rounds: re-base the problem "
                        "under the composed estimate "
                        "(env.compose_disentangled + apply_coarse_pose), "
                        "re-perceive with the fine geo model, run another "
                        "agent episode, and ACCEPT the new estimate only "
                        "where the verification statistic improves over "
                        "the incumbent (scored in the same perception "
                        "frame). Targets episodes that stall mid-basin "
                        "(18-45 deg residual) — a fresh perception pass "
                        "on the nearly-aligned cloud re-aims them. "
                        "0 = off (reference behaviour: one episode)")
    p.add_argument("--refine-beam", default="",
                   help="comma-separated portfolio of verification "
                        "statistics (e.g. 'combo,mean_valid,ir_smooth'; "
                        "'stat:R' nominates that statistic's rank-R "
                        "candidate, so 'combo,combo:2' refines the top "
                        "two by combo): each nominated candidate seeds "
                        "its OWN verified refinement (--refine-rounds), "
                        "the final pose is selected across the refined "
                        "beam by --hypo-score, re-scored in each member's "
                        "final perception frame. Rationale (selector "
                        "study, docs/CONVERGENCE.md section 16): the "
                        "statistic families fail on disjoint scenes, and "
                        "verification separates candidates far better "
                        "AFTER refinement has sharpened the true-basin "
                        "one — so refine the disagreement set, then "
                        "re-vote. Costs len(beam) x refine-rounds fine "
                        "stages. Requires --iter-hypotheses > 1 and "
                        "--refine-rounds > 0")
    p.add_argument("--beam-score", default="",
                   choices=["", "smooth_mean", "sum_norm", "mean_valid",
                            "frac_valid", "above50_norm", "above70_norm",
                            "ir_smooth", "ir_mean", "ir_norm", "combo"],
                   help="statistic for the POST-refinement beam re-vote "
                        "(defaults to --hypo-score). The best pre- and "
                        "post-refinement selectors differ: before "
                        "refinement the shrunk-mean/combo family wins "
                        "(wrong-basin candidates rarely out-score it at "
                        "coarse residuals), but AFTER refinement the "
                        "true-basin member is sharply aligned and the "
                        "sharp-inlier count above50_norm separates it "
                        "best — weak-match accumulation cannot fake "
                        "sims > 0.5 (docs/CONVERGENCE.md section 16 "
                        "stage 5)")
    p.add_argument("--beam-frame", default="own",
                   choices=["own", "shared"],
                   help="perception frame for the beam re-vote scores. "
                        "'own' (default): each member is scored in its "
                        "final refinement round's frame — cheap, but the "
                        "scores come from DIFFERENT features, so a "
                        "wrong-basin member whose frame happens to "
                        "produce flattering features can out-vote a "
                        "0.5-deg-aligned one (the residual weakness of "
                        "the rank-2 beam, CONVERGENCE section 16). "
                        "'shared': score EVERY refined member's pose in "
                        "EVERY member's perception frame (same features "
                        "within a frame -> comparable), z-score across "
                        "poses per frame, and vote on the frame-averaged "
                        "z-score. Costs len(beam) extra geo forwards + "
                        "len(beam)^2 scorings per batch")
    p.add_argument("--refine-iter", action="store_true",
                   help="each refinement round first re-decodes the "
                        "residual with the cost volume on a grid shrunk "
                        "by --refine-shrink (requires --iter-ckpt)")
    p.add_argument("--refine-shrink", type=float, default=0.25,
                   help="amplitude factor for --refine-iter rounds: the "
                        "residual after a full-amplitude decode is at "
                        "most one bin = 2/(nlabel-1) of the amplitude, "
                        "so 0.25 re-spans it with the full 9-bin grid")
    p.add_argument("--iter-shrink", type=float, default=1.0,
                   help="amplitude schedule across cost-volume iterations: "
                        "iteration i>0 scales R/T_amplitude by this factor "
                        "(1.0 = reference behaviour, Test_Geo.py re-scores "
                        "the SAME +-amplitude grid every pass, so decode "
                        "resolution is capped at half a bin = amp/(nlabel-1) "
                        "no matter how many iterations run). After one pass "
                        "the residual is at most one bin, so a factor near "
                        "2/(nlabel-1) re-spans the residual with the full "
                        "grid and multiplies resolution by (nlabel-1)/2 per "
                        "iteration; the scoring tower generalises across "
                        "grid scales because alignment quality, not grid "
                        "pitch, drives its input statistics")
    p.add_argument("--fine-geo-ckpt", default="",
                   help="optional SECOND geo checkpoint for the fine "
                        "stage: re-perception after the coarse re-basing "
                        "and the agent episode use this model, while "
                        "--geo-ckpt feeds the cost volume. Lets each "
                        "stage use perception trained for its operating "
                        "regime (full-amplitude features for the "
                        "hypothesis warp, small-residual overlap for the "
                        "refinement). Defaults to --geo-ckpt")
    p.add_argument("--unmasked-warp", action="store_true",
                   help="warp ALL points in the cost volume "
                        "(Config.cost_volume_unmasked); must match how "
                        "the IterModel ckpt was trained")
    p.add_argument("--eval-batch-size", type=int, default=1,
                   help="reference protocol uses 1; larger batches "
                        "amortise the episode on TPU")
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--t-amp", type=float, default=None,
                   help="translation perturbation amplitude override (m) "
                        "— synthetic evaluation at a chosen difficulty")
    p.add_argument("--r-amp", type=float, default=None,
                   help="yaw perturbation amplitude override (rad)")
    p.add_argument("--save-mat", default="",
                   help="dump per-episode timings to a .mat file "
                        "(reference Test_Agent.py:196 parity)")
    p.add_argument("--pose-aware", action="store_true",
                   help="evaluate with the pose-aware 3-D observation — "
                        "REQUIRED for agents trained with it "
                        "(Config.pose_aware_observation)")
    p.add_argument("--obs-bearing", action="store_true",
                   help="bearing observation channels — REQUIRED for "
                        "agents trained with them "
                        "(Config.obs_bearing_channels)")
    p.add_argument("--aux-head", action="store_true",
                   help="feed the bearing statistic straight into the "
                        "policy/value heads (Config.policy_aux_state; "
                        "implies --obs-bearing)")
    p.add_argument("--bearing-init", action="store_true",
                   help="coarse-to-fine: start every episode from the yaw "
                        "that points the predicted-overlap sector at the "
                        "camera axis instead of identity "
                        "(Config.bearing_init; no reference equivalent)")
    args = p.parse_args(argv)
    maybe_initialize_distributed(args)

    cfg = apply_obs_overrides(build_config(args), args)
    set_seed(cfg.seed)

    test_ds = build_dataset(cfg, args, "test")
    loader = make_loader(cfg, args, test_ds,
                         batch_size=args.eval_batch_size)

    first = next(iter(loader))
    example = {k: jnp.asarray(v) for k, v in first.items()}
    geo_vars = load_geo_variables(cfg, args, example)
    geo_forward = make_geo_forward(cfg)
    fine_geo_vars = geo_vars
    if args.fine_geo_ckpt:
        import argparse as _ap
        fine_geo_vars = load_geo_variables(
            cfg, _ap.Namespace(geo_ckpt=args.fine_geo_ckpt), example)
        print(f"fine stage uses geo checkpoint {args.fine_geo_ckpt}")

    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    agent_state = create_agent_state(
        cfg, jnp.zeros((args.eval_batch_size, h, w, 2 * f)),
        jnp.zeros((args.eval_batch_size, cfg.num_pt, cfg.obs3d_channels)),
        jax.random.key(0))
    if args.agent_ckpt:
        template = {"params": agent_state.params,
                    "batch_stats": agent_state.batch_stats}
        if args.agent_ckpt.endswith(".pth"):
            loaded = convert_torch_agent(cfg, args.agent_ckpt, template)
        else:
            loaded = restore_model_variables(args.agent_ckpt, template)
        agent_state = agent_state.replace(params=loaded["params"],
                                          batch_stats=loaded["batch_stats"])
        print(f"loaded agent checkpoint from {args.agent_ckpt}")
    else:
        print("WARNING: no --agent-ckpt; using randomly initialised agent")

    episode = make_val_episode_fn(cfg)

    if args.refine_iter and not args.iter_ckpt:
        p.error("--refine-iter needs --iter-ckpt (the cost volume that "
                "re-decodes the residual)")
    def parse_member(spec):
        """'stat' or 'stat:R' -> (stat, rank); rank 1 = that statistic's
        top candidate, rank 2 its runner-up, etc. Rank-2 nomination
        covers scenes where the true basin is the vote's close second
        (it then wins the post-refinement re-vote once sharpened)."""
        name, _, rank = spec.partition(":")
        return name, (int(rank) if rank else 1)

    beam_members = [parse_member(s.strip())
                    for s in args.refine_beam.split(",") if s.strip()]
    if beam_members:
        if args.refine_rounds <= 0 or args.iter_hypotheses <= 1:
            p.error("--refine-beam needs --refine-rounds > 0 and "
                    "--iter-hypotheses > 1 (it refines candidates of the "
                    "multi-hypothesis decode)")
        known = {"smooth_mean", "sum_norm", "mean_valid", "frac_valid",
                 "above50_norm", "above70_norm", "ir_smooth", "ir_mean",
                 "ir_norm", "combo"}
        bad = [s for s, _ in beam_members if s not in known]
        if bad:
            p.error(f"unknown --refine-beam statistics: {bad}")
        bad_rank = [(s, r) for s, r in beam_members
                    if not 1 <= r <= args.iter_hypotheses]
        if bad_rank:
            p.error(f"--refine-beam ranks out of 1..{args.iter_hypotheses}"
                    f": {bad_rank}")

    score_fn = None
    if args.iter_hypotheses > 1 or args.refine_rounds > 0:
        from ..env import alignment_stats, nn_alignment_stats

        @jax.jit
        def score_fn(geo_out_k, batch_k, final_k):
            st = {"pc": geo_out_k["pc"], "K": batch_k["K"],
                  "pc_geo_feat": geo_out_k["pc_geo_feat"],
                  "img_geo_feat": geo_out_k["img_geo_feat"]}
            stats = alignment_stats(st, final_k, cfg.image_h,
                                    cfg.image_w)
            stats.update(nn_alignment_stats(st, final_k, cfg.image_h,
                                            cfg.image_w))
            return stats

        def add_combo(stats_mat):
            """'combo' = z(smooth_mean) + 0.3 z(ir_smooth), z-scored across
            the candidate axis per sample. The cosine statistic carries the
            selection; the spatial-consistency statistic tie-breaks
            wrong-basin candidates whose weak matches out-sum the true
            pose's sparser strong ones (selector study, CONVERGENCE §16)."""
            def z(a):
                return ((a - a.mean(axis=1, keepdims=True))
                        / (a.std(axis=1, keepdims=True) + 1e-9))
            stats_mat["combo"] = (z(stats_mat["smooth_mean"])
                                  + 0.3 * z(stats_mat["ir_smooth"]))
            return stats_mat

    coarse_fn = None
    if args.iter_ckpt:
        from ..models import IterModel
        from ..train.convert import convert_torch_itermodel
        from ..train.train_iter import iter_model_state
        from ..env import apply_coarse_pose

        iter_model = IterModel(cfg)
        geo_out0 = geo_forward(geo_vars["params"], geo_vars["batch_stats"],
                               example)
        state0 = iter_model_state(geo_out0, example)
        iter_vars = jax.jit(
            lambda r, s: iter_model.init({"params": r}, s, train=False,
                                         with_loss=False))(
            jax.random.key(0), state0)
        if args.iter_ckpt.endswith(".pth"):
            iter_vars = convert_torch_itermodel(cfg, args.iter_ckpt,
                                                iter_vars)
        else:
            iter_vars = restore_model_variables(args.iter_ckpt,
                                                dict(iter_vars))
        print(f"loaded IterModel checkpoint from {args.iter_ckpt} "
              f"({args.iter_iters} coarse iterations)")

        def run_tail_iters(st):
            """Cost-volume iterations 1..iter_iters-1 (shared by both the
            single- and multi-hypothesis paths)."""
            for _ in range(1, args.iter_iters):
                if args.iter_shrink != 1.0:
                    st = dict(st,
                              R_amplitude=st["R_amplitude"]
                              * args.iter_shrink,
                              T_amplitude=st["T_amplitude"]
                              * args.iter_shrink)
                out = iter_model.apply(iter_vars, st, train=False,
                                       with_loss=False)
                st = dict(st, pc_i=out["pc_i"],
                          matrix_accumulated=out["matrix_accumulated"])
            return st

        if args.iter_hypotheses > 1:
            from ..models import decode_topk_yaw_poses
            from ..ops.geometry import transform_points

            @jax.jit
            def coarse_fn(geo_out, batch):
                """Top-K yaw candidates from the first decode, each run
                through the remaining iterations -> K rebased branches."""
                st = iter_model_state(geo_out, batch)
                out = iter_model.apply(iter_vars, st, train=False,
                                       with_loss=False)
                cands = decode_topk_yaw_poses(
                    out["cost_volume_logits"], st["R_amplitude"],
                    st["T_amplitude"], cfg.nlabel, args.iter_hypotheses)
                branches = []
                for k in range(args.iter_hypotheses):
                    mk = cands[:, k]
                    stk = dict(st,
                               pc_i=transform_points(st["pc_i"],
                                                     mk[:, :3, :3],
                                                     mk[:, :3, 3]),
                               matrix_accumulated=mk
                               @ st["matrix_accumulated"])
                    stk = run_tail_iters(stk)
                    coarse = stk["matrix_accumulated"]
                    branches.append((apply_coarse_pose(batch, coarse),
                                     coarse))
                return branches
        else:
            @jax.jit
            def coarse_fn(geo_out, batch):
                st = iter_model_state(geo_out, batch)
                out = iter_model.apply(iter_vars, st, train=False,
                                       with_loss=False)
                st = dict(st, pc_i=out["pc_i"],
                          matrix_accumulated=out["matrix_accumulated"])
                st = run_tail_iters(st)
                coarse = st["matrix_accumulated"]
                return apply_coarse_pose(batch, coarse), coarse

    refine_fn = None
    if args.refine_rounds > 0:
        from ..env import apply_coarse_pose as _rebase
        from ..env import compose_disentangled
        from ..ops import to_disentangled as _to_dis
        from ..ops.geometry import se3_inverse

        refine_decode = None
        if args.refine_iter:
            # MUST be jitted: run eagerly, the 729-pose volume
            # materialises unfused ([B·729, H, W, 2F+2] and friends) and
            # exhausts HBM at eval batch sizes that train fine under jit
            @jax.jit
            def refine_decode(geo_c, batch_c):
                st = iter_model_state(geo_c, batch_c)
                st = dict(st,
                          R_amplitude=st["R_amplitude"]
                          * args.refine_shrink,
                          T_amplitude=st["T_amplitude"]
                          * args.refine_shrink)
                out = iter_model.apply(iter_vars, st, train=False,
                                       with_loss=False)
                return out["matrix_accumulated"]

        def refine_fn(batch0, total, rte_cur, rre_cur):
            """Verified refinement rounds on the composed estimate.

            Each round re-bases the ORIGINAL batch under the current
            estimate, optionally re-decodes the residual with a shrunk
            cost-volume grid (--refine-iter), re-perceives with the fine
            geo model and runs another agent episode. The new estimate is
            accepted PER SAMPLE only where the --hypo-score verification
            statistic beats the incumbent, both scored in the round's own
            perception frame (the incumbent appears there as the inverse
            of the round's coarse step — identity when --refine-iter is
            off). Rejected samples keep their previous pose and metrics,
            so a round can only help under the verifier's judgement.

            Returns ``(total, rte, rre, stats)``; ``stats`` holds the
            accepted pose's RAW verification statistics ([B] per key,
            final round's perception frame) — the cross-member selection
            input for --refine-beam.
            """
            b = batch0["pc"].shape[0]
            eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                   (b, 4, 4))
            acc_stats = None
            for _ in range(args.refine_rounds):
                if args.refine_iter:
                    batch_c = _rebase(batch0, total)
                    geo_c = geo_forward(geo_vars["params"],
                                        geo_vars["batch_stats"], batch_c)
                    coarse_r = refine_decode(geo_c, batch_c)
                    total_base = coarse_r @ total
                else:
                    coarse_r = eye
                    total_base = total
                batch_r = _rebase(batch0, total_base)
                geo_r = geo_forward(fine_geo_vars["params"],
                                    fine_geo_vars["batch_stats"], batch_r)
                final_r, rte_r, rre_r = episode(agent_state, geo_r,
                                                batch_r)
                s_cand = score_fn(geo_r, batch_r, final_r)
                inc = _to_dis(se3_inverse(coarse_r), batch_r["pc"])
                s_inc = score_fn(geo_r, batch_r, inc)
                pair = {k_: np.stack([np.asarray(s_cand[k_]),
                                      np.asarray(s_inc[k_])], axis=1)
                        for k_ in s_cand}
                add_combo(pair)
                accept = pair[args.hypo_score].argmax(axis=1) == 0
                total_cand = compose_disentangled(final_r, total_base,
                                                  batch0["pc"])
                total = jnp.where(jnp.asarray(accept)[:, None, None],
                                  total_cand, total)
                rte_cur = np.where(accept, np.asarray(rte_r), rte_cur)
                rre_cur = np.where(accept, np.asarray(rre_r), rre_cur)
                acc_stats = {k_: np.where(accept, pair[k_][:, 0],
                                          pair[k_][:, 1])
                             for k_ in pair if k_ != "combo"}
            return total, rte_cur, rre_cur, acc_stats

    rte_all, rre_all, times = [], [], []
    pre_rte_all, pre_rre_all = [], []
    c_rte_all, c_rre_all = [], []
    # multi-hypothesis diagnostics (per sample): did candidate 0 solve /
    # did the verification-selected candidate solve / did ANY candidate
    # solve (the selection ceiling)
    hypo_first, hypo_any, hypo_sel_oracle = [], [], []
    hypo_stat_mats, hypo_rte_mats, hypo_rre_mats = {}, [], []
    beam_any = []          # --refine-beam: any refined member solved
    beam_rte_mats, beam_rre_mats, beam_stat_mats = [], [], {}
    multi = coarse_fn is not None and args.iter_hypotheses > 1
    for i, batch in enumerate(loader):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        t0 = time.perf_counter()
        geo_out = geo_forward(geo_vars["params"], geo_vars["batch_stats"],
                              batch)
        if multi:
            branches = coarse_fn(geo_out, batch)
            cand_rte, cand_rre, cand_stats = [], [], []
            cand_coarse, cand_final = [], []
            for batch_k, coarse_k in branches:
                geo_out_k = geo_forward(fine_geo_vars["params"],
                                        fine_geo_vars["batch_stats"],
                                        batch_k)
                final_k, rte_k, rre_k = episode(agent_state, geo_out_k,
                                                batch_k)
                cand_stats.append({k_: np.asarray(v_) for k_, v_ in
                                   score_fn(geo_out_k, batch_k,
                                            final_k).items()})
                cand_rte.append(np.asarray(rte_k))
                cand_rre.append(np.asarray(rre_k))
                cand_coarse.append(np.asarray(coarse_k))
                cand_final.append(np.asarray(final_k))
            # [B, K] matrices, one per verification statistic
            stats_mat = add_combo(
                {k_: np.stack([c[k_] for c in cand_stats], axis=1)
                 for k_ in cand_stats[0]})
            scores = stats_mat[args.hypo_score]
            rtes = np.stack(cand_rte, axis=1)
            rres = np.stack(cand_rre, axis=1)
            jax.block_until_ready(final_k)
            sel = scores.argmax(axis=1)
            for k_, v_ in stats_mat.items():
                hypo_stat_mats.setdefault(k_, []).append(v_)
            hypo_rte_mats.append(rtes)
            hypo_rre_mats.append(rres)
            rte = np.take_along_axis(rtes, sel[:, None], 1)[:, 0]
            rre = np.take_along_axis(rres, sel[:, None], 1)[:, 0]
            solved = (rtes < 5.0) & (rres < 10.0)          # RR thresholds
            hypo_first += solved[:, 0].tolist()
            hypo_any += solved.any(axis=1).tolist()
            hypo_sel_oracle += np.take_along_axis(
                solved, sel[:, None], 1)[:, 0].tolist()
            # branches[0][0]["P"] is the rebased residual target P @ C^-1,
            # so this is pose_diff(C, P) — same convention as the single path
            c_rte, c_rre = pose_diff(branches[0][1],
                                     branches[0][0]["P"] @ branches[0][1])
            c_rte_all += np.asarray(c_rte).tolist()
            c_rre_all += np.asarray(c_rre).tolist()
            final = final_k
            if refine_fn is not None:
                from ..env import compose_disentangled
                bsz = batch["pc"].shape[0]
                arange = np.arange(bsz)
                coarse_stack = np.stack(cand_coarse, axis=1)
                final_stack = np.stack(cand_final, axis=1)
                pre_rte_all += np.asarray(rte).tolist()
                pre_rre_all += np.asarray(rre).tolist()
                # beam: each portfolio statistic nominates one candidate;
                # all nominees are refined, then re-voted post-refinement
                # (without --refine-beam the beam is just the selected
                # candidate — the original single-member behaviour)
                members = beam_members or [(args.hypo_score, 1)]
                b_rte, b_rre, b_stats, b_total = [], [], [], []
                for name, rank in members:
                    if rank == 1 and name == args.hypo_score:
                        idx = sel
                    elif rank == 1:
                        idx = stats_mat[name].argmax(axis=1)
                    else:
                        idx = np.argsort(-stats_mat[name],
                                         axis=1)[:, rank - 1]
                    coarse_m = jnp.asarray(coarse_stack[arange, idx])
                    final_m = jnp.asarray(final_stack[arange, idx])
                    total_m = compose_disentangled(final_m, coarse_m,
                                                   batch["pc"])
                    total_m, rte_m, rre_m, st_m = refine_fn(
                        batch, total_m, rtes[arange, idx],
                        rres[arange, idx])
                    b_rte.append(rte_m)
                    b_rre.append(rre_m)
                    b_stats.append(st_m)
                    b_total.append(total_m)
                if len(members) == 1:
                    rte, rre = b_rte[0], b_rre[0]
                elif args.beam_frame == "shared":
                    # cross-frame comparable re-vote: perceive each
                    # member's frame once, score ALL refined poses
                    # against those same features, z-score across poses
                    # within the frame, and average over frames. A frame
                    # can flatter its own member's features no more than
                    # anyone else's — the 'own' mode's comparability
                    # leak (each member voting with its own features) is
                    # gone by construction.
                    from ..ops.geometry import se3_inverse as _inv
                    frame_mats = []
                    for t_frame in b_total:
                        batch_f = _rebase(batch, t_frame)
                        geo_f = geo_forward(fine_geo_vars["params"],
                                            fine_geo_vars["batch_stats"],
                                            batch_f)
                        inv_f = _inv(t_frame)
                        per_pose = []
                        for t_pose in b_total:
                            rel = _to_dis(t_pose @ inv_f, batch_f["pc"])
                            per_pose.append(
                                {k_: np.asarray(v_) for k_, v_ in
                                 score_fn(geo_f, batch_f, rel).items()})
                        frame_mats.append(add_combo(
                            {k_: np.stack([s[k_] for s in per_pose],
                                          axis=1)
                             for k_ in per_pose[0]}))
                    bmat = {}
                    for k_ in frame_mats[0]:
                        zs = [(a[k_] - a[k_].mean(axis=1, keepdims=True))
                              / (a[k_].std(axis=1, keepdims=True) + 1e-9)
                              for a in frame_mats]
                        bmat[k_] = np.mean(zs, axis=0)
                else:
                    bmat = add_combo(
                        {k_: np.stack([s[k_] for s in b_stats], axis=1)
                         for k_ in b_stats[0]})
                if len(members) > 1:
                    bsel = bmat[args.beam_score
                                or args.hypo_score].argmax(axis=1)
                    rte_b = np.stack(b_rte, axis=1)
                    rre_b = np.stack(b_rre, axis=1)
                    rte = rte_b[arange, bsel]
                    rre = rre_b[arange, bsel]
                    beam_any += ((rte_b < 5.0)
                                 & (rre_b < 10.0)).any(axis=1).tolist()
                    # per-member matrices for offline post-refine vote
                    # study (mirrors the hypo_* candidate dumps)
                    beam_rte_mats.append(rte_b)
                    beam_rre_mats.append(rre_b)
                    for k_, v_ in bmat.items():
                        beam_stat_mats.setdefault(k_, []).append(v_)
        else:
            orig_batch = batch
            coarse = None
            if coarse_fn is not None:
                batch, coarse = coarse_fn(geo_out, batch)
                # coarse-stage-only residual, for observability
                c_rte, c_rre = pose_diff(coarse, batch["P"] @ coarse)
                c_rte_all += np.asarray(c_rte).tolist()
                c_rre_all += np.asarray(c_rre).tolist()
                # re-perceive the near-aligned cloud (fine-stage geo)
                geo_out = geo_forward(fine_geo_vars["params"],
                                      fine_geo_vars["batch_stats"], batch)
            final, rte, rre = episode(agent_state, geo_out, batch)
            jax.block_until_ready(final)
            if refine_fn is not None:
                from ..env import compose_disentangled
                if coarse is None:
                    coarse = jnp.broadcast_to(
                        jnp.eye(4, dtype=jnp.float32),
                        (orig_batch["pc"].shape[0], 4, 4))
                total = compose_disentangled(final, coarse,
                                             orig_batch["pc"])
                pre_rte_all += np.asarray(rte).tolist()
                pre_rre_all += np.asarray(rre).tolist()
                total, rte, rre, _ = refine_fn(orig_batch, total,
                                               np.asarray(rte),
                                               np.asarray(rre))
        dt = time.perf_counter() - t0
        times.append(dt / batch["pc"].shape[0])
        rte_all += np.asarray(rte).tolist()
        rre_all += np.asarray(rre).tolist()
        if args.max_batches and i + 1 >= args.max_batches:
            break

    m = registration_metrics(np.array(rte_all), np.array(rre_all))
    if c_rte_all:
        m["coarse_rte_mean"] = float(np.mean(c_rte_all))
        m["coarse_rre_mean"] = float(np.mean(c_rre_all))
    if multi:
        m["hypo_k"] = args.iter_hypotheses
        m["hypo_score"] = args.hypo_score
        m["rr_first_hypothesis"] = float(np.mean(hypo_first))
        m["rr_selected"] = float(np.mean(hypo_sel_oracle))
        m["rr_any_hypothesis"] = float(np.mean(hypo_any))
        # what-if selection RR under every verification statistic, so a
        # single run compares selectors offline
        rtes_all = np.concatenate(hypo_rte_mats, axis=0)    # [S, K]
        rres_all = np.concatenate(hypo_rre_mats, axis=0)
        solved_all = (rtes_all < 5.0) & (rres_all < 10.0)
        for k_, mats in hypo_stat_mats.items():
            s_ = np.concatenate(mats, axis=0).argmax(axis=1)
            m[f"rr_sel_{k_}"] = float(np.mean(
                np.take_along_axis(solved_all, s_[:, None], 1)[:, 0]))
    if pre_rte_all:
        pre_rte = np.array(pre_rte_all)
        pre_rre = np.array(pre_rre_all)
        m["refine_rounds"] = args.refine_rounds
        m["rr_pre_refine"] = float(np.mean((pre_rte < 5.0)
                                           & (pre_rre < 10.0)))
        if beam_any:
            m["refine_beam"] = args.refine_beam
            m["beam_score"] = args.beam_score or args.hypo_score
            m["beam_frame"] = args.beam_frame
            # post-refinement beam ceiling: some refined member solved
            # (the beam re-vote's selection quality is RR vs this)
            m["rr_beam_any"] = float(np.mean(beam_any))
            # what-if beam-vote RR under every statistic (offline
            # selector comparison from a single run, like rr_sel_*)
            rte_bm = np.concatenate(beam_rte_mats, axis=0)
            rre_bm = np.concatenate(beam_rre_mats, axis=0)
            solved_bm = (rte_bm < 5.0) & (rre_bm < 10.0)
            for k_, mats in beam_stat_mats.items():
                s_ = np.concatenate(mats, axis=0).argmax(axis=1)
                m[f"rr_beamsel_{k_}"] = float(np.mean(
                    np.take_along_axis(solved_bm, s_[:, None], 1)[:, 0]))
    # first batch includes compile; report steady-state timing too
    m["avg_episode_time_s"] = float(np.mean(times))
    m["avg_episode_time_steady_s"] = float(np.mean(times[1:]) if
                                           len(times) > 1 else times[0])
    m["num_samples"] = len(rte_all)
    if args.save_mat:
        import scipy.io as scio
        dump = {"Time": np.array(times), "RTE": np.array(rte_all),
                "RRE": np.array(rre_all)}
        if multi:
            dump["hypo_RTE"] = np.concatenate(hypo_rte_mats, axis=0)
            dump["hypo_RRE"] = np.concatenate(hypo_rre_mats, axis=0)
            for k_, mats in hypo_stat_mats.items():
                dump[f"hypo_{k_}"] = np.concatenate(mats, axis=0)
        if beam_rte_mats:
            dump["beam_RTE"] = np.concatenate(beam_rte_mats, axis=0)
            dump["beam_RRE"] = np.concatenate(beam_rre_mats, axis=0)
            for k_, mats in beam_stat_mats.items():
                dump[f"beam_{k_}"] = np.concatenate(mats, axis=0)
        scio.savemat(args.save_mat, dump)
    print(json.dumps(m, indent=2))
    return m


if __name__ == "__main__":
    main()
