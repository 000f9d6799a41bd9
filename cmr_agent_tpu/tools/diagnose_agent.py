"""Per-step policy diagnostics for a trained agent snapshot.

The convergence logs expose *aggregate* RTE/RRE and expert agreement; when
a run plateaus they cannot distinguish the failure modes that look
identical from outside (rotation-frozen policy, wrong-direction rotation,
translation drift, unobservable 2-D raster). This tool replays
deterministic episodes on a held-out pool and prints, for every episode
step k:

* mean RTE / RRE across the pool (does the error actually descend, and at
  which step does progress stop),
* the policy-vs-expert action histogram for the rotation head and the two
  translation heads (is the policy using the big steps the expert uses),
* rotation *direction* agreement (sign matches are what move the pose —
  exact-index agreement under-credits near-ties between adjacent steps),
* 2-D raster occupancy (how many predicted-overlap points actually land in
  the frustum — zero occupancy means the 2-D observation is blind and the
  3-D branch is the only signal, the regime that defeats the reference's
  static observation; reference environment.py:39-84).

Mirrors the capability of the reference's manual debug prints in
Train_Agent.py:223-250, redesigned as a first-class CLI::

    python -m cmr_agent_tpu.tools.diagnose_agent --full --scene structured \
        --geo-ckpt /tmp/geo --agent-ckpt /tmp/agent --pose-aware
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def build_pool(cfg, args):
    from ..data import SyntheticDataset, DataLoader

    fps_fn = nn_fn = None
    if args.full:
        from ..native import get_fast_host_ops
        fps_fn, nn_fn = get_fast_host_ops()
    if args.pool_size % args.batch_size:
        raise SystemExit(
            f"--pool-size {args.pool_size} must be a multiple of "
            f"--batch-size {args.batch_size}: the loader drops ragged "
            f"tails, which would silently shrink (or empty) the pool")
    ds = SyntheticDataset(cfg, length=args.pool_size, seed=args.seed,
                          fps_fn=fps_fn, nn_fn=nn_fn, scene=args.scene)
    loader = DataLoader(ds, args.batch_size, shuffle=False, num_workers=0,
                        seed=args.seed)
    return [dict((k, jnp.asarray(v)) for k, v in b.items()) for b in loader]


def replay_poses(cfg, traj, batch, init_pose=None):
    """Recompute the per-step pose sequence from recorded actions.

    ``run_episode`` returns only the final pose; the trajectory's
    ``action_r/t [K,B,...]`` replays exactly (the action application is
    deterministic), giving pose errors *after* each step k.
    """
    from ..env import apply_action, init_poses
    from ..ops import pose_diff, to_disentangled

    r_steps = jnp.asarray(cfg.r_steps_array())
    t_steps = jnp.asarray(cfg.t_steps_array())
    pose, tgt = init_poses(batch)
    if init_pose is not None:
        pose = init_pose
    tgt = to_disentangled(tgt, batch["pc"])
    errs = [pose_diff(pose, tgt)]
    for k in range(traj["action_r"].shape[0]):
        pose = apply_action(traj["action_r"][k], traj["action_t"][k], pose,
                            r_steps, t_steps, cfg.is_6_dof)
        errs.append(pose_diff(pose, tgt))
    rte = np.stack([np.asarray(e[0]) for e in errs])   # [K+1, B]
    rre = np.stack([np.asarray(e[1]) for e in errs])
    return rte, rre, pose


def raster_occupancy(cfg, batch, geo_out, poses_rte_unused, traj,
                     init_pose=None):
    """Per-step, by replaying the recorded actions:

    * predicted-overlap points inside the frustum (2-D observability),
    * ORACLE yaw-direction accuracy — does ``sign(mean bearing)`` of the
      overlap-flagged points under the current estimate agree with the
      expert's yaw direction? The bearing is a two-layer function of the
      pose-aware 3-D observation (atan2 over flagged coords), so high
      oracle accuracy + a failing policy = optimization/training gap;
      low oracle accuracy = the observation itself lacks the signal.
    """
    from ..env import apply_action, init_poses
    from ..ops.geometry import (frustum_mask, project_points,
                                transform_points_disentangled)

    r_steps = jnp.asarray(cfg.r_steps_array())
    t_steps = jnp.asarray(cfg.t_steps_array())
    pose, _ = init_poses(batch)
    if init_pose is not None:
        pose = init_pose
    pc = geo_out["pc"]
    overlap = geo_out["pc_overlap_pred"]
    zero_idx = len(cfg.r_steps_deg) // 2
    counts, oracle_hits, oracle_n = [], [], []
    for k in range(traj["action_r"].shape[0] + 1):
        moved = transform_points_disentangled(pc, pose[:, :3, :3],
                                              pose[:, :3, 3])
        proj = project_points(moved, batch["K"])
        in_cam = frustum_mask(proj, w=cfg.image_w, h=cfg.image_h)
        counts.append(np.asarray((in_cam & overlap).sum(axis=1)))
        if k < traj["action_r"].shape[0]:
            m = np.asarray(moved)
            w = np.asarray(overlap, dtype=np.float64)
            cx = (m[..., 0] * w).sum(1) / np.maximum(w.sum(1), 1)
            cz = (m[..., 2] * w).sum(1) / np.maximum(w.sum(1), 1)
            bearing = np.arctan2(cx, cz)               # 0 = straight ahead
            exp_dir = np.sign(np.asarray(traj["expert_action_r"][k, :, 0])
                              - zero_idx)
            want = exp_dir != 0
            oracle_hits.append((np.sign(bearing) == -exp_dir) & want)
            oracle_n.append(want)
            pose = apply_action(traj["action_r"][k], traj["action_t"][k],
                                pose, r_steps, t_steps, cfg.is_6_dof)
    return (np.stack(counts), np.stack(oracle_hits),
            np.stack(oracle_n))                        # [K+1|K, B]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true")
    p.add_argument("--scene", default="structured",
                   choices=["random", "structured"])
    p.add_argument("--pool-size", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=7919,
                   help="pool seed (default: the convergence demo's "
                        "held-out validation pool)")
    p.add_argument("--geo-ckpt", required=True)
    p.add_argument("--agent-ckpt", default="",
                   help="omit to diagnose an untrained agent")
    p.add_argument("--pose-aware", action="store_true",
                   help="must match how the snapshot was trained")
    p.add_argument("--obs-bearing", action="store_true",
                   help="must match how the snapshot was trained "
                        "(Config.obs_bearing_channels)")
    p.add_argument("--aux-head", action="store_true",
                   help="must match how the snapshot was trained "
                        "(Config.policy_aux_state; implies --obs-bearing)")
    p.add_argument("--bearing-init", action="store_true",
                   help="start episodes from the coarse bearing-aligned "
                        "yaw (Config.bearing_init)")
    p.add_argument("--oracle-overlap", action="store_true",
                   help="ABLATION: ground-truth overlap flags instead of "
                        "the geo head's predictions (CONVERGENCE.md "
                        "section 11)")
    p.add_argument("--t-amp", type=float, default=None)
    p.add_argument("--r-amp", type=float, default=None)
    args = p.parse_args(argv)

    from ..cli.common import apply_obs_overrides

    if args.full:
        from ..config import kitti_config
        from cmr_agent_tpu.cli.common import host_feature_cache_dir
        jax.config.update("jax_compilation_cache_dir",
                          host_feature_cache_dir("/tmp/cmr_jax_cache"))
        cfg = kitti_config(compute_dtype="bfloat16",
                           train_batch_size=args.batch_size)
    else:
        from ..config import tiny_config
        cfg = tiny_config(train_batch_size=args.batch_size)
    # one shared flag->config mapping for every CLI/tool (cli.common)
    cfg = apply_obs_overrides(cfg, args)

    from ..train import (create_geo_state, create_agent_state,
                         restore_model_variables)
    from ..train.train_geo import make_geo_forward, wrap_oracle_overlap
    from ..train.train_agent import _episode_state
    from ..env import init_poses, run_episode
    from ..ops import to_disentangled

    pool = build_pool(cfg, args)
    geo_state = create_geo_state(cfg, pool[0], jax.random.key(0))
    gv = restore_model_variables(
        args.geo_ckpt, {"params": geo_state.params,
                        "batch_stats": geo_state.batch_stats})
    geo_state = geo_state.replace(params=gv["params"],
                                  batch_stats=gv["batch_stats"])
    raw_fwd = make_geo_forward(cfg)
    # oracle-perception ablation (shared wrapper — CONVERGENCE.md sec. 11)
    fwd = (wrap_oracle_overlap(raw_fwd) if args.oracle_overlap
           else raw_fwd)

    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    agent_state = create_agent_state(
        cfg, jnp.zeros((args.batch_size, h, w, 2 * f)),
        jnp.zeros((args.batch_size, cfg.num_pt, cfg.obs3d_channels)), jax.random.key(1))
    if args.agent_ckpt:
        av = restore_model_variables(
            args.agent_ckpt, {"params": agent_state.params,
                              "batch_stats": agent_state.batch_stats})
        agent_state = agent_state.replace(params=av["params"],
                                          batch_stats=av["batch_stats"])

    @jax.jit
    def episode(batch, geo_out):
        state = _episode_state(geo_out, batch)
        pose_src, pose_tgt = init_poses(state)
        if cfg.bearing_init:
            from ..env import bearing_init_pose
            pose_src = bearing_init_pose(state)
        pose_tgt = to_disentangled(pose_tgt, state["pc"])
        apply_fn = lambda v, o2, o3: agent_state.apply_fn(v, o2, o3,
                                                          train=False)
        avars = {"params": agent_state.params,
                 "batch_stats": agent_state.batch_stats}
        _, traj = run_episode(apply_fn, avars, state, pose_src, pose_tgt,
                              cfg, deterministic=True, with_expert=True,
                              collect_trajectory=True)
        keep = ("action_r", "action_t", "expert_action_r",
                "expert_action_t")
        return {k: traj[k] for k in keep}

    K = cfg.action_num
    n_act = len(cfg.r_steps_deg)
    rte_all, rre_all, occ_all, orh_all, orn_all = [], [], [], [], []
    hist_pol = np.zeros((K, n_act), np.int64)
    hist_exp = np.zeros((K, n_act), np.int64)
    t_hist_pol = np.zeros((K, n_act), np.int64)
    t_hist_exp = np.zeros((K, n_act), np.int64)
    sign_agree = np.zeros(K)
    zero_while_far = np.zeros(K)
    small_while_big = np.zeros(K)      # |pol step| small when expert's big
    big_n = np.zeros(K)
    dir_hits = np.zeros((K, 2))        # balanced: recall per direction
    dir_n = np.zeros((K, 2))
    n_seen = 0
    for batch in pool:
        geo_out = fwd(geo_state.params, geo_state.batch_stats, batch)
        traj = jax.tree.map(np.asarray, episode(batch, geo_out))
        init = None
        if cfg.bearing_init:
            from ..env import bearing_init_pose
            # keep jnp: replay's apply_action uses .at updates
            init = bearing_init_pose(
                {"pc": geo_out["pc"],
                 "pc_overlap_pred": geo_out["pc_overlap_pred"]})
        rte, rre, _ = replay_poses(cfg, traj, batch, init_pose=init)
        rte_all.append(rte)
        rre_all.append(rre)
        occ, orh, orn = raster_occupancy(cfg, batch, geo_out, None, traj,
                                         init_pose=init)
        occ_all.append(occ)
        orh_all.append(orh)
        orn_all.append(orn)
        ar = traj["action_r"][:, :, 0]                 # [K, B] yaw head
        er = traj["expert_action_r"][:, :, 0]
        zero_idx = n_act // 2                          # the 0.0 step
        for k in range(K):
            hist_pol[k] += np.bincount(ar[k], minlength=n_act)
            hist_exp[k] += np.bincount(er[k], minlength=n_act)
            t_hist_pol[k] += np.bincount(traj["action_t"][k].ravel(),
                                         minlength=n_act)
            t_hist_exp[k] += np.bincount(traj["expert_action_t"][k].ravel(),
                                         minlength=n_act)
            pol_dir = np.sign(ar[k] - zero_idx)
            exp_dir = np.sign(er[k] - zero_idx)
            sign_agree[k] += (pol_dir == exp_dir).sum()
            far = np.abs(er[k] - zero_idx) >= 4        # expert wants big
            zero_while_far[k] += ((ar[k] == zero_idx) & far).sum()
            # a constant small-step policy evades zero-while-far AND
            # inflates raw sign-agree when the pool's expert directions
            # are imbalanced (observed on run G's collapsed snapshot:
            # 100% mass on -2.5 deg scored 0.75 sign-agree). Track the
            # magnitude miss and the per-direction (balanced) recall.
            small_while_big[k] += ((np.abs(ar[k] - zero_idx) <= 2)
                                   & far).sum()
            big_n[k] += far.sum()
            for d, col in ((-1, 0), (1, 1)):
                want = exp_dir == d
                dir_hits[k, col] += (pol_dir[want] == d).sum()
                dir_n[k, col] += want.sum()
        n_seen += ar.shape[1]

    rte = np.concatenate(rte_all, axis=1)              # [K+1, total]
    rre = np.concatenate(rre_all, axis=1)
    occ = np.concatenate(occ_all, axis=1)
    orh = np.concatenate(orh_all, axis=1)
    orn = np.concatenate(orn_all, axis=1)
    # sign convention is empirical: report the better orientation
    acc = orh.sum() / max(orn.sum(), 1)
    oracle_flip = acc < 0.5
    oracle = np.where(orn.sum(1) > 0,
                      (orn ^ orh if oracle_flip else orh).sum(1)
                      / np.maximum(orn.sum(1), 1), np.nan)
    steps_deg = [f"{s:+.4g}" for s in np.degrees(cfg.r_steps_array())]
    steps_m = [f"{s:+.4g}" for s in cfg.t_steps_array()]

    print(f"pool {rte.shape[1]} samples  K={K}  "
          f"(policy argmax, expert alongside)")
    print(f"oracle yaw-direction accuracy (sign of overlap-sector bearing"
          f"{', flipped convention' if oracle_flip else ''}): "
          f"{max(acc, 1 - acc):.2f} overall")
    print("\nstep |  RTE(m)  RRE(deg) | raster-occ | r sign-agree"
          "  r-bal-dir  r-small-while-big  r0-while-far  oracle-dir")
    for k in range(K + 1):
        tail = ""
        if k < K:
            # balanced direction recall: mean of per-direction recalls
            # over the directions the expert actually used — 0.5 for any
            # constant nonzero-direction policy, however imbalanced the
            # pool (a zero-action collapse scores 0.0 on both recalls,
            # which is itself diagnostic)
            recs = [dir_hits[k, c] / dir_n[k, c] for c in (0, 1)
                    if dir_n[k, c] > 0]
            bal = np.mean(recs) if recs else np.nan
            swb = (small_while_big[k] / big_n[k] if big_n[k] else np.nan)
            tail = (f" | {sign_agree[k] / n_seen:10.2f}"
                    f" {bal:9.2f}"
                    f" {swb:17.2f}"
                    f" {zero_while_far[k] / n_seen:12.2f}"
                    f" {oracle[k]:11.2f}")
        print(f"{k:4d} | {rte[k].mean():7.3f} {rre[k].mean():8.2f}"
              f" | {occ[k].mean():9.0f}{tail}")

    def show_hist(title, hp, he, labels):
        print(f"\n{title} (rows: step; cols: {' '.join(labels)})")
        for k in range(K):
            tot = max(hp[k].sum(), 1)
            pol = " ".join(f"{v / tot:4.0%}" for v in hp[k])
            exp = " ".join(f"{v / tot:4.0%}" for v in he[k])
            print(f"  k={k}  pol {pol}\n       exp {exp}")

    show_hist("rotation head", hist_pol, hist_exp, steps_deg)
    show_hist("translation heads (x+z pooled)", t_hist_pol, t_hist_exp,
              steps_m)


if __name__ == "__main__":
    main()
