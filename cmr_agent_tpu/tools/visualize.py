"""Episode visualiser: projection overlays + BEV frames for a registration
episode.

The reference ships only commented-out open3d snippets
(environment/environment.py:86-119); this tool renders what the agent
actually experiences, step by step:

* **left panel** — the camera image with the point cloud projected under
  the CURRENT pose estimate, coloured by depth (viridis: perceptually
  uniform, CVD-safe); out-of-frustum points simply disappear, so a wrong
  pose is visible as a sparse/empty overlay;
* **right panel** — bird's-eye view (x/z): the ground-truth registered
  cloud in neutral gray under the current estimate's cloud in blue, with
  per-step RTE/RRE in the title.

Policies: ``expert`` (no weights needed — the analytic expert drives),
``untrained`` (random-init agent) or ``agent`` (trained checkpoints).
Writes ``step-00.png .. step-K.png`` plus ``episode.gif``::

    python -m cmr_agent_tpu.tools.visualize --dataset synthetic --tiny \
        --out /tmp/viz                       # expert, no weights needed
    python -m cmr_agent_tpu.tools.visualize --dataset kitti --data-root .. \
        --policy agent --geo-ckpt geo_feat.pth --agent-ckpt agent.pth

Everything runs on CPU fine (single sample, tiny compile).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# ink tokens for text/grids (never the series colors)
_INK = "#374151"
_MUTED = "#9ca3af"
_CURRENT = "#2f6fed"   # current-estimate cloud (series 1)
_TARGET = "#b0b4bb"    # ground-truth cloud (neutral reference)


def _se3_apply_disentangled(pc, pose, mean):
    """Disentangled transform (environment.py:46-54): rotate about the
    cloud centroid, then translate."""
    R, t = pose[:3, :3], pose[:3, 3]
    return (pc - mean) @ R.T + mean + t


def _project(pc_cam, K):
    z = pc_cam[:, 2]
    uv = pc_cam @ K.T
    with np.errstate(divide="ignore", invalid="ignore"):
        uv = uv[:, :2] / uv[:, 2:3]
    return uv, z


def render_frame(img, pc, K4, pose, mean, pose_tgt, step, rte, rre,
                 action_txt=""):
    """One [H,W,3] uint8 frame: overlay + BEV panels."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = img.shape[:2]
    moved = _se3_apply_disentangled(pc, pose, mean)
    uv, z = _project(moved, K4)
    ok = (z > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < h)

    fig, (ax0, ax1) = plt.subplots(
        1, 2, figsize=(11, 4), dpi=110,
        gridspec_kw={"width_ratios": [1.6, 1.0]})
    fig.patch.set_facecolor("white")

    ax0.imshow(img, interpolation="nearest")
    if ok.any():
        order = np.argsort(-z[ok])     # far first so near points win
        ax0.scatter(uv[ok, 0][order], uv[ok, 1][order], c=z[ok][order],
                    cmap="viridis", s=1.2, linewidths=0,
                    vmin=2.0, vmax=max(40.0, float(np.percentile(z[ok], 95))))
    ax0.set_xlim(0, w)
    ax0.set_ylim(h, 0)
    ax0.set_xticks([])
    ax0.set_yticks([])
    ax0.set_title(f"step {step}: {int(ok.sum())}/{len(pc)} pts in frustum"
                  f"{action_txt}", color=_INK, fontsize=10, loc="left")

    tgt = _se3_apply_disentangled(pc, pose_tgt, mean)
    ax1.scatter(tgt[:, 0], tgt[:, 2], s=1.0, c=_TARGET, linewidths=0,
                label="target (GT pose)")
    ax1.scatter(moved[:, 0], moved[:, 2], s=1.0, c=_CURRENT, linewidths=0,
                label="current estimate")
    ax1.set_aspect("equal")
    ax1.set_title(f"BEV — RTE {rte:.2f} m, RRE {rre:.1f}°",
                  color=_INK, fontsize=10, loc="left")
    ax1.tick_params(colors=_MUTED, labelsize=7)
    for s in ax1.spines.values():
        s.set_color(_MUTED)
    leg = ax1.legend(loc="upper right", fontsize=7, frameon=False,
                     markerscale=6)
    for txt in leg.get_texts():
        txt.set_color(_INK)

    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def run_and_render(cfg, batch, out_dir: str, policy: str = "expert",
                   geo_vars=None, agent_state=None, sample: int = 0,
                   make_gif: bool = True):
    """Run one episode on ``batch`` and write frames to ``out_dir``.

    Returns the list of (rte, rre) per step (len K+1, incl. the initial
    state).
    """
    import jax
    import jax.numpy as jnp

    from ..env import (apply_action, bearing_init_pose, expert_action,
                       init_poses, observation_from_pose)
    from ..ops import pose_diff, to_disentangled

    os.makedirs(out_dir, exist_ok=True)
    b1 = {k: np.asarray(v[sample:sample + 1]) for k, v in batch.items()}

    img = np.clip(b1["img"][0], 0, 1)
    pc = b1["pc"][0]
    K4 = b1["K"][0].copy()
    K4[:2] *= 4.0                      # K is stored at the 1/4 PnP scale
    mean = pc.mean(axis=0, keepdims=True)

    pose_tgt_j = to_disentangled(jnp.asarray(b1["P"]), jnp.asarray(b1["pc"]))
    pose_tgt = np.asarray(pose_tgt_j)[0]
    pose = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))

    r_steps = jnp.asarray(cfg.r_steps_array())
    t_steps = jnp.asarray(cfg.t_steps_array())

    if policy in ("agent", "untrained"):
        state = {
            "pc": jnp.asarray(b1["pc"]), "K": jnp.asarray(b1["K"]),
            "pc_overlap_pred": geo_vars["pc_overlap_pred"],
            "pc_geo_feat": geo_vars["pc_geo_feat"],
            "img_geo_feat": geo_vars["img_geo_feat"],
        }
        apply_fn = jax.jit(lambda v, o2, o3: agent_state.apply_fn(
            v, o2, o3, train=False))
        avars = {"params": agent_state.params,
                 "batch_stats": agent_state.batch_stats}
        if cfg.bearing_init:
            # start from the coarse bearing-aligned yaw, exactly like the
            # rollout/eval episodes (train_agent.make_rollout_fn) — an
            # agent trained with bearing_init never sees identity starts
            pose = np.asarray(bearing_init_pose(state),
                              dtype=np.float32)
    elif cfg.bearing_init:
        print("[visualize] note: --bearing-init only affects the agent/"
              "untrained policies (the analytic expert is pose-fed); "
              "rendering the expert from identity")

    frames, errs = [], []
    r_tab = np.asarray(cfg.r_steps_array())
    t_tab = np.asarray(cfg.t_steps_array())
    for step in range(cfg.action_num + 1):
        rte, rre = (np.asarray(x)[0] for x in pose_diff(
            jnp.asarray(pose), pose_tgt_j))
        errs.append((float(rte), float(rre)))
        action_txt = ""
        if step < cfg.action_num:
            if policy == "expert":
                ar, at = expert_action(jnp.asarray(pose), pose_tgt_j,
                                       r_steps, t_steps, cfg.is_6_dof)
            else:
                obs2d, obs3d = observation_from_pose(
                    state, jnp.asarray(pose), cfg.image_h, cfg.image_w,
                    use_pallas=cfg.use_pallas,
                    pose_aware=cfg.pose_aware_observation,
                    bearing_channels=cfg.obs_bearing_channels,
                    raster_mode=cfg.raster_mode)
                rl, tl, _ = apply_fn(avars, obs2d, obs3d)
                ar = jnp.argmax(rl, axis=-1)
                at = jnp.argmax(tl, axis=-1)
            a_r, a_t = np.asarray(ar)[0], np.asarray(at)[0]
            action_txt = (f" — action: yaw {r_tab[a_r[0]] * 57.2958:+.1f}°,"
                          f" x {t_tab[a_t[0]]:+.1f} m,"
                          f" z {t_tab[a_t[-1]]:+.1f} m")
        frame = render_frame(img, pc, K4, pose[0], mean, pose_tgt, step,
                             float(rte), float(rre), action_txt)
        frames.append(frame)
        path = os.path.join(out_dir, f"step-{step:02d}.png")
        from PIL import Image
        Image.fromarray(frame).save(path)
        if step < cfg.action_num:
            pose = np.asarray(apply_action(ar, at, jnp.asarray(pose),
                                           r_steps, t_steps, cfg.is_6_dof))

    if make_gif:
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(os.path.join(out_dir, "episode.gif"), save_all=True,
                     append_images=imgs[1:], duration=600, loop=0)
    with open(os.path.join(out_dir, "errors.json"), "w") as f:
        json.dump({"rte": [e[0] for e in errs], "rre": [e[1] for e in errs],
                   "policy": policy}, f)
    return errs


def main(argv=None):
    from ..cli.common import (add_common_args, apply_obs_overrides,
                              build_config, build_dataset)
    from ..data import collate

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_common_args(p)
    p.add_argument("--out", default="viz")
    p.add_argument("--policy", choices=["expert", "agent", "untrained"],
                   default="expert")
    p.add_argument("--geo-ckpt", default="",
                   help="orbax dir or reference geo_feat.pth (agent policy)")
    p.add_argument("--agent-ckpt", default="",
                   help="orbax dir or reference agent.pth (agent policy)")
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--mode", default="val", choices=["train", "val", "test"])
    p.add_argument("--pose-aware", action="store_true",
                   help="pose-aware 3-D observation — REQUIRED for agents "
                        "trained with --pose-aware, else the policy is "
                        "rendered on out-of-distribution static-cloud "
                        "observations (Config.pose_aware_observation)")
    p.add_argument("--obs-bearing", action="store_true",
                   help="bearing observation channels — must match how "
                        "the agent was trained (Config.obs_bearing_channels)")
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

    cfg = apply_obs_overrides(build_config(args), args)
    ds = build_dataset(cfg, args, args.mode)
    n = min(len(ds), max(args.sample + 1, 1))
    batch = collate([ds[i] for i in range(n)])

    geo_vars = agent_state = None
    if args.policy in ("agent", "untrained"):
        import jax
        import jax.numpy as jnp

        from ..train import (convert_torch_agent, create_agent_state,
                             restore_model_variables)
        from ..cli.train_agent import load_geo_variables
        from ..train.train_geo import make_geo_forward

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        gv = load_geo_variables(cfg, args, jb)
        out = make_geo_forward(cfg)(gv["params"], gv["batch_stats"], jb)
        geo_vars = {k: out[k][args.sample:args.sample + 1]
                    for k in ("pc_overlap_pred", "pc_geo_feat",
                              "img_geo_feat")}
        h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
        agent_state = create_agent_state(
            cfg, jnp.zeros((1, h, w, 2 * f)),
            jnp.zeros((1, cfg.num_pt, cfg.obs3d_channels)), jax.random.key(0))
        if args.policy == "agent" and args.agent_ckpt:
            template = {"params": agent_state.params,
                        "batch_stats": agent_state.batch_stats}
            if args.agent_ckpt.endswith(".pth"):
                loaded = convert_torch_agent(cfg, args.agent_ckpt, template)
            else:
                loaded = restore_model_variables(args.agent_ckpt, template)
            agent_state = agent_state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"])

    errs = run_and_render(cfg, batch, args.out, policy=args.policy,
                          geo_vars=geo_vars, agent_state=agent_state,
                          sample=args.sample)
    print(json.dumps({"out": args.out, "policy": args.policy,
                      "rte": [round(e[0], 3) for e in errs],
                      "rre": [round(e[1], 3) for e in errs]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
