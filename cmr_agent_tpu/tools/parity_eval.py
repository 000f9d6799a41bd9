"""Real-artifact parity kit: converted-weights eval vs the reference, side
by side, under the reference's own protocol.

Given the reference's trained checkpoints (``geo_feat.pth`` /
``agent.pth``) this runs, in one command:

1. torch ``.pth`` -> weight converter -> **our** framework executing the
   reference protocol — test split, seed 2023, batch size 1, 10
   deterministic (argmax) refinement steps -> RR / RTE / RRE
   (/root/reference/Test_Agent.py:125,151-206) and the matching inlier
   ratio at <=3 px (/root/reference/Test_Geo.py:109-119);
2. the **reference's own** MultiHeadModel + CMRAgent + environment
   executing the same protocol on the same samples (torch CPU, with the
   torch_scatter shim);
3. a side-by-side report with per-sample deltas.

No trained blobs exist in this environment, so ``--dry-run`` keeps the
whole kit proven end-to-end: it fabricates random-weight reference
checkpoints at reduced dims (saved as real ``.pth`` files), feeds both
sides identical synthetic samples, and asserts the two stacks agree
per-sample. When real artifacts arrive this becomes the promised
one-liner::

    python -m cmr_agent_tpu.tools.parity_eval \
        --geo-ckpt checkpoint/KITTI/geo_feat.pth \
        --agent-ckpt checkpoint/KITTI/agent.pth \
        --data-root /data/kitti --max-samples 200

By default both sides consume OUR data pipeline's samples (per-sample
comparable everywhere); ``--reference-loader`` switches the reference side
to its own ``KittiDataset`` (requires cv2/PIL, the reference's host deps),
making the comparison fully independent end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np

# Reduced-but-consistent dims for --dry-run (the reference hardcodes the
# 40x128 fused image map AND the 64-wide feature channel — its environment
# scatters exactly 64 channels, environment.py:79 — so image dims and
# embed_dim stay full scale; everything else shrinks on BOTH sides, same
# scheme as tests/test_full_graph_parity.py).
DRY_DIMS = dict(embed_dim=64, mlp_dim=256, num_sa_layer=2,
                num_ca_layer_coarse=2, linear_attention_num=2,
                num_pt=2048, num_node=256, num_proxy=64,
                circle_loss_num=64)

PROTOCOL_SEED = 2023          # /root/reference/config/KittiConfig.py:30
PROTOCOL_STEPS = 10           # action_num, KittiConfig.py:100


# --------------------------------------------------------------------------
# sample plumbing
# --------------------------------------------------------------------------

def to_torch_batch(sample):
    """Our sample dict (channels-last numpy) -> the reference's bs-1 torch
    layout (/root/reference/dataset/KittiDataset.py:400-423)."""
    import torch

    def t(a, dtype=None):
        a = np.ascontiguousarray(a)
        out = torch.from_numpy(a[None].copy())
        return out.to(dtype) if dtype is not None else out

    return {
        "img": t(np.moveaxis(sample["img"], -1, 0)),          # [1,3,H,W]
        "pc": t(sample["pc"].T),                               # [1,3,N]
        "node": t(sample["node"].T),                           # [1,3,M]
        "pc_in_cam_space": t(sample["pc_in_cam_space"].T),
        "pt2node": t(sample["pt2node"], torch.long),
        "pc_mask": t(sample["pc_mask"], torch.long),
        "img_mask": t(sample["img_mask"], torch.long),
        "P": t(sample["P"]),
        "K": t(sample["K"]),
        "pc_idx_for_circle_loss": t(sample["pc_idx_for_circle_loss"],
                                    torch.long),
        "pc_xy_int_for_circle_loss": t(sample["pc_xy_int_for_circle_loss"],
                                       torch.long),
        "pc_xy_float_for_circle_loss":
            t(sample["pc_xy_float_for_circle_loss"]),
    }


def iter_samples(args, cfg):
    """Yield our-format sample dicts under the protocol split."""
    from ..cli.common import build_dataset

    ds = build_dataset(cfg, args, "test")
    n = len(ds)
    if args.max_samples:
        n = min(n, args.max_samples)
    for i in range(n):
        yield ds[i]


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------

def run_ours(cfg, geo_ckpt: str, agent_ckpt: str, samples):
    """Converted weights through our jit episode, reference protocol."""
    import jax
    import jax.numpy as jnp

    from ..models.multi_head import matching_inlier_ratio
    from ..train import (create_agent_state, make_val_episode_fn,
                         convert_torch_multihead, convert_torch_agent)
    from ..train.train_geo import make_geo_forward
    from ..models import MultiHeadModel

    sample0 = samples[0]
    example = {k: jnp.asarray(np.asarray(v)[None]) for k, v in
               sample0.items()}

    geo_model = MultiHeadModel(cfg)
    init = jax.jit(lambda rngs, b: geo_model.init(rngs, b, train=False,
                                                  with_loss=False))
    variables = init({"params": jax.random.key(0),
                      "dropout": jax.random.key(1)}, example)
    template = {"params": variables["params"],
                "batch_stats": variables["batch_stats"]}
    geo_vars = convert_torch_multihead(cfg, geo_ckpt, template)
    geo_forward = make_geo_forward(cfg)

    h, w, f = cfg.image_h, cfg.image_w, cfg.embed_dim
    agent_state = create_agent_state(
        cfg, jnp.zeros((1, h, w, 2 * f)), jnp.zeros((1, cfg.num_pt, 5)),
        jax.random.key(0))
    agent_tpl = {"params": agent_state.params,
                 "batch_stats": agent_state.batch_stats}
    loaded = convert_torch_agent(cfg, agent_ckpt, agent_tpl)
    agent_state = agent_state.replace(params=loaded["params"],
                                      batch_stats=loaded["batch_stats"])

    episode = make_val_episode_fn(cfg)

    @jax.jit
    def ir_fn(geo_out, batch):
        return matching_inlier_ratio(
            geo_out["pc_geo_feat"][0], geo_out["img_geo_feat"][0],
            batch["pc_mask"][0].astype(bool), batch["point_xy_float_all"][0],
            cfg.image_w, cfg.image_h)

    rte_all, rre_all, ir_all = [], [], []
    for s in samples:
        batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in s.items()}
        geo_out = geo_forward(geo_vars["params"], geo_vars["batch_stats"],
                              batch)
        _, rte, rre = episode(agent_state, geo_out, batch)
        rte_all.append(float(rte[0]))
        rre_all.append(float(rre[0]))
        ir_all.append(float(ir_fn(geo_out, batch)))
    return rte_all, rre_all, ir_all


# --------------------------------------------------------------------------
# reference side
# --------------------------------------------------------------------------

def _build_reference_config(dry_run: bool, dataset: str = "kitti",
                            data_root: str = "/nonexistent"):
    """``data_root`` must be the real dataset root when the reference
    loader runs (``--reference-loader``); dry runs never touch it."""
    import importlib

    if dataset == "nuscenes":
        cfg_mod = importlib.import_module("config.NuScenesConfig")
        rcfg = cfg_mod.NuScenesConfiguration(data_root)
    else:
        cfg_mod = importlib.import_module("config.KittiConfig")
        rcfg = cfg_mod.KittiConfiguration(data_root)
    if dry_run:
        for k, v in DRY_DIMS.items():
            if hasattr(rcfg, k):
                setattr(rcfg, k, v)
    return rcfg


def run_reference(rcfg, geo_ckpt: str, agent_ckpt: str, samples,
                  cfg=None):
    """The reference's own model + environment under its own protocol
    (Test_Agent.py:149-191): geo forward, env.init/to_disentangled, 10
    deterministic steps, get_P_diff. IR is computed with the same metric
    code as our side, on the reference's features."""
    import importlib

    import torch
    import jax.numpy as jnp

    from ..models.multi_head import matching_inlier_ratio

    mhm = importlib.import_module("models.MultiHeadModel")
    agent_mod = importlib.import_module("models.CMRAgent")
    env = importlib.import_module("environment.environment")
    from scipy.spatial.transform import Rotation

    geo_model = mhm.MultiHeadModel(rcfg).eval()
    geo_model.load_state_dict(torch.load(geo_ckpt, map_location="cpu"))
    agent = agent_mod.CMRAgent(rcfg).eval()
    agent.load_state_dict(torch.load(agent_ckpt, map_location="cpu"))

    def get_p_diff(p_pred, p_gt):   # Test_Agent.py:98-105
        r_diff = np.dot(p_pred[0:3, 0:3], p_gt[0:3, 0:3].T)
        err = Rotation.from_matrix(r_diff).as_euler("XYZ", degrees=True)
        return (float(np.linalg.norm(p_pred[0:3, 3] - p_gt[0:3, 3])),
                float(np.sum(np.abs(err))))

    rte_all, rre_all, ir_all = [], [], []
    with torch.no_grad():
        for s in samples:
            data = s if isinstance(s, dict) and "img" in s and hasattr(
                s["img"], "dim") else to_torch_batch(s)
            geo_model(data)
            pose_source, pose_target = env.init(data)
            pose_target = env.to_disentangled(pose_target, data["pc"])
            for _ in range(PROTOCOL_STEPS):
                s2, s3 = env.observation_from_a_pose(data, pose_source)
                r_logits, t_logits, _ = agent(s2, s3)
                a_r, a_t = agent.action_from_logits(r_logits, t_logits,
                                                    deterministic=True)
                pose_source = env.step(a_r, a_t, pose_source, rcfg)
            t_diff, r_diff = get_p_diff(pose_source[0].numpy(),
                                        pose_target[0].numpy())
            rte_all.append(t_diff)
            rre_all.append(r_diff)
            if cfg is not None and not hasattr(s.get("img"), "dim"):
                ir_all.append(float(matching_inlier_ratio(
                    jnp.asarray(data["pc_geo_feat"][0].numpy().T),
                    jnp.asarray(np.moveaxis(
                        data["img_geo_feat"][0].numpy(), 0, -1)),
                    jnp.asarray(s["pc_mask"]).astype(bool),
                    jnp.asarray(s["point_xy_float_all"]),
                    cfg.image_w, cfg.image_h)))
    return rte_all, rre_all, ir_all


# --------------------------------------------------------------------------
# dry-run checkpoint fabrication
# --------------------------------------------------------------------------

def fabricate_reference_checkpoints(rcfg, out_dir: str):
    """Random-weight reference modules (with randomised BN running stats,
    the hard part of conversion) saved as real .pth files."""
    import importlib

    import torch

    mhm = importlib.import_module("models.MultiHeadModel")
    agent_mod = importlib.import_module("models.CMRAgent")

    torch.manual_seed(0)
    geo = mhm.MultiHeadModel(rcfg).eval()
    agent = agent_mod.CMRAgent(rcfg).eval()
    g = torch.Generator().manual_seed(1)
    for module in (geo, agent):
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                              torch.nn.BatchNorm3d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    geo_path = os.path.join(out_dir, "geo_feat.pth")
    agent_path = os.path.join(out_dir, "agent.pth")
    torch.save(geo.state_dict(), geo_path)
    torch.save(agent.state_dict(), agent_path)
    return geo_path, agent_path


# --------------------------------------------------------------------------
# report
# --------------------------------------------------------------------------

def side_by_side(ours, theirs, paired: bool = True):
    """``paired=False`` when the two sides ran on different samples
    (``--reference-loader``: independent random perturbations) — per-sample
    deltas would pair unrelated episodes and read as noise, so only the
    aggregate blocks are comparable then."""
    from ..train import registration_metrics

    def block(rte, rre, ir):
        m = registration_metrics(np.array(rte), np.array(rre))
        if ir:
            m["matching_inlier_ratio"] = float(np.mean(ir))
        return m

    o = block(*ours)
    r = block(*theirs)
    deltas = {}
    if paired and len(ours[0]) == len(theirs[0]):
        deltas = {
            "rte_abs_delta_mean": float(np.mean(np.abs(
                np.array(ours[0]) - np.array(theirs[0])))),
            "rre_abs_delta_mean": float(np.mean(np.abs(
                np.array(ours[1]) - np.array(theirs[1])))),
        }
    report = {"ours": o, "reference": r, "per_sample_deltas": deltas,
              "num_samples": len(ours[0])}
    if not paired:
        report["per_sample_deltas"] = None
        report["pairing"] = ("unpaired: sides ran on independent samples "
                             "(--reference-loader); compare aggregates only")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--geo-ckpt", default="",
                   help="reference geo_feat.pth (required unless --dry-run)")
    p.add_argument("--agent-ckpt", default="",
                   help="reference agent.pth (required unless --dry-run)")
    p.add_argument("--dataset", default="kitti",
                   choices=["kitti", "nuscenes", "synthetic"])
    p.add_argument("--data-root", default="")
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--dry-run", action="store_true",
                   help="no artifacts needed: fabricate random reference "
                        "checkpoints at reduced dims, synthetic samples, "
                        "assert per-sample agreement")
    p.add_argument("--skip-reference", action="store_true",
                   help="only run our side (e.g. no torch runtime)")
    p.add_argument("--reference-loader", action="store_true",
                   help="reference side uses its own KittiDataset "
                        "(requires cv2/PIL); default feeds both sides "
                        "our pipeline's samples for per-sample deltas")
    p.add_argument("--synthetic-length", type=int, default=8)
    p.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--num-workers", type=int, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--out", default="", help="write the report JSON here")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. 'cpu' for a dry run "
                        "off-TPU; env vars alone cannot override an "
                        "already-registered PJRT plugin)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from .reference_shim import install_reference_imports
    install_reference_imports()

    from ..cli.common import enable_compile_cache, set_seed
    from ..config import Config, kitti_config, nuscenes_config

    enable_compile_cache()
    set_seed(PROTOCOL_SEED)

    tmpdir = None
    if args.dry_run:
        # dry-run honours --dataset too: the nuscenes pair differs in crop
        # width (320 px -> 40x80 fused map), so both sides must shrink from
        # the SAME base config
        if args.dataset == "nuscenes":
            import dataclasses
            # The reference's released MultiHeadModel hardcodes the KITTI
            # 40x128 fused map (MultiHeadModel.py:206-207,307-308,340) and
            # CRASHES at NuScenes' 320-px crop (40x80) — the authors must
            # have edited those literals per dataset. The dry run therefore
            # exercises the NuScenesConfiguration routing at the KITTI map
            # geometry; a real-artifact NuScenes run needs the artifact's
            # actual training dims anyway.
            cfg = dataclasses.replace(nuscenes_config(seed=PROTOCOL_SEED),
                                      cropped_img_w=512, **DRY_DIMS)
        else:
            cfg = Config(name="kitti", seed=PROTOCOL_SEED, **DRY_DIMS)
        rcfg = _build_reference_config(dry_run=True, dataset=args.dataset)
        if args.dataset == "nuscenes":
            rcfg.cropped_img_W = 512
            rcfg.image_W = 128      # NuScenesConfig.py:56-57 derives in init
        args.dataset = "synthetic"
        tmpdir = tempfile.mkdtemp(prefix="cmr_parity_")
        args.geo_ckpt, args.agent_ckpt = fabricate_reference_checkpoints(
            rcfg, tmpdir)
        print(f"[dry-run] fabricated reference checkpoints in {tmpdir}")
    else:
        if not (args.geo_ckpt and args.agent_ckpt):
            p.error("--geo-ckpt and --agent-ckpt are required "
                    "(or use --dry-run)")
        make = nuscenes_config if args.dataset == "nuscenes" else kitti_config
        cfg = make(args.data_root, seed=PROTOCOL_SEED)
        rcfg = _build_reference_config(dry_run=False, dataset=args.dataset,
                                       data_root=args.data_root)

    samples = list(iter_samples(args, cfg))
    print(f"protocol: {len(samples)} samples, seed {PROTOCOL_SEED}, bs 1, "
          f"{PROTOCOL_STEPS} argmax steps")

    ours = run_ours(cfg, args.geo_ckpt, args.agent_ckpt, samples)
    print(f"ours done: mean RTE {np.mean(ours[0]):.4f} "
          f"RRE {np.mean(ours[1]):.4f} IR {np.mean(ours[2]):.4f}")

    if args.skip_reference:
        from ..train import registration_metrics
        report = {"ours": registration_metrics(np.array(ours[0]),
                                               np.array(ours[1])),
                  "num_samples": len(samples)}
        report["ours"]["matching_inlier_ratio"] = float(np.mean(ours[2]))
    else:
        if args.reference_loader:
            import importlib
            kd = importlib.import_module("dataset.KittiDataset")
            ref_ds = kd.KittiDataset(rcfg, mode="test")
            # dataset __getitem__ has no batch axis; the protocol is bs 1
            ref_samples = [{k: v.unsqueeze(0)
                            for k, v in ref_ds[i].items()}
                           for i in range(len(samples))]
        else:
            ref_samples = samples
        theirs = run_reference(rcfg, args.geo_ckpt, args.agent_ckpt,
                               ref_samples, cfg=cfg)
        print(f"reference done: mean RTE {np.mean(theirs[0]):.4f} "
              f"RRE {np.mean(theirs[1]):.4f}")
        report = side_by_side(ours, theirs,
                              paired=not args.reference_loader)

        if args.dry_run:
            d = report["per_sample_deltas"]
            # identical weights + identical inputs: the two stacks must
            # agree per-sample (float tolerance over 10 composed steps —
            # a discrete action flip on a near-tie logit would show up
            # as a large delta here)
            assert d["rte_abs_delta_mean"] < 1e-2, d
            assert d["rre_abs_delta_mean"] < 1.0, d
            report["dry_run_agreement"] = "PASS"

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
