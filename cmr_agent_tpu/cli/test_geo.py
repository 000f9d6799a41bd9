"""Evaluate the one-shot geo model + cost-volume pose head (reference
Test_Geo.py).

Per sample: geo forward -> matching inlier ratio (feature-NN, <=3 px) ->
IterModel cost-volume pose estimate -> RTE/RRE of the accumulated matrix.
The committed reference version of this flow cannot run (it needs dataset
keys no dataset emits, SURVEY.md §2.4); our datasets emit them.

Usage::

    python -m cmr_agent_tpu.cli.test_geo --dataset synthetic --tiny
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models import IterModel
from ..models.multi_head import matching_inlier_ratio
from ..ops.geometry import pose_diff
from ..train.convert import convert_torch_itermodel
from ..train.train_iter import iter_model_state
from ..train.train_geo import make_geo_forward
from .common import (add_common_args, apply_obs_overrides, build_config,
                     build_dataset, make_loader,
                     maybe_initialize_distributed, set_seed)
from .train_agent import load_geo_variables


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--geo-ckpt", default="")
    p.add_argument("--iter-ckpt", default="",
                   help="IterModel checkpoint (orbax dir or torch .pth)")
    p.add_argument("--iters", type=int, default=1,
                   help="cost-volume refinement iterations")
    p.add_argument("--unmasked-warp", action="store_true",
                   help="warp ALL points (Config.cost_volume_unmasked); "
                        "must match how the IterModel ckpt was trained")
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--t-amp", type=float, default=None,
                   help="translation perturbation amplitude override (m)")
    p.add_argument("--r-amp", type=float, default=None,
                   help="yaw perturbation amplitude override (rad)")
    args = p.parse_args(argv)
    maybe_initialize_distributed(args)

    cfg = apply_obs_overrides(build_config(args), args)
    set_seed(cfg.seed)

    test_ds = build_dataset(cfg, args, "test")
    loader = make_loader(cfg, args, test_ds, batch_size=1)

    first = next(iter(loader))
    example = {k: jnp.asarray(v) for k, v in first.items()}
    geo_vars = load_geo_variables(cfg, args, example)
    geo_forward = make_geo_forward(cfg)

    iter_model = IterModel(cfg)
    geo_out0 = geo_forward(geo_vars["params"], geo_vars["batch_stats"],
                           example)
    state0 = iter_model_state(geo_out0, example)
    iter_vars = jax.jit(
        lambda r, s: iter_model.init({"params": r}, s, train=False,
                                     with_loss=False))(jax.random.key(0),
                                                       state0)
    if args.iter_ckpt:
        if args.iter_ckpt.endswith(".pth"):
            iter_vars = convert_torch_itermodel(cfg, args.iter_ckpt,
                                                iter_vars)
        else:
            from ..train import restore_model_variables
            iter_vars = restore_model_variables(args.iter_ckpt,
                                                dict(iter_vars))
        print(f"loaded IterModel checkpoint from {args.iter_ckpt}")

    @jax.jit
    def run_iter(iv, state):
        return iter_model.apply(iv, state, train=False, with_loss=True)

    @jax.jit
    def ir_fn(geo_out, batch):
        return matching_inlier_ratio(
            geo_out["pc_geo_feat"][0], geo_out["img_geo_feat"][0],
            batch["pc_mask"][0].astype(bool), batch["point_xy_float_all"][0],
            cfg.image_w, cfg.image_h)

    irs, rtes, rres = [], [], []
    for i, batch in enumerate(loader):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        geo_out = geo_forward(geo_vars["params"], geo_vars["batch_stats"],
                              batch)
        irs.append(float(ir_fn(geo_out, batch)))

        state = iter_model_state(geo_out, batch)
        for _ in range(args.iters):
            out = run_iter(iter_vars, state)
            state = dict(state, pc_i=out["pc_i"],
                         matrix_accumulated=out["matrix_accumulated"])
        # accumulated matrix maps the perturbed cloud back toward cam space;
        # compare with the ground-truth inverse perturbation P
        rte, rre = pose_diff(state["matrix_accumulated"], batch["P"])
        rtes += np.asarray(rte).tolist()
        rres += np.asarray(rre).tolist()
        if args.max_batches and i + 1 >= args.max_batches:
            break

    result = {
        "matching_inlier_ratio": float(np.mean(irs)),
        "cost_volume_rte_mean": float(np.mean(rtes)),
        "cost_volume_rre_mean": float(np.mean(rres)),
        "num_samples": len(irs),
    }
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
