"""Train the IterModel cost-volume pose head against a frozen geo model.

The reference ships IterModel with a CE loss and a commented-out frozen
MultiHeadModel load (models/IterModel.py:31-35,174-192) but no training
entry script at all — this CLI completes the capability (SURVEY.md §2.4):
geo forward (frozen) -> cost-volume forward/backward on the reconstructed
hypothesis-grid labels -> save-on-best checkpoints.

Usage::

    python -m cmr_agent_tpu.cli.train_iter --tiny --dataset synthetic \
        --steps 10 --synthetic-length 8
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..train import save_train_checkpoint, restore_train_checkpoint
from ..train.train_geo import make_geo_forward
from ..train.train_iter import (create_iter_state, iter_model_state,
                                make_iter_train_step)
from .common import (add_common_args, apply_obs_overrides, build_config,
                     build_dataset, make_loader,
                     maybe_initialize_distributed, set_seed)
from .train_agent import load_geo_variables


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--geo-ckpt", default="",
                   help="frozen geo checkpoint (orbax dir or torch .pth); "
                        "random init when empty")
    p.add_argument("--val-interval", type=int, default=0,
                   help="steps between validations (0 = config default)")
    p.add_argument("--resume", default="",
                   help="orbax IterModel train checkpoint dir to resume "
                        "from (params + batch stats + optimizer state)")
    p.add_argument("--unmasked-warp", action="store_true",
                   help="warp ALL points instead of the learned-overlap-"
                        "masked subset (Config.cost_volume_unmasked): the "
                        "per-hypothesis frustum test still filters "
                        "geometrically, and the cost volume stops "
                        "depending on the overlap head (blind on held-out "
                        "scenes at +-pi yaw, docs/CONVERGENCE.md sec. 11)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the cost-volume forward in the "
                        "train step (Config.cost_volume_remat): ~1.3x "
                        "step time for ~2x batch headroom — the "
                        "hypothesis volume is ~1 GB/sample in bf16 at "
                        "KITTI scale, which OOMs a B=8 train step on a "
                        "16 GB chip without this")
    args = p.parse_args(argv)
    maybe_initialize_distributed(args)

    cfg = apply_obs_overrides(build_config(args), args)
    set_seed(cfg.seed)
    val_interval = args.val_interval or cfg.val_interval

    import jax.numpy as jnp

    train_ds = build_dataset(cfg, args, "train")
    val_ds = build_dataset(cfg, args, "val")
    loader = make_loader(cfg, args, train_ds,
                         batch_size=cfg.train_batch_size,
                         shuffle=True, seed=cfg.seed)
    val_loader = make_loader(cfg, args, val_ds,
                             batch_size=cfg.val_batch_size)

    first = next(iter(loader))
    example = {k: jnp.asarray(v) for k, v in first.items()}
    geo_vars = load_geo_variables(cfg, args, example)
    geo_forward = make_geo_forward(cfg)

    geo_out0 = geo_forward(geo_vars["params"], geo_vars["batch_stats"],
                           example)
    state0 = iter_model_state(geo_out0, example)
    iter_state = create_iter_state(cfg, state0, jax.random.key(cfg.seed),
                                   steps_per_epoch=max(1, len(loader)))
    if args.resume:
        iter_state, opt_restored = restore_train_checkpoint(args.resume,
                                                            iter_state)
        print(f"resumed IterModel from {args.resume} (optimizer state "
              f"{'restored' if opt_restored else 'RESET (legacy ckpt)'})")
    step_fn = make_iter_train_step(cfg)

    ckpt_root = os.path.join(cfg.ckpt_dir, f"iter_{cfg.name}")
    best_loss = float("inf")
    # continue the counter from the restored optimizer step so checkpoint
    # names don't collide with the interrupted run's and --steps caps
    # TOTAL steps across resumes (the lr schedule already continues via
    # the restored opt_state)
    step = int(iter_state.step)

    from ..models import IterModel
    iter_model = IterModel(cfg)

    from ..train.train_iter import per_axis_accuracy

    @jax.jit
    def eval_fn(params, batch_stats, st):
        out = iter_model.apply({"params": params,
                                "batch_stats": batch_stats},
                               st, train=False, with_loss=True)
        pred = jnp.argmax(out["cost_volume_logits"], axis=-1)
        label = jnp.argmax(out["cost_volume_label"], axis=-1)
        acc = jnp.mean((pred == label).astype(jnp.float32))
        ax = per_axis_accuracy(cfg, out["cost_volume_logits"],
                               out["cost_volume_label"])
        return out["cost_volume_loss"], acc, ax

    def validate():
        losses, accs, axs = [], [], []
        for vb in val_loader:
            vb = {k: jnp.asarray(v) for k, v in vb.items()}
            geo_out = geo_forward(geo_vars["params"],
                                  geo_vars["batch_stats"], vb)
            st = iter_model_state(geo_out, vb)
            vl, va, ax = eval_fn(iter_state.params, iter_state.batch_stats,
                                 st)
            losses.append(float(vl))
            accs.append(float(va))
            axs.append({k: float(v) for k, v in ax.items()})
        ax_mean = {k: float(np.mean([a[k] for a in axs]))
                   for k in axs[0]} if axs else {}
        return float(np.mean(losses)), float(np.mean(accs)), ax_mean

    for epoch in range(cfg.epoch):
        loader.set_epoch(epoch)
        for batch in loader:
            if args.stop_file and os.path.exists(args.stop_file):
                save_train_checkpoint(
                    os.path.join(ckpt_root,
                                 f"stop-epoch-{epoch}-step-{step}"),
                    iter_state)
                print(f"stop-file {args.stop_file} found at step {step}; "
                      f"checkpointed and exiting", flush=True)
                return iter_state
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            geo_out = geo_forward(geo_vars["params"],
                                  geo_vars["batch_stats"], batch)
            st = iter_model_state(geo_out, batch)
            iter_state, metrics = step_fn(iter_state, st)

            if step % val_interval == 0:
                vl, va, vax = validate()
                improved = vl < best_loss
                best_loss = min(best_loss, vl)
                from ..train.optim import make_lr_schedule
                cur_lr = float(make_lr_schedule(
                    cfg, max(1, len(loader)))(int(iter_state.step)))
                print(f"[val] step {step} cv_loss {vl:.4f} "
                      f"grid_acc {va:.3f} "
                      f"ry/tx/tz {vax.get('acc_ry', float('nan')):.3f}/"
                      f"{vax.get('acc_tx', float('nan')):.3f}/"
                      f"{vax.get('acc_tz', float('nan')):.3f} "
                      f"1bin {vax.get('acc_ry_1bin', float('nan')):.3f}/"
                      f"{vax.get('acc_tx_1bin', float('nan')):.3f}/"
                      f"{vax.get('acc_tz_1bin', float('nan')):.3f} "
                      f"lr {cur_lr:.2e} (best {best_loss:.4f})",
                      flush=True)
                if improved:
                    save_train_checkpoint(
                        os.path.join(ckpt_root,
                                     f"epoch-{epoch}-step-{step}"),
                        iter_state)
            step += 1
            if args.steps and step >= args.steps:
                # ALWAYS save the final state: the flagship eval composes
                # from the last checkpoint, and "best val CE" is not the
                # selection criterion there (the decode candidate ceiling
                # keeps improving after val CE plateaus — CONVERGENCE.md
                # §16 K-sweep). Without this, a run whose val loss never
                # re-improves would end with no checkpoint near the cap.
                save_train_checkpoint(
                    os.path.join(ckpt_root, f"epoch-{epoch}-step-{step}"),
                    iter_state)
                print(f"step cap reached ({args.steps}); final cv_loss "
                      f"{float(metrics['cost_volume_loss']):.4f}; "
                      f"saved final checkpoint at step {step}", flush=True)
                return iter_state
        print(f"epoch {epoch} done", flush=True)
    save_train_checkpoint(
        os.path.join(ckpt_root, f"final-step-{step}"), iter_state)
    return iter_state


if __name__ == "__main__":
    main()
