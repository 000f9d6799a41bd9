"""Train the one-shot geo model (reference Train_Geo.py equivalent).

Usage::

    python -m cmr_agent_tpu.cli.train_geo --dataset kitti --data-root ...
    python -m cmr_agent_tpu.cli.train_geo --dataset synthetic --tiny --steps 5
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import collate
from ..train import (create_geo_state, make_geo_train_step,
                     make_geo_eval_step, save_train_checkpoint,
                     restore_train_checkpoint, MetricLogger)
from .common import (add_common_args, build_config, build_dataset,
                     make_loader, maybe_initialize_distributed, set_seed)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--resume", default="",
                   help="orbax checkpoint dir to resume params/stats from")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="optimiser steps fused into one device program "
                        "(lax.scan), for dispatch-bound runtimes. The step "
                        "cap/val interval round up to a multiple; at most "
                        "S-1 tail batches per epoch are dropped (drop_last "
                        "semantics).")
    args = p.parse_args(argv)
    maybe_initialize_distributed(args)

    cfg = build_config(args)
    set_seed(cfg.seed)

    train_ds = build_dataset(cfg, args, "train")
    val_ds = build_dataset(cfg, args, "val")
    train_loader = make_loader(cfg, args, train_ds,
                               batch_size=cfg.train_batch_size,
                               shuffle=True, seed=cfg.seed)
    val_loader = make_loader(cfg, args, val_ds,
                             batch_size=cfg.val_batch_size)

    example = collate([train_ds[0]] * cfg.train_batch_size)
    example = {k: jnp.asarray(v) for k, v in example.items()}
    state = create_geo_state(cfg, example, jax.random.key(cfg.seed),
                             steps_per_epoch=max(len(train_loader), 1))
    if args.resume:
        state, opt_restored = restore_train_checkpoint(args.resume, state)
        opt_msg = ("restored" if opt_restored else
                   "RESET — legacy model-only checkpoint; Adam moments and "
                   "schedule position start fresh")
        print(f"resumed from {args.resume} at step {int(state.step)} "
              f"(optimizer state {opt_msg})")
    dispatch = max(1, args.steps_per_dispatch)
    if dispatch > 1:
        from ..train import make_geo_multi_step
        train_step_multi = make_geo_multi_step(cfg, dispatch)
    else:
        train_step = make_geo_train_step(cfg)
    eval_step = make_geo_eval_step(cfg)

    run_name = f"{args.dataset}_{cfg.num_pt}_{time.strftime('%m-%d-%H-%M')}"
    logger = MetricLogger(os.path.join(cfg.logdir, run_name))
    ckpt_dir = os.path.abspath(os.path.join(cfg.ckpt_dir, run_name))
    os.makedirs(ckpt_dir, exist_ok=True)

    def run():
        nonlocal state
        microbatches = []
        # continue from the restored step on --resume so checkpoint names
        # don't collide with the interrupted run's and --steps caps TOTAL
        # steps across resumes (the schedule continues via opt_state)
        global_step, best_loss = int(state.step), float("inf")
        for epoch in range(cfg.epoch):
            train_loader.set_epoch(epoch)
            for batch in train_loader:
                if args.stop_file and os.path.exists(args.stop_file):
                    logger.flush()
                    save_train_checkpoint(
                        os.path.join(ckpt_dir,
                                     f"stop-epoch-{epoch}-step-{global_step}"),
                        state)
                    print(f"stop-file {args.stop_file} found at step "
                          f"{global_step}; checkpointed and exiting")
                    logger.close()
                    return state
                if (global_step % cfg.val_interval < dispatch
                        and not microbatches and len(val_loader)):
                    logger.flush()
                    val_metrics = []
                    for v_batch in val_loader:
                        v_batch = {k: jnp.asarray(v) for k, v in v_batch.items()}
                        val_metrics.append(
                            {k: float(v) for k, v in eval_step(state, v_batch).items()})
                    mean = {k: float(np.mean([m[k] for m in val_metrics]))
                            for k in val_metrics[0]}
                    logger.log_dict(mean, global_step, prefix="val/")
                    # Save only on improvement, like the reference
                    # (/root/reference/Train_Geo.py:156-163).
                    if np.isfinite(mean["loss"]) and mean["loss"] < best_loss:
                        best_loss = mean["loss"]
                        save_train_checkpoint(
                            os.path.join(ckpt_dir,
                                         f"epoch-{epoch}-step-{global_step}"),
                            state)
                    from ..train.optim import make_lr_schedule
                    cur_lr = float(make_lr_schedule(
                        cfg, max(len(train_loader), 1))(int(state.step)))
                    logger.log("train/lr", cur_lr, global_step)
                    print(f"[val] step {global_step} loss {mean['loss']:.4f} "
                          f"lr {cur_lr:.2e} (best {best_loss:.4f})")

                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if dispatch > 1:
                    microbatches.append(batch)
                    if len(microbatches) < dispatch:
                        continue
                    stacked = {k: jnp.stack([mb[k] for mb in microbatches])
                               for k in batch}
                    microbatches.clear()
                    state, metrics = train_step_multi(
                        state, stacked, jax.random.key(global_step))
                    logger.log_dict_lazy(metrics, global_step, prefix="train/",
                                         steps_axis=True)
                    metrics = {k: v[-1] for k, v in metrics.items()}
                    global_step += dispatch
                else:
                    state, metrics = train_step(state, batch,
                                                jax.random.key(global_step))
                    logger.log_dict_lazy(metrics, global_step, prefix="train/")
                    global_step += 1
                if args.steps and global_step >= args.steps:
                    logger.flush()
                    print(f"step cap reached ({args.steps}); final loss "
                          f"{float(metrics['loss']):.4f}")
                    logger.close()
                    return state
            # a partial accumulation never spans epochs: the tail (at most
            # dispatch-1 batches, analogous to the loader's drop_last) is
            # dropped so one fused scan never mixes epoch streams
            microbatches.clear()
            print(f"epoch {epoch} done")
        logger.close()
        return state

    from ..utils.profiling import trace_context
    with trace_context(args.profile):
        return run()


if __name__ == "__main__":
    main()
