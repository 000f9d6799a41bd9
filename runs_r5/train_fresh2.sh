#!/bin/bash
# Round-5 stage C: final fresh-data leg, resume best-val step-10000 on a
# fully fresh 16384-scene stream (epoch-0 keys differ from both earlier
# pools), +2250 steps.
cd /root/repo
set -x
echo "=== continue iter 10000 -> 12250 on fresh 16384-scene pool $(date) ==="
timeout 7200 python -m cmr_agent_tpu.cli.train_iter --dataset synthetic \
  --synthetic-scene structured --synthetic-length 16384 --val-length 32 \
  --batch-size 4 --dtype bfloat16 --geo-ckpt runs_r4/geo_pi \
  --unmasked-warp --steps 12250 \
  --resume checkpoint/iter_kitti/epoch-1-step-10000 \
  > runs_r5/iter_fresh2.log 2>&1
echo "rc=$? done $(date)"
echo "=== fresh2 complete $(date) ==="
