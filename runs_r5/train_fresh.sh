#!/bin/bash
# Round-5 stage B: continue the cost volume PAST the chain.sh budget on a
# 4x larger synthetic pool (fresh scenes per epoch). Rationale: at
# --synthetic-length 2048 the 6750-step run sees each scene ~13x and
# opens a 0.2-nat train/val gap (4.85 vs 5.06) while the candidate
# ceiling stalls at 71.9% -- the documented round-3 trajectory (val 5.01
# by step 2550) never reproduced under the chain.sh reconstruction, and
# data freshness is the strongest unlogged difference a longer round-3
# run could have had.
cd /root/repo
set -x
echo "=== continue iter 6750 -> 11250 on fresh 8192-scene pool $(date) ==="
timeout 10800 python -m cmr_agent_tpu.cli.train_iter --dataset synthetic \
  --synthetic-scene structured --synthetic-length 8192 --val-length 32 \
  --batch-size 4 --dtype bfloat16 --geo-ckpt runs_r4/geo_pi \
  --unmasked-warp --steps 11250 \
  --resume checkpoint/iter_kitti/epoch-6-step-6750 \
  > runs_r5/iter_fresh.log 2>&1
echo "rc=$? iter fresh done $(date)"
echo "=== fresh train complete $(date) ==="
