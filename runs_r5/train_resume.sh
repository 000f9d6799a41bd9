#!/bin/bash
# Round-5 stage: resume the round-4 cost-volume training to the full
# 6750-step budget (VERDICT r4 item #1). Relaunched once at step 3500
# after fixing train_iter to ALWAYS checkpoint at the step cap.
cd /root/repo
set -x
echo "=== resume iter from step 3500 -> 6750 $(date) ==="
timeout 10800 python -m cmr_agent_tpu.cli.train_iter --dataset synthetic \
  --synthetic-scene structured --synthetic-length 2048 --val-length 32 \
  --batch-size 4 --dtype bfloat16 --geo-ckpt runs_r4/geo_pi \
  --unmasked-warp --steps 6750 \
  --resume checkpoint/iter_kitti/epoch-0-step-3500 \
  > runs_r5/iter_resume.log 2>&1
echo "rc=$? iter resume done $(date)"
echo "=== train complete $(date) ==="
