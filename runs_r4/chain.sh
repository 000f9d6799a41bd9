#!/bin/bash
# Round-4 reproduction chain for CONVERGENCE.md section 16 (checkpoints
# did not survive the round boundary). Stages per the documented repro
# commands; each logs to runs_r4/ and saves checkpoints for the eval
# experiments (K=13-15 decode, shared-frame z-scored re-vote).
cd /root/repo
set -x
echo "=== stage 1: geo at +-pi (IR-selected) $(date) ==="
timeout 5400 python examples/convergence_demo.py --full --scene structured \
  --batch-size 8 --geo-steps 4000 --geo-refresh-every 10 --agent-steps 0 \
  --val-size 32 --geo-select-ir --save-geo runs_r4/geo_pi \
  > runs_r4/stage1_geo_pi.log 2>&1
echo "rc=$? stage1 done $(date)"
echo "=== stage 2: capstone geo at +-45deg $(date) ==="
timeout 5400 python examples/convergence_demo.py --full --scene structured \
  --batch-size 8 --geo-steps 4000 --geo-refresh-every 10 --agent-steps 0 \
  --val-size 32 --r-amp 0.7854 --save-geo runs_r4/geo_45 \
  > runs_r4/stage2_geo_45.log 2>&1
echo "rc=$? stage2 done $(date)"
echo "=== stage 3: capstone agent at +-45deg $(date) ==="
timeout 7200 python examples/convergence_demo.py --full --scene structured \
  --batch-size 8 --load-geo runs_r4/geo_45 --agent-steps 5000 \
  --refresh-every 40 --pool-size 16 --val-size 32 --val-every 200 \
  --r-amp 0.7854 --pose-aware --aux-head --bearing-init \
  --expert-beta-frac 0.33 --expert-beta-floor 0.2 --lr 3e-4 \
  --lr-epoch-steps 4200 --select-median --save-agent runs_r4/agent_45 \
  > runs_r4/stage3_agent_45.log 2>&1
echo "rc=$? stage3 done $(date)"
echo "=== stage 4: cost volume at +-pi on frozen geo_pi $(date) ==="
timeout 10800 python -m cmr_agent_tpu.cli.train_iter --dataset synthetic \
  --synthetic-scene structured --synthetic-length 2048 --val-length 32 \
  --batch-size 4 --dtype bfloat16 --geo-ckpt runs_r4/geo_pi \
  --unmasked-warp --steps 6750 > runs_r4/stage4_iter.log 2>&1
echo "rc=$? stage4 done $(date)"
echo "=== chain complete $(date) ==="
