#!/bin/bash
# Round-5 eval experiments (VERDICT r4 items #1, #2, #9):
#   E1 flagship repro at K=9 (round-3 90.6% protocol, now batch 8)
#   E2 flagship at K=13 (rank-2 conditional-translation decode)
#   E3 = E2 + int8 raster (megatopk+int8 accuracy A/B vs E2)
#   E4 shared-frame z-scored re-vote at the STRONG checkpoint (r4-E2 retest)
#   E5 rank-2 nomination + shared frame at the strong checkpoint (r4-E3)
cd /root/repo
ITER=$(python - <<'PY'
import glob, re
cands = glob.glob("checkpoint/iter_*/epoch-*-step-*")
best = max(cands, key=lambda p: int(re.search(r"step-(\d+)", p).group(1)))
print(best)
PY
)
echo "iter ckpt: $ITER"
for d in runs_r4/geo_pi runs_r4/geo_45 runs_r4/agent_45 "$ITER"; do
  if [ ! -d "$d" ]; then echo "MISSING CHECKPOINT: $d -- aborting evals"; exit 1; fi
done
COMMON="--dataset synthetic --synthetic-scene structured --synthetic-length 64 \
  --dtype bfloat16 --iter-ckpt $ITER --geo-ckpt runs_r4/geo_pi \
  --fine-geo-ckpt runs_r4/geo_45 --agent-ckpt runs_r4/agent_45 \
  --unmasked-warp --pose-aware --aux-head --bearing-init \
  --hypo-score combo --refine-rounds 1 --eval-batch-size 8"
set -x
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 9 \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  > runs_r5/e1_flagship_k9.log 2>&1
echo "rc=$? e1 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 13 \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  > runs_r5/e2_flagship_k13.log 2>&1
echo "rc=$? e2 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 13 --raster-int8 \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  > runs_r5/e3_k13_int8.log 2>&1
echo "rc=$? e3 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 9 \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  --beam-frame shared \
  > runs_r5/e4_sharedframe.log 2>&1
echo "rc=$? e4 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 9 \
  --refine-beam combo,combo:2,mean_valid,ir_smooth \
  --beam-score above50_norm --beam-frame shared \
  > runs_r5/e5_rank2_shared.log 2>&1
echo "rc=$? e5 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 13 --obs3d-compact \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  > runs_r5/e6_k13_obs3d_compact.log 2>&1
echo "rc=$? e6 done $(date)"
echo "=== train-probe (VERDICT r4 #3) ==="
timeout 1800 python -m cmr_agent_tpu.tools.train_probe --batch 8 --steps 30 \
  > runs_r5/train_probe.log 2>&1
echo "rc=$? train_probe done $(date)"
echo "evals complete $(date)"
