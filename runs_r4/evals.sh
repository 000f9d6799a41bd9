#!/bin/bash
# Post-chain eval experiments for CONVERGENCE.md section 16 (round 4):
#   E1 flagship repro (K=9, 3-member refinement beam, above50 re-vote)
#   E2 + shared-frame z-scored re-vote (cross-frame comparability fix)
#   E3 + rank-2 nomination under the shared frame (the 92.2% coverage)
#   E4 K=13 decode (rank-2 conditional translation cells)
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
  --iter-hypotheses 9 --hypo-score combo --refine-rounds 1 --eval-batch-size 4"
set -x
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  > runs_r4/e1_flagship.log 2>&1
echo "rc=$? e1 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  --beam-frame shared \
  > runs_r4/e2_sharedframe.log 2>&1
echo "rc=$? e2 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --refine-beam combo,combo:2,mean_valid,ir_smooth \
  --beam-score above50_norm --beam-frame shared \
  > runs_r4/e3_rank2_shared.log 2>&1
echo "rc=$? e3 done $(date)"
timeout 3600 python -m cmr_agent_tpu.cli.test_agent $COMMON \
  --iter-hypotheses 13 \
  --refine-beam combo,mean_valid,ir_smooth --beam-score above50_norm \
  > runs_r4/e4_k13.log 2>&1
echo "rc=$? e4 done $(date)"
echo "evals complete $(date)"
