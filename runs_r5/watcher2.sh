#!/bin/bash
# Fire the final flagship eval on the best stage-C checkpoint.
while ! grep -q "fresh2 complete" /root/repo/runs_r5/fresh2_chain.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
ITER=$(python - <<'PY'
import glob, re
cands = glob.glob("checkpoint/iter_kitti/epoch-*-step-*")
best = max(cands, key=lambda p: int(re.search(r"step-(\d+)", p).group(1)))
print(best)
PY
)
echo "stage-C final ckpt: $ITER"
timeout 2400 python -m cmr_agent_tpu.cli.test_agent \
  --dataset synthetic --synthetic-scene structured --synthetic-length 64 \
  --dtype bfloat16 --iter-ckpt "$ITER" \
  --geo-ckpt runs_r4/geo_pi --fine-geo-ckpt runs_r4/geo_45 \
  --agent-ckpt runs_r4/agent_45 --unmasked-warp --pose-aware --aux-head \
  --bearing-init --hypo-score combo --refine-rounds 1 --eval-batch-size 8 \
  --iter-hypotheses 13 --refine-beam combo,mean_valid,ir_smooth \
  --beam-score above50_norm > runs_r5/e8_k13_stageC.log 2>&1
echo "rc=$? e8 done $(date)"
touch /root/repo/runs_r5/E8_DONE
