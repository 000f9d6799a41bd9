#!/bin/bash
# Fire evals.sh as soon as the resumed training reports completion.
while ! grep -q "train complete" /root/repo/runs_r5/train_chain.log 2>/dev/null; do
  sleep 60
done
bash /root/repo/runs_r5/evals.sh > /root/repo/runs_r5/evals.log 2>&1
touch /root/repo/runs_r5/EVALS_DONE
