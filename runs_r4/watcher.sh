#!/bin/bash
# Fire evals.sh as soon as the training chain reports completion.
while ! grep -q "chain complete" /root/repo/runs_r4/chain.log 2>/dev/null; do
  sleep 60
done
bash /root/repo/runs_r4/evals.sh > /root/repo/runs_r4/evals.log 2>&1
