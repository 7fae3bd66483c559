#!/bin/bash
# Round-3 queue 7: depth-shrink sweep on the paired planning gap — the
# lever named by the branch-value attribution (open-loop reward AUC rots
# 0.96->0.78 over depth; deep search Goodharts on the rotted leaves).
# Sweeps mcts_depth_shrink at the budgets where the Goodhart effect was
# measured (216/864), one oracle eval per budget, CRN-paired.
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue6.pid) 2>/dev/null; do sleep 60; done

echo "=== depth-shrink sweep $(date +%H:%M:%S) ==="
timeout 7200 python scripts/plan_shrink_sweep.py runs/r2a_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -25

echo "=== queue7 done $(date +%H:%M:%S) ==="
