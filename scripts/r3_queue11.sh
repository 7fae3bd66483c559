#!/bin/bash
# Round-3 queue 11: follow-ups the r3p sweep surfaced — strong shrinkage
# (lambda 0.55) made even the no-overshoot model plan at gap -0.90, the
# best measured; probe it on the corrected r3q model, plus the S=8
# sampled-leaf arm that queue8 skipped (live-edit lesson: bash re-reads
# scripts by byte offset; never edit a running queue).
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue10.pid) 2>/dev/null; do sleep 60; done

echo "=== r3q strong-shrink arms $(date +%H:%M:%S) ==="
PS_TAG=_lo PS_LAMBDAS=0.55,0.4 timeout 3600 \
  python scripts/plan_shrink_sweep.py runs/r3q_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -12

echo "=== r3q sampled-leaf arm (S=8, budget 216) $(date +%H:%M:%S) ==="
PS_TAG=_s8 PS_BUDGETS=216 PS_LAMBDAS=1.0,0.55 PS_SAMPLES=8 timeout 3600 \
  python scripts/plan_shrink_sweep.py runs/r3q_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -8

echo "=== r3p strong-shrink replication at 54 sims (default budget) $(date +%H:%M:%S) ==="
PS_TAG=_54 PS_BUDGETS=54 PS_LAMBDAS=1.0,0.55 timeout 1800 \
  python scripts/plan_shrink_sweep.py runs/r3p_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -8

echo "=== queue11 done $(date +%H:%M:%S) ==="
