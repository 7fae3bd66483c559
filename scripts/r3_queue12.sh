#!/bin/bash
# Round-3 queue 12: settle whether the best measured planning arm
# (r3p no-overshoot model + strong depth shrink, gap -0.90 +- 0.28 at
# budget 864 / 40 episodes) reaches the pre-registered parity CI
# (95% CI inside +-0.5 reward/40 steps) once measured properly:
#   1. 80 CRN episodes (halves the SEM) at budget 864 with a finer
#      lambda grid around the optimum, plus the unshrunk reference.
#   2. An S=8 sampled-leaf arm at the best lambda (the one combination
#      never measured on r3p).
#   3. If wall-clock allows, budget 3456 at lambda 0.55 (40 episodes)
#      to extend the "improves with budget" trend one more octave.
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue11.pid) 2>/dev/null; do sleep 60; done

echo "=== r3p fine-lambda at 864, 80 episodes $(date +%H:%M:%S) ==="
PS_TAG=_fine80 PS_BUDGETS=864 PS_LAMBDAS=1.0,0.65,0.55,0.45 timeout 7200 \
  python scripts/plan_shrink_sweep.py runs/r3p_dense2k 80 \
  2>&1 | grep -v cpu_aot_loader | tail -10

echo "=== r3p S=8 sampled-leaf at best lambda, 80 episodes $(date +%H:%M:%S) ==="
PS_TAG=_s8_80 PS_BUDGETS=864 PS_LAMBDAS=0.55 PS_SAMPLES=8 timeout 5400 \
  python scripts/plan_shrink_sweep.py runs/r3p_dense2k 80 \
  2>&1 | grep -v cpu_aot_loader | tail -6

echo "=== r3p budget 3456, lambda 0.55, 40 episodes $(date +%H:%M:%S) ==="
PS_TAG=_3456 PS_BUDGETS=3456 PS_LAMBDAS=0.55 timeout 5400 \
  python scripts/plan_shrink_sweep.py runs/r3p_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -6

echo "=== queue12 done $(date +%H:%M:%S) ==="
