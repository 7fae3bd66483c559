#!/bin/bash
# Round-4 queue 3: the planning measurements (VERDICT r4 tasks 1, 2, 7).
#   MODEL=runs/r4a_dense_sX  — the basin-protocol avoidance planner chosen
#   from queue1 by the pre-registered trigger (lowest mse@8, in-basin).
# 1. branch diagnostic on the new model (depth-AUC profile: does the 1.7x
#    position improvement raise the 0.78 depth-8 AUC ceiling?)
# 2. 80-episode fine-lambda sweep at budget 864 on the new model
# 3. tree-mode shrink arms on the new model AND on r3p (control) — the
#    implemented-but-unmeasured lever
# 4. lambda=0.60 arm on r3p (bulletproof the round-3 parity CI)
set -u
cd /root/repo
MODEL="${MODEL:-runs/r4a_dense_s0}"
NAME=$(basename "$MODEL")

# round ends ~17:30 UTC 2026-08-18; stop starting stages after 16:55 so
# the driver's round-end bench gets the TPU to itself
DEADLINE="${R4_DEADLINE:-1787072100}"
ddl() { if [ "$(date +%s)" -gt "$DEADLINE" ]; then
  echo "=== DEADLINE passed — skipping remaining queue3 stages ==="; exit 0
fi; }
tmo() { r=$((DEADLINE - $(date +%s))); [ "$r" -lt "$1" ] && echo "$r" || echo "$1"; }

echo "=== branch diag $NAME $(date +%H:%M:%S) ==="
timeout $(tmo 2400) python scripts/plan_branch_diag.py "$MODEL" 64 16 \
  2>&1 | grep -v cpu_aot_loader | tail -15

ddl
echo "=== fine-lambda 80ep sweep $NAME $(date +%H:%M:%S) ==="
PS_TAG=_fine80 PS_BUDGETS=864 PS_LAMBDAS=1.0,0.65,0.55,0.45 timeout $(tmo 9000) \
  python scripts/plan_shrink_sweep.py "$MODEL" 80 \
  2>&1 | grep -v cpu_aot_loader | tail -10

# tree mode compounds the exponent from the ROOT (depth 5-8 tree paths at
# budget 864), so the equivalent shrink is much stronger at equal lambda —
# sweep milder lambdas than leaf mode's 0.55 optimum
ddl
echo "=== tree-mode arms $NAME $(date +%H:%M:%S) ==="
PS_TAG=_tree80 PS_MODE=tree PS_BUDGETS=864 PS_LAMBDAS=0.85,0.75,0.65,0.55 \
  timeout $(tmo 10800) python scripts/plan_shrink_sweep.py "$MODEL" 80 \
  2>&1 | grep -v cpu_aot_loader | tail -8

ddl
if [ -d runs/r3p_dense2k ]; then
  echo "=== tree-mode control on r3p $(date +%H:%M:%S) ==="
  PS_TAG=_tree80 PS_MODE=tree PS_BUDGETS=864 PS_LAMBDAS=0.85,0.75,0.65,0.55 \
    timeout $(tmo 10800) python scripts/plan_shrink_sweep.py runs/r3p_dense2k 80 \
    2>&1 | grep -v cpu_aot_loader | tail -8

  echo "=== lambda 0.60 arm on r3p (CI bulletproofing) $(date +%H:%M:%S) ==="
  PS_TAG=_l60_80 PS_BUDGETS=864 PS_LAMBDAS=0.6 timeout $(tmo 5400) \
    python scripts/plan_shrink_sweep.py runs/r3p_dense2k 80 \
    2>&1 | grep -v cpu_aot_loader | tail -6
else
  # runs/ was wiped by the 2026-08-18 VM reset; the round-3 checkpoint is
  # unrecoverable.  The lambda=0.60 CI point and the tree-mode control are
  # instead taken on $MODEL (the fine-lambda sweep above already brackets
  # 0.60 with 0.55/0.65, and the tree arms run on the strongest model —
  # which is the comparison that decides the criterion).
  echo "=== r3p control arms SKIPPED (runs/r3p_dense2k lost in VM reset) ==="
fi

echo "=== queue3 done $(date +%H:%M:%S) ==="
