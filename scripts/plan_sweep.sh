#!/bin/bash
# Planner-parameter sweep on CPU (VERDICT #1: close the oracle gap).
# Each setting evaluates model vs oracle vs random under the SAME planner
# params with common random numbers (fair relative comparison).
cd /root/repo
CKPT=${1:-runs/r2_dense4}

echo "=== SWEEP c_uct=2.0 ==="
timeout 7000 python scripts/plan_eval.py $CKPT mcts_c_uct=2.0 2>&1 | tail -4
echo "=== SWEEP horizon=6 ==="
timeout 7000 python scripts/plan_eval.py $CKPT mcts_horizon=6 2>&1 | tail -4
echo "=== SWEEP frontier=1 (serial UCT, deeper tree) ==="
timeout 7000 python scripts/plan_eval.py $CKPT mcts_frontier=1 2>&1 | tail -4
echo "=== PLAN SWEEP DONE ==="
