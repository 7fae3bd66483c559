#!/bin/bash
# Round-3 queue 8: attack the named open-loop failure (reward AUC rotting
# 0.96->0.78 over rollout depth) from the TRAINING side: retrain the
# flagship avoidance planner with deeper SAMPLED overshoot (K=12, was
# K=8 mean) and 5x open-loop reward supervision weight, plus the detached
# process-noise head.  Then re-measure per-depth AUC (branch diag) and the
# CRN-paired planning gap with the depth-shrink sweep.  Runs after queue7.
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue7.pid) 2>/dev/null; do sleep 60; done

COMMON="preset=avoidance_dense num_train=2000 window=12 steps_per_epoch=20 \
num_epochs=400 eval_every=100 ckpt_every=400 fused_epoch=false \
debug_anneal_lr=1.0 supair_only_epochs=3 encoder_space_to_depth=2 \
encoder_channels=32,64,128"

echo "=== retrain flagship: K=12 sampled overshoot, 5x reward-overshoot $(date +%H:%M:%S) ==="
timeout 5400 python -m stove_tpu.main $COMMON seed=0 \
  overshoot_k=12 overshoot_sample=true reward_overshoot_weight=5.0 \
  open_loop_sigma=true run_name=r3p_dense2k 2>&1 | tail -3

echo "=== branch diag r3p_dense2k $(date +%H:%M:%S) ==="
timeout 2700 python scripts/plan_branch_diag.py runs/r3p_dense2k 64 16 \
  2>&1 | grep -v cpu_aot_loader | tail -15

echo "=== depth-shrink sweep r3p_dense2k $(date +%H:%M:%S) ==="
PS_LAMBDAS=1.0,0.85,0.7,0.55 timeout 7200 \
  python scripts/plan_shrink_sweep.py runs/r3p_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -20

echo "=== sampled-leaf arm (S=8, budget 216) r3p_dense2k $(date +%H:%M:%S) ==="
PS_TAG=_s8 PS_BUDGETS=216 PS_LAMBDAS=1.0,0.7 PS_SAMPLES=8 timeout 3600 \
  python scripts/plan_shrink_sweep.py runs/r3p_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -10

echo "=== queue8 done $(date +%H:%M:%S) ==="
