#!/bin/bash
# Round-3 queue 10: CORRECTED deep-supervision retrain.  Queue8's K=12 at
# window=12 silently disabled all overshoot losses (now a hard error);
# that run is kept as a no-overshoot ablation.  This retrains at K=8
# (4 valid start indices, flagship depth) with SAMPLED overshoot + 5x
# open-loop reward supervision + the sigma head, then re-measures
# per-depth AUC and the CRN-paired gap at the two informative lambdas.
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue9.pid) 2>/dev/null; do sleep 60; done

COMMON="preset=avoidance_dense num_train=2000 window=12 steps_per_epoch=20 \
num_epochs=400 eval_every=100 ckpt_every=400 fused_epoch=false \
debug_anneal_lr=1.0 supair_only_epochs=3 encoder_space_to_depth=2 \
encoder_channels=32,64,128"

echo "=== corrected retrain: K=8 SAMPLED overshoot, 5x reward-overshoot $(date +%H:%M:%S) ==="
timeout 3600 python -m stove_tpu.main $COMMON seed=0 \
  overshoot_k=8 overshoot_sample=true reward_overshoot_weight=5.0 \
  open_loop_sigma=true run_name=r3q_dense2k 2>&1 | tail -3

echo "=== branch diag r3q_dense2k $(date +%H:%M:%S) ==="
timeout 1800 python scripts/plan_branch_diag.py runs/r3q_dense2k 64 16 \
  2>&1 | grep -v cpu_aot_loader | tail -15

echo "=== shrink sweep r3q_dense2k $(date +%H:%M:%S) ==="
PS_LAMBDAS=1.0,0.85 timeout 4500 \
  python scripts/plan_shrink_sweep.py runs/r3q_dense2k 40 \
  2>&1 | grep -v cpu_aot_loader | tail -12

echo "=== queue10 done $(date +%H:%M:%S) ==="
