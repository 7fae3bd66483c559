#!/bin/bash
# Round-4 queue 1: silicon validation of the sampled-path fixes, the
# probe-based SPN-pallas gate re-check, then THE round-4 experiment:
# train the missing model — avoidance_dense planners under the full
# billiards basin protocol (anneal to 1%, flagship K=8 overshoot +
# reward supervision).  Round 3 proved (a) the basin protocol reaches
# mse@8 0.007-0.009 and (b) the planning gap is position-error-limited
# at mse@8 0.012-0.014 — but never combined them (VERDICT r4 task 1).
set -u
cd /root/repo

echo "=== probe3: sampled-path fixes on silicon $(date +%H:%M:%S) ==="
timeout 1800 python scripts/pallas_rollout_probe3.py 2>&1 \
  | grep -v cpu_aot_loader | tail -20

echo "=== SPN pallas gate re-probe (VERDICT r4 task 6) $(date +%H:%M:%S) ==="
timeout 1200 python scripts/pallas_probe.py 2>&1 \
  | grep -v cpu_aot_loader | tail -12

# flagship recipe (r2a_dense2k: best mse@8 0.012, best root AUC family)
# with ONE change: anneal_final 0.1 -> 0.01 (the basin protocol).
COMMON="preset=avoidance_dense num_train=2000 window=12 steps_per_epoch=20 \
num_epochs=400 eval_every=100 ckpt_every=400 fused_epoch=false \
debug_anneal_lr=1.0 anneal_final=0.01 supair_only_epochs=3 \
encoder_space_to_depth=2 encoder_channels=32,64,128 \
overshoot_k=8 overshoot_weight=100.0 reward_overshoot_weight=1.0"

for SEED in 0 1 2; do
  echo "=== basin-protocol avoidance train seed $SEED $(date +%H:%M:%S) ==="
  timeout 5400 python -m stove_tpu.main $COMMON seed=$SEED \
    run_name=r4a_dense_s$SEED 2>&1 | tail -3
done

echo "=== posthoc eval (mse@8 + overshoot trigger) $(date +%H:%M:%S) ==="
timeout 2400 python scripts/posthoc_eval.py runs/r4a_dense_s0 \
  runs/r4a_dense_s1 runs/r4a_dense_s2 2>&1 | tail -20

echo "=== queue1 done $(date +%H:%M:%S) ==="
