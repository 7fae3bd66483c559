#!/bin/bash
# Round-3 queue 3: planning experiments (VERDICT r2 #1 and #7).
#  a) corpus-level balanced-BCE retrain of the dense-2k flagship (treatment;
#     the control is the existing r2a_dense2k checkpoint trained with
#     per-batch weights)
#  b) search-budget scaling sweep for the accuracy<->planning study, on the
#     most-accurate (r2a_dense2k / r3d_dense2k) and least-accurate-but-best-
#     planning (r2_dense4) models, 40 CRN episodes each (lockstep-batched)
set -u
cd /root/repo
DENSE="preset=avoidance_dense num_train=2000 num_epochs=400 \
steps_per_epoch=20 window=12 overshoot_k=8 eval_every=100 ckpt_every=200 \
fused_epoch=false"

echo "=== pallas rollout probe 2 $(date +%H:%M:%S) ==="
timeout 1800 python scripts/pallas_rollout_probe2.py 2>&1 | tail -20

echo "=== r3d_dense2k (corpus-BCE) $(date +%H:%M:%S) ==="
timeout 2700 python -m stove_tpu.main $DENSE seed=0 \
  run_name=r3d_dense2k 2>&1 | tail -2

echo "=== lockstep-vs-serial timing $(date +%H:%M:%S) ==="
timeout 3600 python scripts/plan_lockstep_bench.py runs/r2a_dense2k 8 2>&1 | tail -5

echo "=== budget sweep r2a_dense2k $(date +%H:%M:%S) ==="
timeout 5400 python scripts/plan_budget_sweep.py runs/r2a_dense2k 40 2>&1 | tail -30
echo "=== budget sweep r2_dense4 $(date +%H:%M:%S) ==="
timeout 5400 python scripts/plan_budget_sweep.py runs/r2_dense4 40 2>&1 | tail -30

# sampled-leaf values (anti-correlation hypothesis: annealed models' sharp
# transitions make MEAN-rollout leaves miss collision branches; S=8 sampled
# leaves integrate the noise — if the accurate model's gap closes under
# sampling while the noisy model's doesn't move, the hypothesis stands)
for RUN in runs/r2a_dense2k runs/r2_dense4 runs/r3d_dense2k; do
  echo "=== sampled leaves $RUN $(date +%H:%M:%S) ==="
  timeout 3600 python scripts/plan_eval.py $RUN mcts_eval_samples=8 \
    mcts_episodes=40 2>&1 | tail -6
done
echo "=== queue3 done $(date +%H:%M:%S) ==="
