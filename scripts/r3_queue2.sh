#!/bin/bash
# Round-3 queue 2: gravity with the open-loop process-noise std (VERDICT r2
# #3) x 5 seeds with the pre-registered stability-selection protocol
# (VERDICT r2 #5).  Settings mirror r2a_grav_* (w16/K12 sampled overshoot,
# 260 epochs, annealed) plus:
#   open_loop_sigma=true   — second std head for sampled rollouts
#   eval_every=20 ckpt_every=20 eval_longhorizon=80
#     — pre-registered rule: select the checkpoint whose VALIDATION-half
#       speed_ratio is closest to 1.0; report the TEST-half ratio.
set -u
cd /root/repo
COMMON="preset=stove_gravity num_epochs=260 steps_per_epoch=20 window=16 \
overshoot_k=12 overshoot_sample=true eval_every=20 ckpt_every=20 \
ckpt_keep=99 eval_longhorizon=80 open_loop_sigma=true fused_epoch=false"

echo "=== pallas rollout probe $(date +%H:%M:%S) ==="
timeout 1200 python scripts/pallas_rollout_probe.py 2>&1 | tail -25

for s in 20 21 22 23 24; do
  echo "=== r3g_grav_s$s (open-loop sigma) $(date +%H:%M:%S) ==="
  timeout 2700 python -m stove_tpu.main $COMMON seed=$s \
    run_name=r3g_grav_s$s 2>&1 | tail -2
done
echo "=== queue2 done $(date +%H:%M:%S) ==="
