#!/bin/bash
# Round-3 queue 4: re-run billiards seeds killed by the too-tight round-1
# timeout (tunnel stalls of ~15 min hit 2 of 5 linear seeds), with headroom.
# Then per-depth reward-AUC evals and branch diagnostics for the planning
# error-attribution table.
set -u
cd /root/repo
COMMON="preset=stove_billiards num_epochs=360 steps_per_epoch=20 eval_every=60 ckpt_every=120 fused_epoch=false"

# gravity seed 20 ran before the detached-sigma-head fix (collapsed);
# rerun with the corrected code so the 5-seed protocol is uniform
GRAV="preset=stove_gravity num_epochs=260 steps_per_epoch=20 window=16 \
overshoot_k=12 overshoot_sample=true eval_every=20 ckpt_every=20 \
ckpt_keep=99 eval_longhorizon=80 open_loop_sigma=true fused_epoch=false"
echo "=== rerun r3g_grav_s20 $(date +%H:%M:%S) ==="
timeout 2700 python -m stove_tpu.main $GRAV seed=20 \
  run_name=r3g2_grav_s20 2>&1 | tail -2

for s in 11 14; do
  echo "=== rerun r3a_bil_s$s (linear to 1%) $(date +%H:%M:%S) ==="
  timeout 2700 python -m stove_tpu.main $COMMON seed=$s \
    anneal_final=0.01 run_name=r3a2_bil_s$s 2>&1 | tail -2
done

# cosine casualties (filled in as queue1 finishes; harmless if complete —
# the rerun writes a fresh r3c2_* dir either way)
for s in 11; do
  echo "=== rerun r3c_bil_s$s (cosine to 1%) $(date +%H:%M:%S) ==="
  timeout 2700 python -m stove_tpu.main $COMMON seed=$s \
    anneal_shape=cosine anneal_final=0.01 run_name=r3c2_bil_s$s 2>&1 | tail -2
done

# Basin-lever probe on the HARD seeds: seeds 12/14 plateau under both
# anneal shapes with overshoot stuck at ~0.015 (3x the basin value) — try
# deeper open-loop pressure (K=8 over a 12-frame window, same budget).
for s in 12 14; do
  echo "=== r3k8_bil_s$s (K=8 w=12, linear 1%) $(date +%H:%M:%S) ==="
  timeout 2700 python -m stove_tpu.main $COMMON seed=$s window=12 \
    overshoot_k=8 anneal_final=0.01 run_name=r3k8_bil_s$s 2>&1 | tail -2
done

# Rescue protocol probe: second anneal cycle (0.3x base -> 1%) on the two
# COMPLETED plateau runs.  If both drop into the basin, the pre-registered
# fallback protocol is validated: trigger = train overshoot > 0.010 at the
# end of the run; cost = +1/3 of a run.
echo "=== anneal cycle rescue r3a_bil_s12 $(date +%H:%M:%S) ==="
timeout 2700 python scripts/anneal_cycle.py runs/r3a_bil_s12 120 0.3 2>&1 | tail -2
echo "=== anneal cycle rescue r3c_bil_s14 $(date +%H:%M:%S) ==="
timeout 2700 python scripts/anneal_cycle.py runs/r3c_bil_s14 120 0.3 2>&1 | tail -2

echo "=== branch diag r2a_dense2k $(date +%H:%M:%S) ==="
timeout 2700 python scripts/plan_branch_diag.py runs/r2a_dense2k 64 16 2>&1 | tail -15
echo "=== branch diag r2_dense4 $(date +%H:%M:%S) ==="
timeout 2700 python scripts/plan_branch_diag.py runs/r2_dense4 64 16 2>&1 | tail -15
echo "=== branch diag r3d_dense2k $(date +%H:%M:%S) ==="
timeout 2700 python scripts/plan_branch_diag.py runs/r3d_dense2k 64 16 2>&1 | tail -15
echo "=== queue4 done $(date +%H:%M:%S) ==="

echo "=== gravity selection protocol $(date +%H:%M:%S) ==="
timeout 3600 python scripts/grav_select.py runs/r3g_grav_s21 \
  runs/r3g_grav_s22 runs/r3g_grav_s23 runs/r3g_grav_s24 \
  runs/r3g2_grav_s20 2>&1 | tail -20

echo "=== bench smoke (driver-path insurance) $(date +%H:%M:%S) ==="
timeout 1800 python bench.py 2>&1 | tail -8
echo "=== queue4 really done $(date +%H:%M:%S) ==="
