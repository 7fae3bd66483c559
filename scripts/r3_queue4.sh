#!/bin/bash
# Round-3 queue 4 (triaged to fit the remaining round time; the dropped
# stages — K=8 probes on seeds 12/14, s11-cosine rerun, branch diags on the
# secondary models, r3d sampled leaves — are lower-value than everything
# kept here).
set -u
cd /root/repo
COMMON="preset=stove_billiards num_epochs=360 steps_per_epoch=20 eval_every=60 ckpt_every=120 fused_epoch=false"

# 1. gravity seed 20 ran before the detached-sigma-head fix (collapsed);
#    rerun with the corrected code so the 5-seed protocol is uniform
GRAV="preset=stove_gravity num_epochs=260 steps_per_epoch=20 window=16 \
overshoot_k=12 overshoot_sample=true eval_every=20 ckpt_every=20 \
ckpt_keep=99 eval_longhorizon=80 open_loop_sigma=true fused_epoch=false"
echo "=== rerun r3g_grav_s20 $(date +%H:%M:%S) ==="
timeout 2700 python -m stove_tpu.main $GRAV seed=20 \
  run_name=r3g2_grav_s20 2>&1 | tail -2

# 2. Rescue protocol (pre-registered fallback for criterion #2): second
#    anneal cycle (0.3x base -> 1%) on the two COMPLETED plateau runs.
#    Trigger = train overshoot > 0.010 at the end of the run; cost = +1/3.
echo "=== anneal cycle rescue r3a_bil_s12 $(date +%H:%M:%S) ==="
timeout 2700 python scripts/anneal_cycle.py runs/r3a_bil_s12 120 0.3 2>&1 | tail -2
echo "=== anneal cycle rescue r3c_bil_s14 $(date +%H:%M:%S) ==="
timeout 2700 python scripts/anneal_cycle.py runs/r3c_bil_s14 120 0.3 2>&1 | tail -2

# 3. bench smoke EARLY (driver-path insurance: bench.py changed this round)
echo "=== bench smoke $(date +%H:%M:%S) ==="
timeout 1800 python bench.py 2>&1 | tail -6

# 4. complete the linear-lever 5-seed table (s11 was killed at epoch 239 by
#    the too-tight round-1 timeout during a tunnel stall)
echo "=== rerun r3a_bil_s11 (linear to 1%) $(date +%H:%M:%S) ==="
timeout 3300 python -m stove_tpu.main $COMMON seed=11 \
  anneal_final=0.01 run_name=r3a2_bil_s11 2>&1 | tail -2

# 5. budget sweep on the least-accurate/best-default-planning model
#    (first attempt died on a transient TPU FailedPrecondition)
echo "=== budget sweep r2_dense4 $(date +%H:%M:%S) ==="
timeout 5400 python scripts/plan_budget_sweep.py runs/r2_dense4 40 2>&1 | tail -30

# 6. gravity selection protocol (needs the s20 rerun from stage 1)
echo "=== gravity selection protocol $(date +%H:%M:%S) ==="
timeout 3600 python scripts/grav_select.py runs/r3g_grav_s21 \
  runs/r3g_grav_s22 runs/r3g_grav_s23 runs/r3g_grav_s24 \
  runs/r3g2_grav_s20 2>&1 | tail -20

# 7. error attribution on the flagship planner (per-branch reward error /
#    collision timing along search rollouts)
echo "=== branch diag r2a_dense2k $(date +%H:%M:%S) ==="
timeout 2700 python scripts/plan_branch_diag.py runs/r2a_dense2k 64 16 2>&1 | tail -15

# 8. lockstep-vs-serial with fused rounds + compile warm-up: lockstep at
#    E=40 (the real eval shape), serial timed on episodes it can finish
#    within the budget (episodes are independent; serial cost is linear)
echo "=== lockstep warm bench $(date +%H:%M:%S) ==="
timeout 5400 python scripts/plan_lockstep_bench.py runs/r2a_dense2k 40 2>&1 | tail -6

echo "=== rescue eval summary $(date +%H:%M:%S) ==="
timeout 600 python scripts/r3_summary.py 2>&1 | tail -40
echo "=== queue4 done $(date +%H:%M:%S) ==="
