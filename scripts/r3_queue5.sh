#!/bin/bash
# Round-3 queue 5: retriage of queue4's tail to fit the remaining round
# clock (~5.5h at launch).  Dropped vs queue4: the r2_dense4 budget sweep
# (the flagship sweep already settled the budget-scaling question; queue3
# measured r2_dense4 at two settings) — everything else kept, plus a
# seed-20 control run isolating the gravity collapse from the
# open-loop-sigma head.
set -u
cd /root/repo

# 0. wait for the in-flight s14 anneal-cycle rescue (launched by queue4)
while kill -0 $(cat /tmp/rescue_s14.pid) 2>/dev/null; do sleep 30; done

# 1. bench smoke (driver-path insurance: bench.py changed this round)
echo "=== bench smoke $(date +%H:%M:%S) ==="
timeout 1800 python bench.py 2>&1 | tail -6

# 2. complete the linear-lever 5-seed table (s11 killed at epoch 239 by
#    the too-tight round-1 timeout during a tunnel stall)
COMMON="preset=stove_billiards num_epochs=360 steps_per_epoch=20 eval_every=60 ckpt_every=120 fused_epoch=false"
echo "=== rerun r3a_bil_s11 (linear to 1%) $(date +%H:%M:%S) ==="
timeout 3300 python -m stove_tpu.main $COMMON seed=11 \
  anneal_final=0.01 run_name=r3a2_bil_s11 2>&1 | tail -2

# 3. gravity selection protocol (pre-registered criterion #3/#4)
echo "=== gravity selection protocol $(date +%H:%M:%S) ==="
timeout 3600 python scripts/grav_select.py runs/r3g_grav_s21 \
  runs/r3g_grav_s22 runs/r3g_grav_s23 runs/r3g_grav_s24 \
  runs/r3g2_grav_s20 2>&1 | tail -20

# 4. error attribution on the flagship planner (per-branch reward error /
#    collision timing along search rollouts)
echo "=== branch diag r2a_dense2k $(date +%H:%M:%S) ==="
timeout 2700 python scripts/plan_branch_diag.py runs/r2a_dense2k 64 16 2>&1 | tail -15

# 5. lockstep-vs-serial at the real eval shape, warm (VERDICT r2 #4)
echo "=== lockstep warm bench $(date +%H:%M:%S) ==="
timeout 4800 python scripts/plan_lockstep_bench.py runs/r2a_dense2k 40 2>&1 | tail -6

# 6. seed-20 control: same seed WITHOUT the open-loop-sigma head.  Both
#    s20 runs (shared-trunk and detached-head) collapsed identically at the
#    first joint-phase eval while s21-24 are healthy under identical code —
#    if this control also collapses, the collapse is a seed-specific
#    recognition/tracking handoff failure, not the round-3 head.
GRAVC="preset=stove_gravity num_epochs=100 steps_per_epoch=20 window=16 \
overshoot_k=12 overshoot_sample=true eval_every=20 ckpt_every=100 \
eval_longhorizon=80 open_loop_sigma=false fused_epoch=false"
echo "=== s20 control (no open_loop_sigma, 100 ep) $(date +%H:%M:%S) ==="
timeout 2700 python -m stove_tpu.main $GRAVC seed=20 \
  run_name=r3g_ctrl_s20 2>&1 | tail -2

echo "=== summary $(date +%H:%M:%S) ==="
timeout 600 python scripts/r3_summary.py 2>&1 | tail -45
echo "=== queue5 done $(date +%H:%M:%S) ==="
