#!/bin/bash
# Round-4 resume #3 (2026-08-19, after the THIRD VM reset wiped runs/ +
# data/ again).  This session is short (~1 h), so the pipeline is the
# minimal high-value remainder, ordered by judged value:
#
#  stage 0: regenerate the avoidance corpus with seed-0 keys (same rule
#           as r4_resume2.sh — the corpus identity is keyed off seed 0).
#  stage 1: retrain planner seed 2 + cyc120 rescue (deterministic given
#           the corpus; posthoc must reproduce the committed mse@8
#           0.0138/0.0139).  Persist the npz THIS time — the previous
#           "ckpt persisted" commit silently lost the weights to the
#           .gitignore *.npz blanket (now fixed with !ckpts/**/*.npz).
#  stage 2: lambda 0.60/0.55 80-episode CI arms on the rescued model
#           (VERDICT weak #2: CI conclusion stable across lambda) —
#           also re-anchors the committed fine-lambda table to a raw
#           artifact.
#  stage 3: gravity corpus + multi-horizon-sigma retrains (criterion 3),
#           as many seeds as fit.
set -u
cd /root/repo
mkdir -p runs artifacts/r4 ckpts
log() { echo "[resume3] $1 $(date +%H:%M:%S)" >> /tmp/r4_resume3.log; }

# TPU-readiness wait + deadline guard (advisor r4 low: resume2 had these,
# resume3 didn't — a failed stage 0 after a reset silently cascaded).
for i in $(seq 1 30); do
  python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1 && break
  log "waiting for TPU ($i)"; sleep 20
done
R4_DEADLINE=${R4_DEADLINE:-$(( $(date +%s) + 6*3600 ))}
ddl() {  # remaining seconds, floored at 60 so timeouts stay valid
  r=$(( R4_DEADLINE - $(date +%s) )); [ "$r" -lt 60 ] && r=60; echo "$r"
}

persist() {
  msg="$1"; shift
  cp -f runs/*.json artifacts/r4/ 2>/dev/null
  git add -A artifacts/r4 ckpts "$@" 2>/dev/null
  git -c user.name=distsys-graft -c user.email=graft@localhost \
    commit -q -m "$msg" 2>/dev/null || true
  log "persisted: $msg"
}

log "stage0: avoidance corpus (seed-0 keys)"
timeout 1500 python -m stove_tpu.main mode=generate \
  preset=avoidance_dense num_train=2000 seed=0 > /tmp/r4s3_stage0.log 2>&1
log "stage0 done"

log "stage1: planner retrain + rescue"
{
  COMMON="preset=avoidance_dense num_train=2000 window=12 steps_per_epoch=20 \
num_epochs=400 eval_every=100 ckpt_every=400 fused_epoch=false \
debug_anneal_lr=1.0 anneal_final=0.01 supair_only_epochs=3 \
encoder_space_to_depth=2 encoder_channels=32,64,128 \
overshoot_k=8 overshoot_weight=100.0 reward_overshoot_weight=1.0"
  echo "=== retrain r4a_dense_s2 $(date +%H:%M:%S) ==="
  timeout 2400 python -m stove_tpu.main $COMMON seed=2 \
    run_name=r4a_dense_s2 2>&1 | tail -3
  echo "=== rescue (anneal cycle 120 @ 0.3x) $(date +%H:%M:%S) ==="
  timeout 1500 python scripts/anneal_cycle.py runs/r4a_dense_s2 120 0.3 \
    2>&1 | tail -3
  echo "=== posthoc (determinism check vs committed 0.0138/0.0139) ==="
  timeout 900 python scripts/posthoc_eval.py runs/r4a_dense_s2 \
    runs/r4a_dense_s2_cyc120 2>&1 | tail -20
  for d in r4a_dense_s2 r4a_dense_s2_cyc120; do
    mkdir -p ckpts/$d
    cp -f runs/$d/config.json runs/$d/metrics.jsonl ckpts/$d/ 2>/dev/null
    ck=$(ls runs/$d/ckpt_*.npz 2>/dev/null | tail -1)
    [ -n "$ck" ] && cp -f "$ck" ckpts/$d/
  done
} > /tmp/r4s3_stage1.log 2>&1
# Gate the commit claim on the weights actually existing (advisor r4 low:
# an unconditional persist recreates the ee89485 claim-without-weights bug).
if ls ckpts/r4a_dense_s2/ckpt_*.npz >/dev/null 2>&1; then
  persist "r4: planner retrain #3 — weights actually in git this time (.gitignore fix)"
  git ls-files ckpts | grep -q npz || log "FAILURE: npz copied but not tracked in git"
else
  persist "r4: planner retrain #3 — config/metrics only, NO weights (retrain incomplete)"
  log "FAILURE: stage1 produced no ckpt npz in ckpts/"
fi
log "stage1 done"

# Gate on the artifact the sweep actually needs: a checkpoint, not just
# metrics.jsonl (advisor r4 low: a timeout mid-train leaves metrics with
# no npz and plan_shrink_sweep crashes instead of falling back).
MODEL=runs/r4a_dense_s2_cyc120
ls "$MODEL"/ckpt_*.npz >/dev/null 2>&1 || MODEL=runs/r4a_dense_s2

log "stage2: lambda 0.60/0.55 CI arms on $MODEL"
PS_TAG=_l60_80 PS_BUDGETS=864 PS_LAMBDAS=0.6,0.55 timeout 2400 \
  python scripts/plan_shrink_sweep.py "$MODEL" 80 > /tmp/r4s3_stage2.log 2>&1
persist "r4 artifacts: lambda 0.60/0.55 CI arms (VERDICT weak #2)"
log "stage2 done"

log "stage3: gravity corpus + sigma retrains"
{
  timeout 1200 python -m stove_tpu.main mode=generate preset=stove_gravity \
    seed=0
  COMMON="preset=stove_gravity num_epochs=260 steps_per_epoch=20 window=16 \
overshoot_k=12 overshoot_sample=true eval_every=20 ckpt_every=20 \
ckpt_keep=99 eval_longhorizon=80 open_loop_sigma=true fused_epoch=false"
  for s in 21 22 23 24; do
    echo "=== r4g_grav_s$s $(date +%H:%M:%S) ==="
    timeout $(ddl) python -m stove_tpu.main $COMMON seed=$s \
      run_name=r4g_grav_s$s 2>&1 | tail -2
    mkdir -p ckpts/r4g_grav_s$s
    cp -f runs/r4g_grav_s$s/config.json runs/r4g_grav_s$s/metrics.jsonl \
      ckpts/r4g_grav_s$s/ 2>/dev/null
    # persist the weights too (advisor r4 MEDIUM: config+metrics-only
    # persistence makes the criterion-3 gravity models unrecoverable after
    # a reset — grav_select.py needs the ckpt_*.npz files)
    ck=$(ls runs/r4g_grav_s$s/ckpt_*.npz 2>/dev/null | tail -1)
    [ -n "$ck" ] && cp -f "$ck" ckpts/r4g_grav_s$s/
    git add ckpts 2>/dev/null
    git -c user.name=distsys-graft -c user.email=graft@localhost \
      commit -q -m "r4: gravity sigma retrain s$s (criterion 3)" 2>/dev/null
  done
  echo "=== gravity selection $(date +%H:%M:%S) ==="
  GS_TAG=_r4 timeout 3600 python scripts/grav_select.py \
    runs/r4g_grav_s21 runs/r4g_grav_s22 runs/r4g_grav_s23 runs/r4g_grav_s24 \
    2>&1 | tail -40
} > /tmp/r4s3_stage3.log 2>&1
persist "r4 artifacts: gravity multi-horizon sigma retrains + selection"
log "stage3 done"
log "ALL DONE"
