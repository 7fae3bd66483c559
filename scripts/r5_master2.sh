#!/bin/bash
# Round-5 second pipeline (after the first r5_master.sh pass):
#
#  P1  criterion 5, attempt #4: the OOM-hardened phase bench (RLIMIT_AS,
#      dense rows first, fused arms last with breadcrumbs).
#  P2  criterion 4 billiards: the restart protocol RE-RUN with the fixed
#      spec (steps_per_epoch=20 — the first run trained only ~720 of the
#      7200 schedule steps per attempt; quarantined as *_INVALID_stepbug).
#  P3  epochs lever, clean arm (S8): restore the committed r4a_dense_s2
#      (ep 399, mse@8 0.0138) with the anneal pinned ABSOLUTE at its
#      original 8000 steps and continue to 1200 epochs — tests "more raw
#      epochs at the converged lr", which the e1200 arm (stretched
#      schedule, failure basin) could not.
#  P4  criterion 6 accrual: anneal-cycle rescue of the e1200 failure-basin
#      run (the round-3 rescue recovered the same 0.042 plateau value).
#
# Same discipline as r5_master.sh: idempotent stages, artifacts+weights
# persisted atomically, commit subjects gated on content.
set -u
cd /root/repo
mkdir -p runs artifacts/r5 ckpts
LOG=/tmp/r5_master2.log
log() { echo "[r5b] $1 $(date +%H:%M:%S)" | tee -a "$LOG"; }

for i in $(seq 1 45); do
  python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1 && break
  log "waiting for TPU ($i)"; sleep 20
done

R5_DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 28800 ))}
ddl() { if [ "$(date +%s)" -gt "$R5_DEADLINE" ]; then
  log "DEADLINE passed — stopping before the next stage"; exit 0
fi; }
tmo() { r=$(( R5_DEADLINE - $(date +%s) )); [ "$r" -lt "$1" ] && echo "$r" || echo "$1"; }

GIT="git -c user.name=distsys-graft -c user.email=graft@localhost"

persist_run() {
  r=$(basename "$1")
  mkdir -p "ckpts/$r"
  cp -f "runs/$r/config.json" "runs/$r/metrics.jsonl" "ckpts/$r/" 2>/dev/null
  ck=$(ls "runs/$r"/ckpt_*.npz 2>/dev/null | tail -1)
  [ -n "$ck" ] && cp -f "$ck" "ckpts/$r/"
}

commit_gated() {
  ok_msg="$1"; bad_msg="$2"; shift 2
  $GIT add -A artifacts/r5 ckpts "$@" 2>/dev/null
  if git diff --cached --name-only | grep -q '\.npz$'; then
    $GIT commit -q -m "$ok_msg" || true
  else
    $GIT commit -q -m "$bad_msg" || true
  fi
}

# ---------- P1: OOM-hardened phase bench (criterion 5) ----------
ddl
if [ ! -f artifacts/r5/phase_bench_r5b.json ]; then
  log "P1: phase bench, attempt 4 (rlimit + reordered arms)"
  rm -f runs/phase_bench.json
  PB_S2D=1 timeout $(tmo 5400) python scripts/phase_bench.py \
    > /tmp/r5b_phasebench.log 2>&1
  cp -f runs/phase_bench.json artifacts/r5/phase_bench_r5b.json 2>/dev/null
  $GIT add artifacts/r5 && $GIT commit -q -m \
    "r5 artifacts: phase bench attempt 4 (contents: $(python -c "
import json;d=json.load(open('artifacts/r5/phase_bench_r5b.json'));print(','.join(k for k in d if k not in ('config','attempting'))[:300])" 2>/dev/null || echo unknown))" || true
  log "P1 done"
fi

# ---------- P2: billiards restart protocol, FIXED spec ----------
ddl
if [ ! -f artifacts/r5/restart_protocol_billiards.json ]; then
  log "P2: billiards restart protocol (fixed steps_per_epoch), slots 15-19"
  timeout $(tmo 14400) python scripts/restart_protocol.py billiards \
    15 16 17 18 19 > /tmp/r5b_rp_bil.log 2>&1
  cp -f runs/restart_protocol_billiards.json artifacts/r5/ 2>/dev/null
  FINALS=$(python - <<'PYEOF'
import json
try:
    d = json.load(open("runs/restart_protocol_billiards.json"))
    print(" ".join(f"runs/{v['final_run']}" for v in d.values()
                   if v.get("final_run")))
except Exception:
    pass
PYEOF
)
  for f in $FINALS; do persist_run "$f"; done
  if [ -n "$FINALS" ]; then
    log "P2: posthoc on final billiards runs"
    timeout $(tmo 3600) python scripts/posthoc_eval.py $FINALS \
      > artifacts/r5/restart_billiards_posthoc.txt 2>&1
  fi
  commit_gated \
    "r5 artifacts: billiards restart protocol (fixed spec) + posthoc + final-run weights" \
    "r5 artifacts: billiards restart protocol (fixed spec) + posthoc (no weights yet)"
  log "P2 done"
fi

# ---------- P3: epochs lever, clean continuation arm (S8) ----------
ddl
if ! ls ckpts/r5c_dense_s2_cont/ckpt_*.npz >/dev/null 2>&1; then
  log "P3: continue r4a_dense_s2 at converged lr to 1200 epochs"
  timeout $(tmo 7200) python -m stove_tpu.main restore=runs/r4a_dense_s2 \
    run_name=r5c_dense_s2_cont num_epochs=1200 debug_anneal_lr=8000 \
    eval_every=100 ckpt_every=800 > /tmp/r5b_cont.log 2>&1
  persist_run runs/r5c_dense_s2_cont
  commit_gated \
    "r5: epochs-lever continuation arm (converged-lr, 1200 ep) — weights + metrics" \
    "r5: epochs-lever continuation arm — metrics only, NO weights (incomplete)"
  log "P3 done"
fi

# ---------- P4: anneal-cycle rescue of the e1200 failure-basin run ----------
ddl
if ! ls runs/r5a_dense_s0_e1200_cyc120/metrics.jsonl >/dev/null 2>&1; then
  log "P4: anneal-cycle rescue on r5a_dense_s0_e1200"
  timeout $(tmo 3600) python scripts/anneal_cycle.py \
    runs/r5a_dense_s0_e1200 120 0.3 > /tmp/r5b_rescue.log 2>&1
  persist_run runs/r5a_dense_s0_e1200_cyc120
  commit_gated \
    "r5: anneal-cycle rescue trial on the e1200 failure-basin run — weights + metrics" \
    "r5: anneal-cycle rescue trial on the e1200 run — metrics only (incomplete)"
  log "P4 done"
fi

log "ALL P-STAGES DONE"
