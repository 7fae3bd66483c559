#!/bin/bash
# Gravity restart-protocol extension slots 35-39 (pre-registered in
# RESULTS.md "gravity restart-protocol extension").  Mirrors
# r5_rp_extension.sh (billiards slots 20-24) plus the grav_select stage
# from r5_master.sh S4.  Self-committing, idempotent.
set -u
cd /root/repo
LOG=/tmp/r5_grav_ext.log
log() { echo "[gravext] $1 $(date -u +%H:%M:%S)" | tee -a "$LOG"; }
GIT="git -c user.name=distsys-graft -c user.email=graft@localhost"

# ONE TPU process at a time: wait for the salvage pipeline to exit.
if [ -f /tmp/r5_exhaust.pid ]; then
  while kill -0 "$(cat /tmp/r5_exhaust.pid)" 2>/dev/null; do
    log "waiting for salvage pipeline (pid $(cat /tmp/r5_exhaust.pid))"
    sleep 60
  done
fi
for i in $(seq 1 30); do
  python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1 && break
  log "waiting for TPU ($i)"; sleep 20
done

log "protocol slots 35-39"
timeout 18000 python scripts/restart_protocol.py gravity 35 36 37 38 39 \
  >> "$LOG" 2>&1
cp -f runs/restart_protocol_gravity.json \
  artifacts/r5/restart_protocol_gravity_ext.json

FINALS=$(python - <<'PYEOF'
import json
d = json.load(open("runs/restart_protocol_gravity.json"))
print(" ".join(f"{v['final_run']}" for k, v in d.items()
               if int(k) >= 35 and v.get("final_run")))
PYEOF
)
for f in $FINALS; do
  if ls "runs/$f"/ckpt_*.npz >/dev/null 2>&1; then
    mkdir -p "ckpts/$f"
    cp "runs/$f"/ckpt_*.npz "runs/$f"/config.json "runs/$f"/metrics.jsonl \
      "ckpts/$f/" 2>/dev/null
    $GIT add "ckpts/$f"
  else
    log "NO CKPT for runs/$f — not persisting"
  fi
done
$GIT add artifacts/r5/restart_protocol_gravity_ext.json
$GIT commit -q -m "r5 artifacts: gravity restart-protocol extension slots 35-39 — table + final-run weights

No-Verification-Needed: experiment artifacts only" || true

if [ -n "$FINALS" ]; then
  log "grav_select on: $FINALS"
  GS_TAG=_r5ext timeout 7200 python scripts/grav_select.py \
    $(for f in $FINALS; do echo -n "runs/$f "; done) \
    > /tmp/r5_gravsel_ext.log 2>&1
  cp -f runs/grav_select_r5ext.json artifacts/r5/ 2>/dev/null
  # persist the SELECTED checkpoint of each final run
  python - <<'PYEOF'
import json, os, shutil
try:
    sel = json.load(open("runs/grav_select_r5ext.json"))
except Exception:
    raise SystemExit
for run, v in sel.items():
    name = os.path.basename(run.rstrip("/"))
    src = f"{run}/ckpt_{v['step']:08d}.npz"
    if os.path.exists(src):
        os.makedirs(f"ckpts/{name}", exist_ok=True)
        shutil.copy(src, f"ckpts/{name}/")
PYEOF
  $GIT add ckpts/ artifacts/r5/grav_select_r5ext.json 2>/dev/null
  $GIT commit -q -m "r5 artifacts: gravity extension selection (grav_select) + selected-step weights

No-Verification-Needed: experiment artifacts only" || true
fi
log "GRAV EXTENSION DONE"
