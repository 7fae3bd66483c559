#!/bin/bash
# Budget-exhaustion salvage experiment, slot 23 (pre-registered in
# RESULTS.md "budget-exhaustion salvage").  Two arms:
#   B: continue tripped attempts s23/s33/s43 to 360 ep, rescue any that
#      finish > 0.015 (canonical cyc120 @ 0.3x).
#   A: up to 2 further stage-1 restart attempts (seeds 53, 63); first
#      untripped attempt resumes to 360.
# Sequential: ONE TPU process at a time.  Self-committing, idempotent.
set -u
cd /root/repo
LOG=/tmp/r5_exhaust.log
log() { echo "[salvage] $1 $(date -u +%H:%M:%S)" | tee -a "$LOG"; }
GIT="git -c user.name=distsys-graft -c user.email=graft@localhost"

for i in $(seq 1 30); do
  python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1 && break
  log "waiting for TPU ($i)"; sleep 20
done

last_epoch() {
  python - "$1" <<'PYEOF'
import json, sys
try:
    rows = [json.loads(l) for l in open(f"runs/{sys.argv[1]}/metrics.jsonl")]
    print(max(x.get("epoch", -1) for x in rows))
except FileNotFoundError:
    print(-1)
PYEOF
}

final_mse8() {
  python - "$1" <<'PYEOF'
import json, sys
rows = [json.loads(l) for l in open(f"runs/{sys.argv[1]}/metrics.jsonl")]
ev = [x for x in rows if x.get("kind") == "eval"]
print(ev[-1]["mse_final"] if ev else "nan")
PYEOF
}

trigger_val() {  # mean train overshoot over ep 230-239 (protocol trigger)
  python - "$1" <<'PYEOF'
import json, sys
rows = [json.loads(l) for l in open(f"runs/{sys.argv[1]}/metrics.jsonl")]
ov = [r["overshoot"] for r in rows if r.get("kind") == "train"
      and 230 <= r.get("epoch", -1) < 240]
print(sum(ov) / max(len(ov), 1) if ov else "inf")
PYEOF
}

persist() {  # copy run weights+metrics into ckpts/ and git add
  local r="$1"
  if ls "runs/$r"/ckpt_*.npz >/dev/null 2>&1; then
    mkdir -p "ckpts/$r"
    cp -f "runs/$r"/ckpt_*.npz "ckpts/$r/"
    cp -f "runs/$r"/config.json "runs/$r"/metrics.jsonl "ckpts/$r/" 2>/dev/null
    $GIT add "ckpts/$r"
  else
    log "NO CKPT for runs/$r — not persisting"
  fi
}

# ---------- Arm B stage 1: continuations to 360 ----------
for r in r4rp_bill_s23 r4rp_bill_s33 r4rp_bill_s43; do
  if [ "$(last_epoch $r)" -ge 359 ]; then log "$r already continued, skip"; continue; fi
  log "arm B: continue $r -> 360 ep"
  timeout 2700 python -m stove_tpu.main restore=runs/$r num_epochs=360 \
    >> /tmp/r5_exhaust_train.log 2>&1 || log "continuation $r rc=$?"
done

# ---------- Arm B stage 2: rescue plateaued continuations ----------
for r in r4rp_bill_s23 r4rp_bill_s33 r4rp_bill_s43; do
  [ "$(last_epoch $r)" -ge 359 ] || { log "$r not at 360, skip rescue"; continue; }
  m8=$(final_mse8 $r)
  if python -c "import sys; sys.exit(0 if float('$m8') > 0.015 else 1)"; then
    if [ "$(last_epoch ${r}_cyc120)" -ge 0 ]; then log "${r}_cyc120 exists, skip"; continue; fi
    log "arm B: $r plateaued ($m8) -> canonical rescue cyc120@0.3x"
    timeout 2400 python scripts/anneal_cycle.py "runs/$r" 120 0.3 \
      >> /tmp/r5_exhaust_train.log 2>&1 || log "rescue $r rc=$?"
  else
    log "arm B: $r finished in basin ($m8) — trigger false positive, no rescue"
  fi
done

# ---------- Arm A: deeper restart budget (seeds 53, 63) ----------
ARM_A_FINAL=""
for seed in 53 63; do
  r="r4rp_bill_s$seed"
  if [ "$(last_epoch $r)" -lt 239 ]; then
    log "arm A: stage-1 attempt seed $seed"
    timeout 3600 python -m stove_tpu.main preset=stove_billiards \
      steps_per_epoch=20 debug_anneal_lr=7200 anneal_final=0.01 \
      eval_every=60 ckpt_every=240 fused_epoch=false \
      seed=$seed run_name=$r num_epochs=240 \
      >> /tmp/r5_exhaust_train.log 2>&1 || log "stage1 $r rc=$?"
  fi
  tv=$(trigger_val $r)
  log "arm A: $r trigger=$tv"
  if python -c "import sys; sys.exit(0 if float('$tv') <= 0.010 else 1)"; then
    log "arm A: $r untripped -> resume to 360"
    timeout 2700 python -m stove_tpu.main restore=runs/$r num_epochs=360 \
      >> /tmp/r5_exhaust_train.log 2>&1 || log "stage2 $r rc=$?"
    ARM_A_FINAL=$r
    break
  fi
  log "arm A: $r TRIPPED ($tv)"
done

# ---------- summary JSON + posthoc ----------
python - <<'PYEOF'
import json, os


def rows(r):
    p = f"runs/{r}/metrics.jsonl"
    if not os.path.exists(p):
        return []
    return [json.loads(l) for l in open(p)]


def final8(r):
    ev = [x for x in rows(r) if x.get("kind") == "eval"]
    return ev[-1]["mse_final"] if ev else None


def trig(r):
    ov = [x["overshoot"] for x in rows(r) if x.get("kind") == "train"
          and 230 <= x.get("epoch", -1) < 240]
    return sum(ov) / len(ov) if ov else None


out = {"experiment": "budget-exhaustion salvage, slot 23 (pre-registered)",
       "success_bar_mse8": 0.015, "arm_B": {}, "arm_A": {}}
for r in ["r4rp_bill_s23", "r4rp_bill_s33", "r4rp_bill_s43"]:
    e = {"continued_mse8": final8(r)}
    c = f"{r}_cyc120"
    if os.path.exists(f"runs/{c}/metrics.jsonl"):
        e["rescue_mse8"] = final8(c)
    out["arm_B"][r] = e
for r in ["r4rp_bill_s53", "r4rp_bill_s63"]:
    if os.path.exists(f"runs/{r}/metrics.jsonl"):
        out["arm_A"][r] = {"trigger_value": trig(r), "final_mse8": final8(r)}
os.makedirs("artifacts/r5", exist_ok=True)
json.dump(out, open("artifacts/r5/exhaust_salvage.json", "w"), indent=1)
print(json.dumps(out, indent=1))
PYEOF

POSTHOC_RUNS=""
for r in r4rp_bill_s23 r4rp_bill_s33 r4rp_bill_s43 \
         r4rp_bill_s23_cyc120 r4rp_bill_s33_cyc120 r4rp_bill_s43_cyc120 \
         r4rp_bill_s53 r4rp_bill_s63; do
  ls "runs/$r"/ckpt_*.npz >/dev/null 2>&1 && POSTHOC_RUNS="$POSTHOC_RUNS runs/$r"
done
log "posthoc on:$POSTHOC_RUNS"
timeout 3600 python scripts/posthoc_eval.py $POSTHOC_RUNS \
  > artifacts/r5/exhaust_salvage_posthoc.txt 2>&1

# ---------- persist + commit ----------
for r in r4rp_bill_s23 r4rp_bill_s33 r4rp_bill_s43 \
         r4rp_bill_s23_cyc120 r4rp_bill_s33_cyc120 r4rp_bill_s43_cyc120 \
         r4rp_bill_s53 r4rp_bill_s63; do
  [ -d "runs/$r" ] && persist "$r"
done
$GIT add artifacts/r5/exhaust_salvage.json artifacts/r5/exhaust_salvage_posthoc.txt
$GIT commit -q -m "r5 artifacts: budget-exhaustion salvage (slot 23) — arm A/B tables, posthoc, weights

No-Verification-Needed: experiment artifacts only" || true
log "SALVAGE DONE"
