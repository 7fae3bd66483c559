#!/bin/bash
# Round-5 trigger-precision probe (post-P2 follow-up, registered before
# its outcome data):
#
# The fixed-spec billiards restart protocol met its 5/5 yield bar but
# blew the <=1.4x compute bar (5x360 + 4x240 tripped epochs = 1.53x).
# Whether that overage is the trigger's fault (false positives) or the
# seed pool's fault (a genuinely ~4/9 plateau rate this draw) is
# decidable cheaply: every tripped attempt checkpointed at its abort
# point (ep 239 / step 4800), so continuing each to the full 360-epoch
# schedule and reading final mse@8 measures trigger precision directly.
#   - final mse@8 <= 0.015  -> false positive (the seed would have made
#     the basin; the trigger overspent a restart)
#   - final mse@8  > 0.015  -> true positive (abandoning it was correct)
# Prediction from round 3 (plateau seeds s12/s14 ended at 0.042-0.045
# after showing the same >=0.0147 overshoot-at-240 signature): true
# positives.
#
# Any continuation that DOES plateau >0.015 then accrues an anneal-cycle
# rescue trial (criterion-6 accrual, per the round-4 amendment).
set -u
cd /root/repo
LOG=/tmp/r5_trigger_probe.log
log() { echo "[probe] $1 $(date +%H:%M:%S)" | tee -a "$LOG"; }
GIT="git -c user.name=distsys-graft -c user.email=graft@localhost"

for i in $(seq 1 30); do
  python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1 && break
  log "waiting for TPU ($i)"; sleep 20
done

RUNS="r4rp_bill_s17 r4rp_bill_s27 r4rp_bill_s18 r4rp_bill_s19"

for r in $RUNS; do
  # idempotent: skip if already continued past stage 1
  last=$(python - "$r" <<'PYEOF'
import json, sys
rows = [json.loads(l) for l in open(f"runs/{sys.argv[1]}/metrics.jsonl")]
print(max(x.get("epoch", -1) for x in rows))
PYEOF
)
  if [ "$last" -ge 359 ]; then log "$r already at ep $last, skip"; continue; fi
  log "continue $r to 360 ep (trigger-precision probe)"
  timeout 2700 python -m stove_tpu.main restore=runs/$r num_epochs=360 \
    >> /tmp/r5_probe_train.log 2>&1
done

log "posthoc on continued runs"
timeout 1800 python scripts/posthoc_eval.py \
  runs/r4rp_bill_s17 runs/r4rp_bill_s27 runs/r4rp_bill_s18 runs/r4rp_bill_s19 \
  > artifacts/r5/trigger_precision_posthoc.txt 2>&1

python - <<'PYEOF'
import json
out = {"probe": "continue tripped stage-1 billiards attempts to full schedule",
       "trigger": "mean train overshoot ep230-239 > 0.010",
       "success_bar_mse8": 0.015, "runs": {}}
for r in ["r4rp_bill_s17", "r4rp_bill_s27", "r4rp_bill_s18", "r4rp_bill_s19"]:
    rows = [json.loads(l) for l in open(f"runs/{r}/metrics.jsonl")]
    ev = [x for x in rows if x.get("kind") == "eval"]
    tr = [x for x in rows if x.get("kind") == "train"
          and 230 <= x.get("epoch", -1) < 240]
    fin = ev[-1]
    out["runs"][r] = {
        "trigger_value": sum(t["overshoot"] for t in tr) / max(len(tr), 1),
        "final_epoch": fin["epoch"], "final_mse8": fin["mse_final"],
        "final_mse4": fin["mse_per_step"][3],
        "true_positive": fin["mse_final"] > 0.015,
    }
json.dump(out, open("artifacts/r5/trigger_precision_probe.json", "w"),
          indent=1)
print(json.dumps(out["runs"], indent=1))
PYEOF

# persist the continued weights for any run the probe's verdict cites
for r in $RUNS; do
  mkdir -p ckpts/$r
  cp -f runs/$r/config.json runs/$r/metrics.jsonl ckpts/$r/ 2>/dev/null
  ck=$(ls runs/$r/ckpt_*.npz 2>/dev/null | tail -1)
  [ -n "$ck" ] && cp -f "$ck" ckpts/$r/
done

$GIT add -A artifacts/r5 ckpts
if git diff --cached --name-only | grep -q trigger_precision_probe.json; then
  $GIT commit -q -m "r5 artifacts: trigger-precision probe (tripped billiards attempts continued to full schedule) + weights" || true
else
  $GIT commit -q -m "r5: trigger-precision probe attempt (no probe artifact produced)" || true
fi
log "PROBE DONE"
