#!/bin/bash
# Round-4 queue 4: close the resistant-seed loop (VERDICT r4 task 5) +
# widen the rescue-protocol evidence (task 8).
#  1. pre-registered early-restart protocol on 5 FRESH seeds per task
#     (scripts/restart_protocol.py documents triggers + thresholds).
#  2. anneal-cycle rescue applied to the two round-2 plateau billiards
#     runs already on disk (r2a/r2f seeds out of basin) -> rescue table
#     n=2 -> n>=4.
set -u
cd /root/repo
if [ -f /tmp/r4_queue2.pid ]; then
  while kill -0 $(cat /tmp/r4_queue2.pid) 2>/dev/null; do sleep 60; done
fi

# round ends ~17:30 UTC 2026-08-18; stop starting stages after 16:55 so
# the driver's round-end bench gets the TPU to itself
DEADLINE="${R4_DEADLINE:-1787072100}"
ddl() { if [ "$(date +%s)" -gt "$DEADLINE" ]; then
  echo "=== DEADLINE passed — skipping remaining queue4 stages ==="; exit 0
fi; }
tmo() { r=$((DEADLINE - $(date +%s))); [ "$r" -lt "$1" ] && echo "$r" || echo "$1"; }
ddl

# EXPLORATORY ADDENDUM (post-registration, labeled as such in RESULTS):
# queue-1's mse@8 was still falling at ep 399 (0.0237/0.0186/0.0148/
# 0.0132 at eps 99/199/299/399) and the lr-cycle rescue was flat — the
# untested lever on the criterion-1 premise is raw epochs.  One 1200-ep
# arm (~3x budget, ~30 min at measured speed) answers whether the 0.013
# floor is an asymptote or an under-trained artifact.
echo "=== exploratory: 1200-epoch avoidance arm $(date +%H:%M:%S) ==="
timeout $(tmo 7200) python -m stove_tpu.main preset=avoidance_dense \
  num_train=2000 window=12 steps_per_epoch=20 num_epochs=1200 \
  eval_every=100 ckpt_every=1200 fused_epoch=false debug_anneal_lr=1.0 \
  anneal_final=0.01 supair_only_epochs=3 encoder_space_to_depth=2 \
  encoder_channels=32,64,128 overshoot_k=8 overshoot_weight=100.0 \
  reward_overshoot_weight=1.0 seed=0 run_name=r4a_dense_s0_e1200 \
  2>&1 | tail -3

ddl
# if the 3x-budget arm broke the 0.013 floor, measure whether the
# planning gap follows (the criterion-1 question) before anything else
E1200_MSE=$(python - <<'PYEOF'
import json
mse = None
try:
    for line in open("runs/r4a_dense_s0_e1200/metrics.jsonl"):
        r = json.loads(line)
        if r.get("kind") == "eval" and "mse_final" in r:
            mse = r["mse_final"]
except FileNotFoundError:
    pass
print(mse if mse is not None else 999)
PYEOF
)
echo "=== e1200 final mse@8: $E1200_MSE ==="
if python -c "import sys; sys.exit(0 if float('$E1200_MSE') < 0.011 else 1)"; then
  echo "=== floor broken — fine-lambda sweep on e1200 $(date +%H:%M:%S) ==="
  PS_TAG=_fine80 PS_BUDGETS=864 PS_LAMBDAS=1.0,0.55 timeout $(tmo 7200) \
    python scripts/plan_shrink_sweep.py runs/r4a_dense_s0_e1200 80 \
    2>&1 | grep -v cpu_aot_loader | tail -8
fi

ddl
echo "=== restart protocol: gravity seeds 30-34 $(date +%H:%M:%S) ==="
timeout $(tmo 21600) python scripts/restart_protocol.py gravity 30 31 32 33 34 \
  2>&1 | tail -30

ddl
echo "=== restart protocol: billiards seeds 15-19 $(date +%H:%M:%S) ==="
timeout $(tmo 28800) python scripts/restart_protocol.py billiards 15 16 17 18 19 \
  2>&1 | tail -30

ddl
# the three round-2 plateau runs on disk (final mse@8: r2a_s2 0.0431,
# r2a_s4 0.0555, r2f_s1 0.0413) -> rescue trials n=2 -> n=5
# (lost in the 2026-08-18 VM reset; the [ -d ] guard skips them)
echo "=== rescue evidence: round-2 plateau seeds $(date +%H:%M:%S) ==="
for r in r2a_bil_seed2 r2a_bil_seed4 r2f_bil_seed1; do
  if [ -d runs/$r ]; then
    timeout $(tmo 2700) python scripts/anneal_cycle.py runs/$r 120 0.3 2>&1 | tail -2
  fi
done

echo "=== posthoc: protocol + rescue outcomes $(date +%H:%M:%S) ==="
timeout $(tmo 3600) python scripts/posthoc_eval.py \
  $(ls -d runs/r4rp_bill_s* runs/*_cyc120 2>/dev/null) 2>&1 | tail -30

echo "=== queue4 done $(date +%H:%M:%S) ==="
