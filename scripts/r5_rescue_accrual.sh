#!/bin/bash
# Rescue-trial accrual on the trigger-precision probe's three plateau models
# (pre-registered in RESULTS.md).  Sequential: ONE TPU process at a time.
set -u
cd /root/repo
for run in r4rp_bill_s27 r4rp_bill_s18 r4rp_bill_s19; do
  echo "=== rescue $run $(date -u +%H:%M:%S) ==="
  timeout 2400 python scripts/anneal_cycle.py "runs/$run" 120 0.3 || {
    echo "RESCUE $run FAILED/TIMED OUT"; continue; }
  cyc="runs/${run}_cyc120"
  if ls "$cyc"/ckpt_*.npz >/dev/null 2>&1; then
    mkdir -p "ckpts/${run}_cyc120"
    cp "$cyc"/ckpt_*.npz "ckpts/${run}_cyc120/"
    cp "$cyc"/config.json "$cyc"/metrics.jsonl "ckpts/${run}_cyc120/" 2>/dev/null
    git add "ckpts/${run}_cyc120"
    git commit -q -m "r5 artifacts: rescue trial on ${run} (cyc120@0.3x) — weights + metrics

No-Verification-Needed: experiment artifacts only" || true
  else
    echo "NO CKPT for $cyc — not committing"
  fi
done
echo "=== posthoc $(date -u +%H:%M:%S) ==="
for run in r4rp_bill_s27_cyc120 r4rp_bill_s18_cyc120 r4rp_bill_s19_cyc120; do
  [ -d "runs/$run" ] && timeout 1200 python scripts/posthoc_eval.py "runs/$run" 2>&1 | tail -2
done
echo "=== done $(date -u +%H:%M:%S) ==="
