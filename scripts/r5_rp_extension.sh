#!/bin/bash
# Restart-protocol extension slots 20-24 (pre-registered in RESULTS.md).
set -u
cd /root/repo
timeout 18000 python scripts/restart_protocol.py billiards 20 21 22 23 24
cp -f runs/restart_protocol_billiards.json artifacts/r5/restart_protocol_billiards_ext.json
FINALS=$(python - <<'PYEOF'
import json
d = json.load(open("runs/restart_protocol_billiards.json"))
print(" ".join(f"{v['final_run']}" for k, v in d.items()
               if int(k) >= 20 and v.get("final_run")))
PYEOF
)
for f in $FINALS; do
  if ls "runs/$f"/ckpt_*.npz >/dev/null 2>&1; then
    mkdir -p "ckpts/$f"
    cp "runs/$f"/ckpt_*.npz "runs/$f"/config.json "runs/$f"/metrics.jsonl "ckpts/$f/" 2>/dev/null
    git add "ckpts/$f"
  fi
done
git add artifacts/r5/restart_protocol_billiards_ext.json
git commit -q -m "r5 artifacts: restart-protocol extension slots 20-24 — table + final-run weights

No-Verification-Needed: experiment artifacts only" || true
if [ -n "$FINALS" ]; then
  timeout 3600 python scripts/posthoc_eval.py $(for f in $FINALS; do echo -n "runs/$f "; done) \
    > artifacts/r5/restart_ext_posthoc.txt 2>&1
  git add artifacts/r5/restart_ext_posthoc.txt
  git commit -q -m "r5 artifacts: restart-protocol extension posthoc

No-Verification-Needed: experiment artifacts only" || true
fi
echo "EXTENSION DONE $(date -u +%H:%M:%S)"
