#!/bin/bash
# Round-4 master pipeline: wait for the TPU tunnel, then run every queue
# in sequence (ONE TPU job at a time throughout).  Each stage logs to
# /tmp/r4_queueN.log; progress greppable via /tmp/r4_master.log.
set -u
cd /root/repo
mkdir -p runs   # wiped by VM resets; every stage writes artifacts here
log() { echo "[master] $1 $(date +%H:%M:%S)" >> /tmp/r4_master.log; }

log "waiting for TPU"
ok=0
for i in $(seq 1 60); do
  timeout 900 python -c "
import jax
(jax.numpy.ones((1024,1024)) @ jax.numpy.ones((1024,1024))).block_until_ready()
print('tpu ok', jax.devices()[0], flush=True)
" >> /tmp/tpu_sanity2.log 2>&1 && { ok=1; break; }
  echo "retry $i $(date +%H:%M:%S)" >> /tmp/tpu_sanity2.log
  sleep 600
done
if [ "$ok" != "1" ]; then log "TUNNEL NEVER RECOVERED — aborting"; exit 1; fi
log "TPU up"

log "queue1 start (probes + basin trainings)"
bash scripts/r4_queue1.sh > /tmp/r4_queue1.log 2>&1
log "queue1 done"

log "model choice"
MODEL=$(python scripts/r4_choose_model.py 2>&1 | tee -a /tmp/r4_master.log | tail -1)
log "chosen: $MODEL"

# phase bench needs no trained model and is the cheapest high-information
# stage (VERDICT r4 task 3 accept/reject measurement) — run it before the
# multi-hour planning sweeps in case the round runs short.
log "phase bench (fused likelihood + scan measurement)"
timeout 3600 python scripts/phase_bench.py > /tmp/r4_phasebench.log 2>&1
log "phase bench done"

log "queue3 start (planning measurements)"
MODEL="$MODEL" bash scripts/r4_queue3.sh > /tmp/r4_queue3.log 2>&1
log "queue3 done"

log "queue2 start (gravity multi-horizon sigma)"
bash scripts/r4_queue2.sh > /tmp/r4_queue2.log 2>&1
log "queue2 done"

log "queue4 start (restart protocol + rescues)"
bash scripts/r4_queue4.sh > /tmp/r4_queue4.log 2>&1
log "queue4 done"

log "ALL DONE"
