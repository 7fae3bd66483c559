#!/bin/bash
# Round-4 resume after the 07:51 session restart killed r4_master.sh.
# State at resume (08:10 UTC): probe3 complete (runs/pallas_rollout_probe3.json),
# SPN gate probe incomplete (vmem OOM, fixed in 86e91fd — queue2's guard
# re-runs it), basin training seed 0 interrupted at epoch ~0.
# This script re-runs queue1 from the trainings, then the unchanged master
# chain: model choice -> phase bench -> queue3 -> queue2 -> queue4.
set -u
cd /root/repo
mkdir -p runs
log() { echo "[master] $1 $(date +%H:%M:%S)" >> /tmp/r4_master.log; }

log "RESUME: waiting for TPU"
ok=0
for i in $(seq 1 30); do
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

log "queue1 trainings (resume)"
{
  COMMON="preset=avoidance_dense num_train=2000 window=12 steps_per_epoch=20 \
num_epochs=400 eval_every=100 ckpt_every=400 fused_epoch=false \
debug_anneal_lr=1.0 anneal_final=0.01 supair_only_epochs=3 \
encoder_space_to_depth=2 encoder_channels=32,64,128 \
overshoot_k=8 overshoot_weight=100.0 reward_overshoot_weight=1.0"

  for SEED in 0 1 2; do
    # a ckpt_*.npz only appears at epoch 400 (ckpt_every=400) or the
    # final save — its presence marks a completed training
    if ls "runs/r4a_dense_s$SEED"/ckpt_*.npz >/dev/null 2>&1; then
      echo "=== seed $SEED already complete — skipping ==="
      continue
    fi
    echo "=== basin-protocol avoidance train seed $SEED $(date +%H:%M:%S) ==="
    timeout 5400 python -m stove_tpu.main $COMMON seed=$SEED \
      run_name=r4a_dense_s$SEED 2>&1 | tail -3
  done

  echo "=== posthoc eval (mse@8 + overshoot trigger) $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/posthoc_eval.py runs/r4a_dense_s0 \
    runs/r4a_dense_s1 runs/r4a_dense_s2 2>&1 | tail -20
  echo "=== queue1 done $(date +%H:%M:%S) ==="
} >> /tmp/r4_queue1.log 2>&1
log "queue1 done"

log "model choice"
MODEL=$(python scripts/r4_choose_model.py 2>&1 | tee -a /tmp/r4_master.log | tail -1)
log "chosen: $MODEL"

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
