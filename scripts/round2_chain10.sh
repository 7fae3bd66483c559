#!/bin/bash
# Round-2 chain 10: make the good dynamics basin reliable.
# 360-epoch billiards runs land bimodally (mse@8 0.0095 vs 0.041 across
# seeds; the good basin has 30% better handoff velocity and calibrated
# sigma_v) — probe capacity, training budget, and LR decay as basin levers.
cd /root/repo

bil () {
  NAME=$1; shift
  echo "=== $NAME: $* ==="
  timeout 8000 python -m stove_tpu.main preset=stove_billiards \
    num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=360 \
    supair_only_epochs=3 eval_every=90 ckpt_every=180 \
    fused_epoch=false run_name=$NAME "$@" 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
  echo "=== $NAME DONE ==="
}

bil c1_h256 steps_per_epoch=20 dyn_hidden=256
bil c2_spe40 steps_per_epoch=40
bil c3_h256_spe40 steps_per_epoch=40 dyn_hidden=256
bil c4_anneal steps_per_epoch=20 debug_anneal_lr=7200

# gravity: the 80-step speed ratio rises through training (0.79 at 200
# epochs, seed0); 260 epochs should land inside the [0.8, 1.2] band
echo "=== g260: gravity 260 epochs ==="
timeout 8000 python -m stove_tpu.main preset=stove_gravity \
  window=16 overshoot_k=12 overshoot_sample=true \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=260 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=130 ckpt_every=260 \
  fused_epoch=false run_name=r2f_grav260 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
echo "=== g260 DONE ==="
echo "=== CHAIN10 DONE ==="
