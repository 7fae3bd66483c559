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
echo "=== CHAIN10 DONE ==="
