#!/bin/bash
# Round-2 chain 7: velocity-filter levers (runs after chain6).
# Hypothesis from the handoff diagnostic: q(v) is floor-dominated
# (min_dyn_std=0.01 forbids tight velocity confidence between collisions);
# loosening the floor and/or observing filtered-position differences should
# shrink handoff velocity error, which compounds over the rollout.
cd /root/repo
COMMON="num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120
  steps_per_epoch=20 supair_only_epochs=3 eval_every=60 ckpt_every=120
  fused_epoch=false"

run () {
  NAME=$1; shift
  echo "=== $NAME: $* ==="
  timeout 3000 python -m stove_tpu.main preset=stove_billiards $COMMON \
    run_name=$NAME "$@" 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
  echo "=== $NAME DONE ==="
}

run m6_vfilt velocity_obs=filtered
run m7_dynstd1 min_dyn_std=0.001
run m8_filt_std3 velocity_obs=filtered min_dyn_std=0.003
run m9_encstd3 min_enc_std=0.003 min_dyn_std=0.003
echo "=== CHAIN7 DONE ==="
