#!/bin/bash
# Round-2 chain 9: replicate the m9 winner (min_enc_std=0.003 +
# min_dyn_std=0.003 — best handoff vel_rms 0.0080 vs baseline band
# 0.0088-0.0103) across seeds, plus the half-step floor as a dose check.
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

run m9_encstd3_seed1 min_enc_std=0.003 min_dyn_std=0.003 seed=1
run m9_encstd3_seed2 min_enc_std=0.003 min_dyn_std=0.003 seed=2
run m10_floor5 min_enc_std=0.005 min_dyn_std=0.005
echo "=== CHAIN9 DONE ==="
