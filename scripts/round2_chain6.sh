#!/bin/bash
# Round-2 chain 6: billiards accuracy matrix with seed replicates.
# Today's reruns showed the recorded round-2 billiards numbers (0.0223 @120ep,
# 0.0111 @360ep) are irreproducible at ANY commit incl. their own (likely run
# against uncommitted transient code last session). Re-derive the best config
# honestly: size the seed noise first, then judge levers against it.
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

run m1_seed1 seed=1
run m1_seed2 seed=2
run m2_vold velocity_obs_full_std=false
run m3_k7 overshoot_k=7
run m4_w10 window=10
run m5_dynstd min_dyn_std=0.003
echo "=== CHAIN6 DONE ==="
