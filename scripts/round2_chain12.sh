#!/bin/bash
# Round-2 chain 12: dense planning push — anneal + 2x corpus (D4's data
# scale, which out-planned sharper models), with a label-smoothing arm.
cd /root/repo

dense () {
  NAME=$1; shift
  echo "=== $NAME: $* ==="
  timeout 9000 python -m stove_tpu.main preset=avoidance_dense \
    window=12 overshoot_k=8 \
    num_train=2000 num_test=300 seq_len=100 batch_size=256 num_epochs=400 \
    steps_per_epoch=20 supair_only_epochs=3 eval_every=200 ckpt_every=400 \
    fused_epoch=false run_name=$NAME "$@" 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
  echo "=== $NAME DONE ==="
}

dense r2a_dense2k
dense r2a_dense2k_ls reward_label_smooth=0.1
echo "=== CHAIN12 DONE ==="
