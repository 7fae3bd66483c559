#!/bin/bash
# Round-2 chain 11: annealed flagship runs (presets now anneal LR to 10%
# over the run — the chain-10 basin lever). Multi-seed for the final
# RESULTS.md tables.
cd /root/repo

bil () {
  NAME=$1; shift
  echo "=== $NAME ==="
  timeout 8000 python -m stove_tpu.main preset=stove_billiards \
    num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=360 \
    steps_per_epoch=20 supair_only_epochs=3 eval_every=90 ckpt_every=180 \
    fused_epoch=false run_name=$NAME "$@" 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
  echo "=== $NAME DONE ==="
}
grav () {
  NAME=$1; shift
  echo "=== $NAME ==="
  timeout 8000 python -m stove_tpu.main preset=stove_gravity \
    window=16 overshoot_k=12 overshoot_sample=true \
    num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=260 \
    steps_per_epoch=20 supair_only_epochs=3 eval_every=130 ckpt_every=260 \
    fused_epoch=false run_name=$NAME "$@" 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
  echo "=== $NAME DONE ==="
}
dense () {
  NAME=$1; shift
  echo "=== $NAME ==="
  timeout 8000 python -m stove_tpu.main preset=avoidance_dense \
    window=12 overshoot_k=8 \
    num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=300 \
    steps_per_epoch=20 supair_only_epochs=3 eval_every=150 ckpt_every=300 \
    fused_epoch=false run_name=$NAME "$@" 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -2
  echo "=== $NAME DONE ==="
}

dense r2a_dense_seed0
dense r2a_dense_seed1 seed=1
bil r2a_bil_seed0
bil r2a_bil_seed1 seed=1
bil r2a_bil_seed2 seed=2
grav r2a_grav_seed0
grav r2a_grav_seed1 seed=1
echo "=== CHAIN11 DONE ==="
