#!/bin/bash
# Round-2 training matrix — runs SEQUENTIALLY in one chain (the axon tunnel
# serializes TPU sessions; a second concurrent job queues forever).
# Each run exits on its own; never kill mid-run (wedges the backend ~50 min).
cd /root/repo

echo "=== E1: avoidance_dense, new reward head + open-loop reward supervision ==="
timeout 4000 python -m stove_tpu.main preset=avoidance_dense \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=30 ckpt_every=60 \
  fused_epoch=false run_name=r2_dense 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== E1 DONE ==="

echo "=== E4a: billiards velocity_obs_full_std=true (new default) ==="
timeout 4000 python -m stove_tpu.main preset=stove_billiards \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=40 ckpt_every=60 \
  fused_epoch=false run_name=r2_bil_vfull 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== E4a DONE ==="

echo "=== E4b: billiards velocity_obs_full_std=false (round-1 construction) ==="
timeout 4000 python -m stove_tpu.main preset=stove_billiards \
  velocity_obs_full_std=false \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=40 ckpt_every=60 \
  fused_epoch=false run_name=r2_bil_vold 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== E4b DONE ==="

echo "=== E2: gravity long-window overshoot (window=16, K=12) ==="
timeout 6000 python -m stove_tpu.main preset=stove_gravity \
  window=16 overshoot_k=12 \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=150 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=50 ckpt_every=75 \
  fused_epoch=false run_name=r2_grav_k12 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== E2 DONE ==="

echo "=== E3: gravity sampled-overshoot (noise-robust) ==="
timeout 6000 python -m stove_tpu.main preset=stove_gravity \
  window=16 overshoot_k=12 overshoot_sample=true \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=150 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=50 ckpt_every=75 \
  fused_epoch=false run_name=r2_grav_samp 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== E3 DONE ==="

echo "=== ALL TRAINING DONE ==="
