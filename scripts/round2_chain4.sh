#!/bin/bash
# Round-2 chain 4: flagship billiards at 360 epochs with the patch-space
# overlap correction (reproduces/updates the headline r2_bil360 number), then
# the dense-planning model push: longer training + bigger corpus with
# horizon-matched reward supervision (VERDICT #1: close the oracle gap).
cd /root/repo

echo "=== B360P: flagship billiards, 360 epochs, patch overlap ==="
timeout 8000 python -m stove_tpu.main preset=stove_billiards \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=360 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=60 ckpt_every=180 \
  fused_epoch=false run_name=r2_bil360p 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -3
echo "=== B360P DONE ==="

echo "=== D4: avoidance_dense w12/K8, 600 epochs, 2000-seq corpus ==="
timeout 8000 python -m stove_tpu.main preset=avoidance_dense \
  window=12 overshoot_k=8 \
  num_train=2000 num_test=300 seq_len=100 batch_size=256 num_epochs=600 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=150 ckpt_every=300 \
  fused_epoch=false run_name=r2_dense4 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -3
echo "=== D4 DONE ==="
echo "=== CHAIN4 DONE ==="
