#!/bin/bash
# Round-2 chain 3: dense planning push (K=8 reward supervision), flagship
# billiards at full epochs, O=6 generalization smoke. Sequential TPU jobs.
cd /root/repo

echo "=== G3: gravity window=16 K=12 sampled-overshoot, 400 epochs ==="
timeout 8000 python -m stove_tpu.main preset=stove_gravity \
  window=16 overshoot_k=12 overshoot_sample=true \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=400 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=100 ckpt_every=200 \
  fused_epoch=false run_name=r2_grav_samp3 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== G3 DONE ==="

echo "=== D3: avoidance_dense window=12 K=8, 300 epochs ==="
timeout 8000 python -m stove_tpu.main preset=avoidance_dense \
  window=12 overshoot_k=8 \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=300 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=75 ckpt_every=150 \
  fused_epoch=false run_name=r2_dense3 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== D3 DONE ==="

echo "=== B360: flagship billiards, 360 epochs, new defaults ==="
timeout 8000 python -m stove_tpu.main preset=stove_billiards \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=360 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=90 ckpt_every=180 \
  fused_epoch=false run_name=r2_bil360 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== B360 DONE ==="

echo "=== O6: 6-ball billiards smoke (greedy slot alignment) ==="
timeout 4000 python -m stove_tpu.main preset=stove_billiards num_obj=6 \
  num_train=300 num_test=100 seq_len=100 batch_size=128 num_epochs=60 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=30 ckpt_every=60 \
  fused_epoch=false run_name=r2_bil_o6 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== O6 DONE ==="

echo "=== EVAL r2_grav_samp3 ==="
timeout 2500 python -m stove_tpu.main restore=runs/r2_grav_samp3 mode=eval \
  2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -16
echo "=== EVAL r2_dense3 ==="
timeout 2500 python -m stove_tpu.main restore=runs/r2_dense3 mode=eval \
  2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -16
echo "=== EVAL r2_bil360 ==="
timeout 2500 python -m stove_tpu.main restore=runs/r2_bil360 mode=eval \
  2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -16
echo "=== CHAIN3 DONE ==="
