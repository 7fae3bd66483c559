#!/bin/bash
# Round-2 chain 5: isolate the space-to-depth encoder's accuracy effect.
# Today's reruns (r2_bil_ovpatch/ovimage/r2_bil360p) show mse@8 ~3x worse
# than the recorded pre-s2d round-2 numbers at matched budgets, with equal
# detection MSE — s2d=2 (final 2x2 feature grid) is the prime suspect.
cd /root/repo

echo "=== S1: billiards 120 ep, s2d=1 (pre-adoption encoder) ==="
timeout 3000 python -m stove_tpu.main preset=stove_billiards \
  encoder_space_to_depth=1 \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=60 ckpt_every=120 \
  fused_epoch=false run_name=r2_bil_s2d1 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -3
echo "=== S1 DONE ==="

echo "=== S2: billiards 120 ep, s2d=2 but last conv stride 1 (4x4 grid) ==="
timeout 3000 python -m stove_tpu.main preset=stove_billiards \
  encoder_final_stride1=true \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=60 ckpt_every=120 \
  fused_epoch=false run_name=r2_bil_s2dk 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -3
echo "=== S2 DONE ==="
echo "=== CHAIN5 DONE ==="
