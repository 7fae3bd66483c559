#!/bin/bash
# Round-2 follow-up chain: dense retrain on CORRECT dense-physics data
# (dataset_path now encodes physics params), then gravity long-horizon evals.
cd /root/repo

echo "=== E1b: avoidance_dense retrain on dense-physics data ==="
timeout 4000 python -m stove_tpu.main preset=avoidance_dense \
  num_train=1000 num_test=300 seq_len=100 batch_size=256 num_epochs=120 \
  steps_per_epoch=20 supair_only_epochs=3 eval_every=30 ckpt_every=60 \
  fused_epoch=false run_name=r2_dense2 2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -4
echo "=== E1b DONE ==="

for RUN in r2_grav_k12 r2_grav_samp r2_bil_vfull r2_bil_vold r2_dense2; do
  echo "=== EVAL $RUN ==="
  timeout 2500 python -m stove_tpu.main restore=runs/$RUN mode=eval \
    2>&1 | grep -vE 'WARNING|^W[0-9]' | tail -16
done
echo "=== CHAIN2 DONE ==="
