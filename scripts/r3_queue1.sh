#!/bin/bash
# Round-3 queue 1: billiards precise-dynamics basin levers (VERDICT r2 #2).
# Extends chain 10: round-2 linear-to-10% annealing reached the ~0.009 basin
# on 3/5 seeds; probe lower final lr (1%) and cosine shape, 5 fresh seeds
# each.  Runs sequentially — ONE TPU process at a time (axon discipline).
set -u
cd /root/repo
COMMON="preset=stove_billiards num_epochs=360 steps_per_epoch=20 eval_every=60 ckpt_every=120 fused_epoch=false"

for s in 10 11 12 13 14; do
  echo "=== r3a_bil_s$s (linear to 1%) $(date +%H:%M:%S) ==="
  timeout 1200 python -m stove_tpu.main $COMMON seed=$s \
    anneal_final=0.01 run_name=r3a_bil_s$s 2>&1 | tail -2
done

for s in 10 11 12 13 14; do
  echo "=== r3c_bil_s$s (cosine to 1%) $(date +%H:%M:%S) ==="
  timeout 1200 python -m stove_tpu.main $COMMON seed=$s \
    anneal_shape=cosine anneal_final=0.01 run_name=r3c_bil_s$s 2>&1 | tail -2
done
echo "=== queue1 done $(date +%H:%M:%S) ==="
