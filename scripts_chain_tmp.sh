#!/bin/bash
cd /root/repo
echo "=== PLANNING EVAL ==="
timeout 3000 python -m stove_tpu.main mode=mcts restore=runs/val_avoid \
  mcts_episodes=4 mcts_episode_len=25 mcts_simulations=54 mcts_horizon=8 \
  data_dir=data 2>&1 | grep -v WARNING
echo "=== GRAVITY TRAINING ==="
timeout 4000 python -m stove_tpu.main preset=stove_gravity num_train=200 num_test=50 \
  seq_len=50 batch_size=128 num_epochs=60 steps_per_epoch=20 supair_only_epochs=3 \
  eval_every=10 ckpt_every=20 eval_batch=32 run_name=val_grav 2>&1 | grep -v WARNING | tail -8
echo "=== TRAIN BENCH ==="
timeout 1500 python bench.py --train 2>&1 | grep -v WARNING
