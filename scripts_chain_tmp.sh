#!/bin/bash
cd /root/repo
echo "=== BIG AVOIDANCE ==="
timeout 7000 python -m stove_tpu.main preset=stove_avoidance num_train=1000 num_test=300 \
  seq_len=100 batch_size=256 num_epochs=120 steps_per_epoch=40 supair_only_epochs=3 \
  eval_every=10 ckpt_every=30 eval_batch=100 run_name=big_avoid 2>&1 | grep -v WARNING | tail -6
echo "=== PLANNING EVAL (long episodes, trained reward) ==="
timeout 3000 python -m stove_tpu.main mode=mcts restore=runs/big_avoid \
  mcts_episodes=5 mcts_episode_len=40 mcts_simulations=54 mcts_horizon=8 \
  mcts_frontier=6 data_dir=data 2>&1 | grep -v WARNING
echo "=== ROLLOUT BENCH ==="
timeout 900 python bench.py 2>&1 | grep -v WARNING
echo "=== CHAIN DONE ==="
