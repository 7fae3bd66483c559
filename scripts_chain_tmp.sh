#!/bin/bash
cd /root/repo
echo "=== PLANNING EVAL (frontier-batched, shared jits) ==="
timeout 2500 python -m stove_tpu.main mode=mcts restore=runs/val_avoid \
  mcts_episodes=3 mcts_episode_len=20 mcts_simulations=54 mcts_horizon=8 \
  mcts_frontier=6 data_dir=data 2>&1 | grep -v WARNING
echo "=== TRAIN BENCH ==="
timeout 1500 python bench.py --train 2>&1 | grep -v WARNING
