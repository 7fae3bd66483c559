"""Dense planning benchmark on CPU (keeps the TPU free for training).

Restores the avoidance_dense checkpoint and runs model / oracle / random
MCTS episodes with common random numbers (runner.run_planning).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from stove_tpu.main import main  # noqa: E402

run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2_dense2"
extra = sys.argv[2:]
main([f"restore={run}", "mode=mcts", "mcts_episodes=20",
      "mcts_episode_len=40", "mcts_simulations=54", "mcts_horizon=8",
      *extra])
