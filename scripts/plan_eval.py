"""Dense planning benchmark (TPU by default; PLAN_CPU=1 forces CPU).

Restores the avoidance_dense checkpoint and runs model / oracle / random
MCTS episodes with common random numbers (runner.run_planning).
"""
import os
import sys

import jax

if os.environ.get("PLAN_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

sys.path.insert(0, "/root/repo")
from stove_tpu.main import main  # noqa: E402

run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2_dense2"
extra = sys.argv[2:]
main([f"restore={run}", "mode=mcts", "mcts_episodes=20",
      "mcts_episode_len=40", "mcts_simulations=54", "mcts_horizon=8",
      *extra])
