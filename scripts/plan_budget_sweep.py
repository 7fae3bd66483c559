"""Search-budget scaling experiment (VERDICT r2 #1).

Round 2 concluded "planning is model-limited at ~1 extra collision / 40
steps" from 54-simulation searches — a budget chosen for a serial planner.
This sweeps the simulation budget for model AND oracle on the same CRN
episodes (lockstep-batched, so a 64x budget costs minutes, not hours):

  * if the oracle keeps improving while the model plateaus, the gap is
    genuinely model-limited (then localize the open-loop error);
  * if both plateau, the "search-limited" hypothesis dies and parity is a
    budget knob.

Usage: python scripts/plan_budget_sweep.py [run_dir] [episodes]
Writes runs/plan_budget_sweep_<name>.json incrementally.
"""
import json
import os
import sys
import time

import jax

if os.environ.get("PLAN_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
try:  # persistent compile cache: sweep stages share executables across runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

sys.path.insert(0, "/root/repo")

from stove_tpu.planning import runner  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402

BUDGETS = [54, 216, 864, 3456]


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2a_dense2k"
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    name = os.path.basename(run.rstrip("/"))
    out_path = f"runs/plan_budget_sweep_{name}.json"
    cfg0 = ckpt_lib.load_config(run).with_overrides(
        restore=run, nolog=True, mcts_episodes=episodes,
        mcts_episode_len=40, mcts_horizon=8, mcts_lockstep=True)

    out_all = {"run": run, "episodes": episodes, "budgets": {}}
    for sims in BUDGETS:
        # frontier scales with budget (keeps rounds bounded) but caps at 32
        # so selection stays UCT-guided rather than breadth-first
        frontier = min(32, max(4, 4 * sims // 54))
        cfg = cfg0.with_overrides(mcts_simulations=sims,
                                  mcts_frontier=frontier)
        print(f"=== budget {sims} (frontier {frontier}) ===", flush=True)
        t0 = time.time()
        res = runner.run_planning(cfg)
        res["wall_s"] = round(time.time() - t0, 1)
        res["frontier"] = frontier
        out_all["budgets"][str(sims)] = res
        with open(out_path, "w") as f:
            json.dump(out_all, f, indent=1)
        print(f"=== budget {sims} done in {res['wall_s']}s ===", flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
