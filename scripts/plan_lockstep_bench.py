"""Serial vs lockstep planning-eval wall-clock (VERDICT r2 #4 'Done' bar:
>=5x faster with identical per-episode scores).

Runs the SAME E CRN episodes serial (mcts_lockstep=false) and lockstep,
prints wall seconds and per-episode scores for both, and the speedup.

Usage: python scripts/plan_lockstep_bench.py [run_dir] [episodes]
"""
import json
import os
import sys
import time

import jax

if os.environ.get("PLAN_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
try:  # persistent compile cache shared with the budget sweep
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

sys.path.insert(0, "/root/repo")

from stove_tpu.planning import runner  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2a_dense2k"
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg0 = ckpt_lib.load_config(run).with_overrides(
        restore=run, nolog=True, mcts_episodes=episodes,
        mcts_episode_len=40, mcts_simulations=54, mcts_horizon=8)

    out = {"run": run, "episodes": episodes}
    for mode, lockstep in (("lockstep", True), ("serial", False)):
        cfg = cfg0.with_overrides(mcts_lockstep=lockstep)
        # compile warm-up: a 2-env-step eval hits every jitted executable at
        # the measurement shapes (the steady-state number is what repeated
        # round-3 planning experiments actually pay; the cold time is
        # reported separately)
        t0 = time.time()
        runner.run_planning(cfg.with_overrides(mcts_episode_len=2))
        warm_s = round(time.time() - t0, 1)
        t0 = time.time()
        res = runner.run_planning(cfg)
        out[mode] = {"wall_s": round(time.time() - t0, 1),
                     "warmup_s": warm_s,
                     "scores": res.get("episode_scores"),
                     "model_mean": res["model_mean_reward"],
                     "oracle_mean": res["oracle_mean_reward"]}
        print(f"[{mode}] {out[mode]['wall_s']}s (+{warm_s}s warm-up)",
              flush=True)
    out["speedup"] = round(out["serial"]["wall_s"]
                           / max(out["lockstep"]["wall_s"], 1e-9), 2)
    ser, lock = out["serial"], out["lockstep"]
    out["scores_identical"] = (
        ser["scores"] is not None and lock["scores"] is not None
        and all(ser["scores"][k] == lock["scores"][k] for k in ser["scores"]))
    with open("runs/plan_lockstep_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"speedup {out['speedup']}x, scores identical: "
          f"{out['scores_identical']}", flush=True)


if __name__ == "__main__":
    main()
