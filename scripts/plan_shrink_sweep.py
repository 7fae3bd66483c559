"""Depth-shrink sweep on the paired planning gap (round-3 attribution lever).

The branch diagnostic measured open-loop reward AUC rotting 0.96 -> 0.78
over rollout depth 1..8, and the budget sweep showed deep search widening
the paired gap by exploiting exactly those rotted leaf estimates
(RESULTS.md "Where the model loses").  `mcts_depth_shrink` pulls step-t
leaf predictions toward the corpus base rate by lambda^(t+1) -- this sweeps
lambda at the budgets where the Goodhart effect was measured, pairing every
model arm against ONE oracle/random evaluation per budget (same CRN keys).

Usage: python scripts/plan_shrink_sweep.py [run_dir] [episodes]
Writes runs/plan_shrink_sweep_<name>.json incrementally.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("PLAN_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

sys.path.insert(0, "/root/repo")

from stove_tpu.models.bundle import StoveModel  # noqa: E402
from stove_tpu.planning import runner  # noqa: E402
from stove_tpu.planning.mcts import MCTSLockstep  # noqa: E402
from stove_tpu.planning.simulators import (LearnedSimulator,  # noqa: E402
                                           TrueSimulator)
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402

BUDGETS = [int(x) for x in
           os.environ.get("PS_BUDGETS", "216,864").split(",")]
LAMBDAS = [float(x) for x in
           os.environ.get("PS_LAMBDAS", "1.0,0.85,0.7,0.55,0.4").split(",")]
# sampled-leaf arm: each lambda is also run with mcts_eval_samples=S
# when PS_SAMPLES > 1 (integrates transition noise into leaf values —
# the round-2 hypothesis that mean rollouts miss collision branches)
SAMPLES = int(os.environ.get("PS_SAMPLES", "1"))
# PS_MODE=tree switches the shrink exponent to TOTAL open-loop depth from
# the root (leaf mode restarts at every leaf and never shrinks tree-edge
# rewards; RESULTS.md round-3 analysis flags leaf mode as under-shrinking
# exactly at the deep budgets the recipe uses — VERDICT r4 task 2)
MODE = os.environ.get("PS_MODE", "leaf")


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2a_dense2k"
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    name = os.path.basename(run.rstrip("/"))
    tag = os.environ.get("PS_TAG", "")
    out_path = f"runs/plan_shrink_sweep_{name}{tag}.json"
    cfg0 = ckpt_lib.load_config(run).with_overrides(
        restore=run, nolog=True, mcts_episodes=episodes,
        mcts_episode_len=40, mcts_horizon=8, mcts_lockstep=True)

    model = StoveModel(cfg0)
    tpl = {"params": model.init_params()}
    _, loaded = ckpt_lib.restore(run, tpl)
    params = loaded["params"]

    key = jax.random.key(cfg0.seed + 7)
    keys = jax.vmap(lambda e: jax.random.fold_in(key, e))(
        jnp.arange(episodes))

    # self-describing provenance (advisor r4: tree-vs-leaf artifacts were
    # distinguishable only by filename tag — weak evidence for a verdict)
    out_all = {"run": run, "episodes": episodes,
               "shrink_mode": MODE, "eval_samples": SAMPLES,
               "budgets_swept": BUDGETS, "lambdas_swept": LAMBDAS,
               "budgets": {}}
    for sims in BUDGETS:
        frontier = min(32, max(4, 4 * sims // 54))
        cfg_b = cfg0.with_overrides(mcts_simulations=sims,
                                    mcts_frontier=frontier)
        env = runner.BatchedEnvHandles(cfg_b)
        print(f"=== budget {sims} (frontier {frontier}) ===", flush=True)
        t0 = time.time()
        oracle = list(runner._lockstep_oracle(
            cfg_b, keys, cfg_b.mcts_episode_len,
            MCTSLockstep(TrueSimulator(cfg_b), cfg_b), env))
        rand = list(runner._lockstep_random(
            cfg_b, keys, cfg_b.mcts_episode_len, env))
        entry = {"frontier": frontier,
                 "oracle_mean": float(np.mean(oracle)),
                 "random_mean": float(np.mean(rand)),
                 "oracle_scores": [float(x) for x in oracle],
                 "lambdas": {}}
        print(f"oracle {entry['oracle_mean']:.2f}  random "
              f"{entry['random_mean']:.2f}  ({time.time()-t0:.0f}s)",
              flush=True)
        for lam in LAMBDAS:
            cfg_l = cfg_b.with_overrides(mcts_depth_shrink=lam,
                                         mcts_eval_samples=SAMPLES,
                                         mcts_shrink_mode=MODE)
            model_l = StoveModel(cfg_l)
            t1 = time.time()
            scores = list(runner._lockstep_model(
                cfg_l, model_l, params, keys, cfg_l.mcts_episode_len,
                MCTSLockstep(LearnedSimulator(model_l, params), cfg_l), env))
            gap = np.asarray(scores) - np.asarray(oracle)
            entry["lambdas"][str(lam)] = {
                "model_mean": float(np.mean(scores)),
                "gap_mean": float(np.mean(gap)),
                "gap_sem": float(np.std(gap) / np.sqrt(len(gap))),
                "scores": [float(x) for x in scores],
                "wall_s": round(time.time() - t1, 1),
            }
            print(f"lambda {lam}: model {np.mean(scores):.2f}  paired gap "
                  f"{np.mean(gap):.2f} +- {np.std(gap)/np.sqrt(len(gap)):.2f}"
                  f"  ({time.time()-t1:.0f}s)", flush=True)
            out_all["budgets"][str(sims)] = entry
            with open(out_path, "w") as f:
                json.dump(out_all, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
