"""Phase-level wall-clock attribution for the lockstep planning loop.

Times each phase of `_lockstep_model` (infer, key splits, frontier
selection, simulator step/evaluate, device→host transfer, tree expansion,
env step+render) over a few env steps, separating the first (compile-heavy)
step from steady state.  Drives the VERDICT r2 #4 speedup work with data
instead of guesses.

Usage: [PLAN_CPU=1] python scripts/plan_phase_profile.py [run_dir] [episodes] [steps]
"""
import json
import os
import sys
import time
from collections import defaultdict

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

from stove_tpu.envs.data import normalize_frames  # noqa: E402
from stove_tpu.models.bundle import StoveModel  # noqa: E402
from stove_tpu.planning.mcts import MCTSLockstep, _to_host  # noqa: E402
from stove_tpu.planning.runner import BatchedEnvHandles, _KeyLanes  # noqa: E402
from stove_tpu.planning.simulators import LearnedSimulator  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2a_dense2k"
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    cfg = ckpt_lib.load_config(run).with_overrides(
        restore=run, nolog=True, mcts_episodes=E,
        mcts_episode_len=40, mcts_simulations=54, mcts_horizon=8,
        mcts_lockstep=True)

    model = StoveModel(cfg)
    tpl = {"params": model.init_params()}
    _, loaded = ckpt_lib.restore(run, tpl)
    params = loaded["params"]

    planner = MCTSLockstep(LearnedSimulator(model, params), cfg)
    env = BatchedEnvHandles(cfg)
    sim = planner.sim

    key = jax.random.key(cfg.seed + 7)
    keys = jax.vmap(lambda e: jax.random.fold_in(key, e))(jnp.arange(E))
    W = cfg.window
    lanes = _KeyLanes(keys)
    (k_init,) = lanes.split(2)
    t = defaultdict(float)          # steady-state (steps >= 1)
    t0ph = defaultdict(float)       # first step (compile-heavy)

    def clock(phase, fn, step_i):
        tic = time.time()
        out = fn()
        out = jax.block_until_ready(out) if out is not None else None
        dt = time.time() - tic
        (t0ph if step_i == 0 else t)[phase] += dt
        return out

    env_states = env.init_many(k_init)
    frame = np.asarray(env.render_many(env_states))
    frames = [frame] * W
    actions = np.zeros((E, W), np.int32)

    from stove_tpu.planning.mcts import _Search
    n_sim = cfg.mcts_simulations

    for i in range(steps):
        k_inf, k_plan = lanes.split(3)
        window = np.stack(frames[-W:], axis=1)[:, None]
        inf = clock("infer", lambda: model.infer_each(
            params, normalize_frames(jnp.asarray(window)),
            jnp.asarray(actions[:, -W:])[:, None], k_inf), i)
        z = np.asarray(inf.z_mean[:, 0, -1])

        # inline planner.run with phase clocks
        searches = [_Search(z[e], n_sim) for e in range(E)]
        keys_data = np.array(jax.random.key_data(k_plan))
        rounds = 0
        while any(not s.done for s in searches):
            rounds += 1
            active = []
            tic = time.time()
            for e, s in enumerate(searches):
                if s.done:
                    continue
                planner._mcts._select_round(s)
                active.append(e)
            (t0ph if i == 0 else t)["plan.select"] += time.time() - tic
            tic = time.time()
            frontiers = [planner._mcts._stack_frontier(searches[e])
                         for e in range(E)]
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0),
                *[f[0] for f in frontiers])
            acts = np.stack([f[1] for f in frontiers], axis=0)
            depths = np.stack([f[2] for f in frontiers], axis=0)
            (t0ph if i == 0 else t)["plan.stack"] += time.time() - tic
            new_keys, nxt, rewards, returns = clock(
                "plan.round", lambda: sim.round_many(
                    stacked, acts, keys_data, cfg.mcts_horizon, depths), i)
            keys_data[active] = np.asarray(new_keys)[active]
            nxt_np = clock("plan.to_host", lambda: _to_host(nxt), i)
            rewards_np = np.asarray(rewards, dtype=np.float64)
            returns_np = np.asarray(returns, dtype=np.float64)
            tic = time.time()
            for e in active:
                planner._mcts._apply_round(
                    searches[e],
                    jax.tree_util.tree_map(lambda x: x[e], nxt_np),
                    rewards_np[e], returns_np[e])
            (t0ph if i == 0 else t)["plan.expand"] += time.time() - tic

        from stove_tpu.planning.mcts import MCTS
        acts_best = np.asarray([MCTS._best(s)[0] for s in searches], np.int32)
        actions[:, -1] = acts_best
        env_states, rewards = clock("env.step", lambda: env.step_many(
            env_states, jnp.asarray(acts_best)), i)
        frames.append(clock("env.render", lambda: np.asarray(
            env.render_many(env_states)), i))
        actions = np.concatenate([actions, np.zeros((E, 1), np.int32)], 1)

    n_steady = max(steps - 1, 1)
    out = {"run": run, "E": E, "steps": steps, "rounds_per_step": rounds,
           "platform": jax.devices()[0].platform,
           "first_step_s": {k: round(v, 3) for k, v in t0ph.items()},
           "steady_per_step_ms": {k: round(1000 * v / n_steady, 2)
                                  for k, v in sorted(
                                      t.items(), key=lambda kv: -kv[1])}}
    total = sum(t.values()) / n_steady
    out["steady_total_ms_per_step"] = round(1000 * total, 1)
    out["projected_40step_s"] = round(40 * total, 1)
    print(json.dumps(out, indent=1))
    with open("runs/plan_phase_profile.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
