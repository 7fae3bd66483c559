"""Planning episodes: MCTS in the real avoidance env, from pixels.

Reference protocol [ref: model/mcts/ run script; SURVEY.md §3.4]: per env
step, run MCTS from the current model state, act on the visit counts, step
the true environment, re-infer the model state from the updated frame
window.  Baselines: MCTS on the ground-truth env (oracle) and a random
policy.  "model ≈ oracle ≫ random" is the paper's planning claim
(BASELINE.md row 4).

All env interactions (init, step, render) are jitted once and shared across
episodes — the remote-TPU link makes per-op dispatch latency the dominant
cost otherwise.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stove_tpu.config import Config
from stove_tpu.envs import physics
from stove_tpu.envs.data import normalize_frames
from stove_tpu.models.bundle import StoveModel
from stove_tpu.planning.mcts import MCTS
from stove_tpu.planning.simulators import LearnedSimulator, TrueSimulator


class EnvHandles:
    """Jitted environment callables, built once per config."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.init = jax.jit(lambda k: physics.init_state(cfg, k))
        self.step = jax.jit(
            lambda s, a: physics.avoidance_step(cfg, s, a))
        self.render = jax.jit(
            lambda s: physics.render(cfg, s.pos, s.radii))


def run_episode_model(cfg: Config, model: StoveModel, params,
                      key: jax.Array, episode_len: Optional[int] = None,
                      planner: Optional[MCTS] = None,
                      env: Optional[EnvHandles] = None) -> float:
    """One avoidance episode planned with the learned model from pixels.

    Pass shared `planner`/`env` across episodes — they hold the compiled
    executables (rebuilding per episode would recompile).
    """
    episode_len = episode_len or cfg.mcts_episode_len
    planner = planner or MCTS(LearnedSimulator(model, params), cfg)
    env = env or EnvHandles(cfg)

    key, k_init = jax.random.split(key)
    env_state = env.init(k_init)
    W = cfg.window
    frames = [np.asarray(env.render(env_state))] * W
    # actions[t] = action applied AT frame t (drives the transition t → t+1),
    # matching the data-generator layout and infer's a_{t−1} indexing.  The
    # newest frame's slot holds a placeholder until the planner picks its
    # action (infer never reads the window's last action).
    actions = np.zeros((W,), np.int32)
    total = 0.0
    for _ in range(episode_len):
        key, k_inf, k_plan = jax.random.split(key, 3)
        window = jnp.asarray(np.stack(frames[-W:]))[None]
        inf = model.infer(params, normalize_frames(window),
                          jnp.asarray(actions[-W:])[None], k_inf)
        z = inf.z_mean[0, -1]
        action, _counts = planner.run(z, k_plan)
        actions[-1] = action  # applied at the current (last) frame
        env_state, reward = env.step(env_state, jnp.int32(action))
        total += float(reward)
        frames.append(np.asarray(env.render(env_state)))
        actions = np.append(actions, 0)  # placeholder for the new frame
    return total


def run_episode_oracle(cfg: Config, key: jax.Array,
                       episode_len: Optional[int] = None,
                       planner: Optional[MCTS] = None,
                       env: Optional[EnvHandles] = None) -> float:
    """MCTS with the ground-truth simulator (upper baseline)."""
    episode_len = episode_len or cfg.mcts_episode_len
    planner = planner or MCTS(TrueSimulator(cfg), cfg)
    env = env or EnvHandles(cfg)
    key, k_init = jax.random.split(key)
    env_state = env.init(k_init)
    total = 0.0
    for _ in range(episode_len):
        key, k_plan = jax.random.split(key)
        action, _ = planner.run(env_state, k_plan)
        env_state, reward = env.step(env_state, jnp.int32(action))
        total += float(reward)
    return total


def run_episode_random(cfg: Config, key: jax.Array,
                       episode_len: Optional[int] = None,
                       env: Optional[EnvHandles] = None) -> float:
    episode_len = episode_len or cfg.mcts_episode_len
    env = env or EnvHandles(cfg)
    key, k_init = jax.random.split(key)
    env_state = env.init(k_init)
    total = 0.0
    for _ in range(episode_len):
        key, k_a = jax.random.split(key)
        a = jax.random.randint(k_a, (), 0, cfg.num_actions)
        env_state, reward = env.step(env_state, a)
        total += float(reward)
    return total


def run_planning(cfg: Config, params=None) -> Dict[str, float]:
    """Evaluate planning: learned-model MCTS vs oracle MCTS vs random."""
    key = jax.random.key(cfg.seed + 7)
    model = StoveModel(cfg)
    if params is None:
        if cfg.restore is not None:
            from stove_tpu.train import checkpoint as ckpt_lib
            tpl = {"params": model.init_params()}
            _, loaded = ckpt_lib.restore(cfg.restore, tpl)
            params = loaded["params"]
        else:
            params = model.init_params()  # untrained (smoke/debug only)

    env = EnvHandles(cfg)
    model_planner = MCTS(LearnedSimulator(model, params), cfg)
    oracle_planner = MCTS(TrueSimulator(cfg), cfg)
    policies = (
        ("model", lambda k: run_episode_model(cfg, model, params, k,
                                              planner=model_planner, env=env)),
        ("oracle", lambda k: run_episode_oracle(cfg, k,
                                                planner=oracle_planner,
                                                env=env)),
        ("random", lambda k: run_episode_random(cfg, k, env=env)),
    )
    # common random numbers: every policy sees the SAME episode seed (and
    # hence the same env initialization — k_init is split identically in
    # each run_episode_*), so policy differences aren't drowned in
    # init-to-init variance
    scores: Dict[str, list] = {name: [] for name, _ in policies}
    for ep in range(cfg.mcts_episodes):
        k_ep = jax.random.fold_in(key, ep)
        for name, fn in policies:
            scores[name].append(fn(k_ep))
        print(f"[plan] episode {ep}: " + "  ".join(
            f"{n}={scores[n][-1]:.0f}" for n, _ in policies), flush=True)
    out: Dict[str, float] = {}
    for name, _ in policies:
        out[f"{name}_mean_reward"] = float(np.mean(scores[name]))
        out[f"{name}_std"] = float(np.std(scores[name]))
        print(f"[plan] {name}: mean={out[f'{name}_mean_reward']:.2f} "
              f"± {out[f'{name}_std']:.2f} over {cfg.mcts_episodes} "
              f"episodes", flush=True)
    # paired statistics: with common random numbers the per-episode
    # (model − oracle) difference cancels init-to-init variance, giving a
    # far tighter estimate of the true gap than the marginal stds
    gap = np.asarray(scores["model"]) - np.asarray(scores["oracle"])
    out["model_oracle_gap_mean"] = float(np.mean(gap))
    out["model_oracle_gap_sem"] = float(np.std(gap) /
                                        np.sqrt(max(len(gap), 1)))
    print(f"[plan] paired model−oracle gap: {out['model_oracle_gap_mean']:.2f}"
          f" ± {out['model_oracle_gap_sem']:.2f} (SEM, n={len(gap)})",
          flush=True)
    return out
