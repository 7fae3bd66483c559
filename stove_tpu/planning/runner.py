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
from stove_tpu.planning.mcts import MCTS, MCTSLockstep
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

        def _step_render(s, a):
            nxt, reward = physics.avoidance_step(cfg, s, a)
            return nxt, reward, physics.render(cfg, nxt.pos, nxt.radii)

        self.step_render = jax.jit(_step_render)


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
        env_state, reward, frame = env.step_render(env_state,
                                                   jnp.int32(action))
        total += float(reward)
        frames.append(np.asarray(frame))
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


# --------------------------------------------------------------------------
# lockstep (episode-batched) evaluation — VERDICT r2 #4
# --------------------------------------------------------------------------

class BatchedEnvHandles:
    """Jitted environment callables vmapped over an episode axis."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.init_many = jax.jit(jax.vmap(
            lambda k: physics.init_state(cfg, k)))
        self.step_many = jax.jit(jax.vmap(
            lambda s, a: physics.avoidance_step(cfg, s, a)))
        self.render_many = jax.jit(jax.vmap(
            lambda s: physics.render(cfg, s.pos, s.radii)))

        def _step_render(s, a):
            nxt, reward = physics.avoidance_step(cfg, s, a)
            return nxt, reward, physics.render(cfg, nxt.pos, nxt.radii)

        self.step_render_many = jax.jit(jax.vmap(_step_render))


class _KeyLanes:
    """E per-episode PRNG chains advanced with batched splits.

    `vmap(split)` equals per-key splits, so every lane's chain is exactly
    what the serial episode with the same seed key would draw."""

    def __init__(self, keys):
        self.data = np.asarray(jax.vmap(jax.random.key_data)(keys))
        self._splitters = {}

    def split(self, n: int):
        """Advance every lane: returns n-1 key arrays of shape (E,)."""
        if n not in self._splitters:
            self._splitters[n] = jax.jit(jax.vmap(
                lambda kd: jax.random.key_data(jax.random.split(
                    jax.random.wrap_key_data(kd), n))))
        out = np.asarray(self._splitters[n](self.data))    # (E, n, kd)
        self.data = out[:, 0]
        return tuple(jax.random.wrap_key_data(out[:, i])
                     for i in range(1, n))


def _lockstep_model(cfg: Config, model: StoveModel, params, keys,
                    episode_len: int, planner: MCTSLockstep,
                    env: BatchedEnvHandles) -> np.ndarray:
    """E avoidance episodes planned with the learned model, in lockstep.
    Per-episode-identical to `run_episode_model` with the same keys."""
    E = keys.shape[0]
    W = cfg.window
    lanes = _KeyLanes(keys)
    (k_init,) = lanes.split(2)
    env_states = env.init_many(k_init)
    frame = np.asarray(env.render_many(env_states))        # (E, H, W)
    frames = [frame] * W                                   # history, newest last
    actions = np.zeros((E, W), np.int32)
    totals = np.zeros((E,), np.float64)
    for _ in range(episode_len):
        k_inf, k_plan = lanes.split(3)
        window = np.stack(frames[-W:], axis=1)[:, None]    # (E, 1, W, H, W)
        inf = model.infer_each(params, normalize_frames(jnp.asarray(window)),
                               jnp.asarray(actions[:, -W:])[:, None], k_inf)
        z = np.asarray(inf.z_mean[:, 0, -1])               # (E, O, D)
        acts, _counts = planner.run([z[e] for e in range(E)], k_plan)
        acts = np.asarray(acts, np.int32)
        actions[:, -1] = acts
        env_states, rewards, frame = env.step_render_many(
            env_states, jnp.asarray(acts))
        totals += np.asarray(rewards, np.float64)
        frames.append(np.asarray(frame))
        actions = np.concatenate(
            [actions, np.zeros((E, 1), np.int32)], axis=1)
    return totals


def _lockstep_oracle(cfg: Config, keys, episode_len: int,
                     planner: MCTSLockstep,
                     env: BatchedEnvHandles) -> np.ndarray:
    E = keys.shape[0]
    lanes = _KeyLanes(keys)
    (k_init,) = lanes.split(2)
    env_states = env.init_many(k_init)
    totals = np.zeros((E,), np.float64)
    for _ in range(episode_len):
        (k_plan,) = lanes.split(2)
        host_states = jax.tree_util.tree_map(np.asarray, env_states)
        roots = [jax.tree_util.tree_map(lambda x: x[e], host_states)
                 for e in range(E)]
        acts, _ = planner.run(roots, k_plan)
        env_states, rewards = env.step_many(
            env_states, jnp.asarray(np.asarray(acts, np.int32)))
        totals += np.asarray(rewards, np.float64)
    return totals


def _lockstep_random(cfg: Config, keys, episode_len: int,
                     env: BatchedEnvHandles) -> np.ndarray:
    E = keys.shape[0]
    lanes = _KeyLanes(keys)
    (k_init,) = lanes.split(2)
    env_states = env.init_many(k_init)
    totals = np.zeros((E,), np.float64)
    draw = jax.jit(jax.vmap(
        lambda k: jax.random.randint(k, (), 0, cfg.num_actions)))
    for _ in range(episode_len):
        (k_a,) = lanes.split(2)
        a = draw(k_a)
        env_states, rewards = env.step_many(env_states, a)
        totals += np.asarray(rewards, np.float64)
    return totals


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

    if cfg.mcts_lockstep:
        return _run_planning_lockstep(cfg, model, params)
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
    return _summarize(cfg, scores)


def _run_planning_lockstep(cfg: Config, model: StoveModel,
                           params) -> Dict[str, float]:
    """Lockstep variant of run_planning: all episodes of each policy advance
    together, one (E·K·A)-batch device call per search round.  Same CRN
    protocol and per-episode keys as the serial path (VERDICT r2 #4)."""
    key = jax.random.key(cfg.seed + 7)
    E = cfg.mcts_episodes
    keys = jax.vmap(lambda e: jax.random.fold_in(key, e))(jnp.arange(E))
    env = BatchedEnvHandles(cfg)
    model_planner = MCTSLockstep(LearnedSimulator(model, params), cfg)
    oracle_planner = MCTSLockstep(TrueSimulator(cfg), cfg)
    episode_len = cfg.mcts_episode_len

    scores: Dict[str, list] = {}
    import time
    for name, fn in (
            ("model", lambda: _lockstep_model(cfg, model, params, keys,
                                              episode_len, model_planner,
                                              env)),
            ("oracle", lambda: _lockstep_oracle(cfg, keys, episode_len,
                                                oracle_planner, env)),
            ("random", lambda: _lockstep_random(cfg, keys, episode_len,
                                                env))):
        t0 = time.time()
        scores[name] = list(fn())
        print(f"[plan] {name}: {len(scores[name])} episodes in "
              f"{time.time() - t0:.1f}s (lockstep)", flush=True)
    for ep in range(E):
        print(f"[plan] episode {ep}: " + "  ".join(
            f"{n}={scores[n][ep]:.0f}" for n in scores), flush=True)
    return _summarize(cfg, scores)


def _summarize(cfg: Config, scores: Dict[str, list]) -> Dict[str, float]:
    out: Dict[str, float] = {}
    n_ep = len(next(iter(scores.values())))
    for name in scores:
        out[f"{name}_mean_reward"] = float(np.mean(scores[name]))
        out[f"{name}_std"] = float(np.std(scores[name]))
        print(f"[plan] {name}: mean={out[f'{name}_mean_reward']:.2f} "
              f"± {out[f'{name}_std']:.2f} over {n_ep} episodes", flush=True)
    # paired statistics: with common random numbers the per-episode
    # (model − oracle) difference cancels init-to-init variance, giving a
    # far tighter estimate of the true gap than the marginal stds
    gap = np.asarray(scores["model"]) - np.asarray(scores["oracle"])
    out["model_oracle_gap_mean"] = float(np.mean(gap))
    out["model_oracle_gap_sem"] = float(np.std(gap) /
                                        np.sqrt(max(len(gap), 1)))
    out["episode_scores"] = {k: [float(x) for x in v]
                             for k, v in scores.items()}
    print(f"[plan] paired model−oracle gap: {out['model_oracle_gap_mean']:.2f}"
          f" ± {out['model_oracle_gap_sem']:.2f} (SEM, n={len(gap)})",
          flush=True)
    return out
