"""Diagnostic: model-MCTS with the TRUE env state at the root.

Separates the two error sources in planning-from-pixels:
  * root-inference error (posterior z from the frame window), vs
  * open-loop dynamics + reward-head error inside the search.

If planning with a ground-truth root reaches oracle level, the bottleneck
is root inference; if it stays at the from-pixels level, it's the model's
rollouts/rewards.  Latents are set to the prior mean (0) — the dynamics
was trained with inferred latents, so this is a mild handicap.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stove_tpu.config import Config  # noqa: E402
from stove_tpu.models.bundle import StoveModel  # noqa: E402
from stove_tpu.planning.mcts import MCTS  # noqa: E402
from stove_tpu.planning.runner import EnvHandles  # noqa: E402
from stove_tpu.planning.simulators import LearnedSimulator  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402


def env_state_to_z(cfg: Config, env_state) -> jnp.ndarray:
    """EnvState (pos/vel in arena units) → model z (O, 6+cl)."""
    pos01 = env_state.pos / cfg.arena_size
    pos = pos01 * 2.0 - 1.0
    # env vel is per-frame displacement in arena units; model velocity is
    # the per-frame displacement in [-1,1] coords = 2 × [0,1]-coords
    vel = env_state.vel / cfg.arena_size * 2.0
    s = 2.0 * env_state.radii / cfg.arena_size
    size = jnp.stack([s, s], -1)
    lat = jnp.zeros((cfg.num_obj, cfg.cl))
    return jnp.concatenate([size, pos, vel, lat], -1)


def run_episode_true_posvel(cfg, model, params, planner, env, key):
    """From-pixels episode, but after each root inference the position and
    velocity dims of z are overwritten with ground truth (slots matched on
    position).  Sizes and latents stay inferred — they carry model-specific
    conventions (inferred boxes run ~30% larger than 2r/arena, |latent|~1.6)
    that the dynamics/reward head are calibrated to."""
    from stove_tpu.envs.data import normalize_frames
    from stove_tpu.ops import matching

    key, k_init = jax.random.split(key)
    env_state = env.init(k_init)
    W = cfg.window
    frames = [np.asarray(env.render(env_state))] * W
    actions = np.zeros((W,), np.int32)
    total = 0.0
    for _ in range(cfg.mcts_episode_len):
        key, k_inf, k_plan = jax.random.split(key, 3)
        window = jnp.asarray(np.stack(frames[-W:]))[None]
        inf = model.infer(params, normalize_frames(window),
                          jnp.asarray(actions[-W:])[None], k_inf)
        z = np.array(inf.z_mean[0, -1])                    # (O, 6+cl) copy
        true_pos = np.asarray(env_state.pos) / cfg.arena_size * 2.0 - 1.0
        true_vel = np.asarray(env_state.vel) / cfg.arena_size * 2.0
        perm = np.asarray(matching.match_positions(
            jnp.asarray(z[None, :, 2:4]), jnp.asarray(true_pos[None])))[0]
        inv = np.argsort(perm)
        z[:, 2:4] = true_pos[inv]
        z[:, 4:6] = true_vel[inv]
        action, _ = planner.run(jnp.asarray(z), k_plan)
        actions[-1] = action
        env_state, reward = env.step(env_state, jnp.int32(action))
        total += float(reward)
        frames.append(np.asarray(env.render(env_state)))
        actions = np.append(actions, 0)
    return total


def main(argv):
    run = argv[1] if len(argv) > 1 else "runs/r2f_dense_seed0"
    episodes = int(argv[2]) if len(argv) > 2 else 20
    true_posvel = "--true-posvel" in argv
    overrides = [a for a in argv[3:] if not a.startswith("--")]
    import json
    base = {k: (tuple(v) if isinstance(v, list) else v)
            for k, v in json.load(open(f"{run}/config.json")).items()}
    cfg = Config(**base).with_overrides(*overrides)
    model = StoveModel(cfg)
    tpl = {"params": model.init_params()}
    _, loaded = ckpt_lib.restore(run, tpl)
    params = loaded["params"]
    env = EnvHandles(cfg)
    planner = MCTS(LearnedSimulator(model, params), cfg)

    key = jax.random.key(cfg.seed + 7)
    tag = "true-posvel" if true_posvel else "oracle-root"
    totals = []
    for ep in range(episodes):
        k_ep = jax.random.fold_in(key, ep)
        if true_posvel:
            total = run_episode_true_posvel(cfg, model, params, planner,
                                            env, k_ep)
        else:
            k_ep, k_init = jax.random.split(k_ep)
            env_state = env.init(k_init)
            total = 0.0
            for _ in range(cfg.mcts_episode_len):
                k_ep, k_plan = jax.random.split(k_ep)
                z = env_state_to_z(cfg, env_state)
                action, _ = planner.run(z, k_plan)
                env_state, reward = env.step(env_state, jnp.int32(action))
                total += float(reward)
        totals.append(total)
        print(f"[{tag}] episode {ep}: {total:.0f}", flush=True)
    print(f"[{tag}] mean={np.mean(totals):.2f} ± {np.std(totals):.2f} "
          f"over {episodes} episodes", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
