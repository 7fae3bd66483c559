"""Branch-value diagnostic: where does the planning gap live? (VERDICT r2 #1)

For N CRN avoidance states (drawn by stepping the true env with a random
policy, frame windows recorded), compute for EVERY root action a:

  * true branch value  — step the true env with a, then true-env rollouts
    over S random action sequences, discounted sum of true rewards;
  * model branch value — infer z from the window, step the learned model
    with a, model rollouts over the SAME S action sequences (CRN),
    discounted sum of (calibrated) predicted rewards.

Reported per model:
  * regret: true value of the TRUE argmax minus true value of the MODEL
    argmax (the planning-relevant error — how much reward the model's root
    decision gives away with search removed from the picture);
  * rank correlation (Spearman) between model and true branch values;
  * per-depth reward AUC along the open-loop rollouts (where predictions
    rot with depth).

This separates "the model ranks actions worse" from "search is starved",
and names the depth at which open-loop reward predictions fail.

Usage: python scripts/plan_branch_diag.py run_dir [n_states] [samples]
Writes runs/plan_branch_diag_<name>.json
"""
import json
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stove_tpu.envs import physics  # noqa: E402
from stove_tpu.envs.data import normalize_frames  # noqa: E402
from stove_tpu.models.bundle import StoveModel  # noqa: E402
from stove_tpu.train import checkpoint as ckpt_lib  # noqa: E402
from stove_tpu.train.evaluate import binary_auc  # noqa: E402


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "runs/r2a_dense2k"
    n_states = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    H = 8
    name = os.path.basename(run.rstrip("/"))
    cfg = ckpt_lib.load_config(run).with_overrides(restore=run, nolog=True)
    A, W = cfg.num_actions, cfg.window
    model = StoveModel(cfg)
    _, loaded = ckpt_lib.restore(run, {"params": model.init_params()})
    params = loaded["params"]

    key = jax.random.key(424242)
    k_init, k_walk, k_act, k_roll, k_inf = jax.random.split(key, 5)

    # ---- N states via a batched random-policy walk (windows recorded)
    init_many = jax.jit(jax.vmap(lambda k: physics.init_state(cfg, k)))
    step_many = jax.jit(jax.vmap(lambda s, a: physics.avoidance_step(cfg, s, a)))
    render_many = jax.jit(jax.vmap(lambda s: physics.render(cfg, s.pos, s.radii)))
    states = init_many(jax.random.split(k_init, n_states))
    frames = [np.asarray(render_many(states))] * W
    actions_hist = np.zeros((n_states, W), np.int32)
    n_walk = W + 4
    for t in range(n_walk):
        a = jax.random.randint(jax.random.fold_in(k_walk, t), (n_states,),
                               0, A)
        states, _ = step_many(states, a)
        actions_hist[:, -1] = np.asarray(a)
        frames.append(np.asarray(render_many(states)))
        actions_hist = np.concatenate(
            [actions_hist, np.zeros((n_states, 1), np.int32)], 1)

    window = np.stack(frames[-W:], axis=1)                     # (N, W, H, W)
    inf = model.infer(params, normalize_frames(jnp.asarray(window)),
                      jnp.asarray(actions_hist[:, -W:]), k_inf)
    z = inf.z_mean[:, -1]                                      # (N, O, D)

    # ---- CRN rollout futures: same action sequences for true and model
    root_acts = np.tile(np.arange(A, dtype=np.int32), n_states)   # (N*A,)
    seqs = np.asarray(jax.random.randint(
        k_act, (n_states, A, S, H), 0, A), np.int32)

    disc = cfg.mcts_discount ** np.arange(H)

    # true branch values + per-depth true rewards
    st_rep = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, A, axis=0), states)            # (N*A, ...)
    st1, r0_true = step_many(st_rep, jnp.asarray(root_acts))
    st_roll = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, S, axis=0), st1)               # (N*A*S, ...)
    true_rews = np.zeros((n_states * A * S, H), np.float32)
    cur = st_roll
    flat_seqs = seqs.reshape(n_states * A * S, H)
    for h in range(H):
        cur, r = step_many(cur, jnp.asarray(flat_seqs[:, h]))
        true_rews[:, h] = np.asarray(r)
    true_vals = (np.asarray(r0_true).reshape(n_states, A)
                 + cfg.mcts_discount
                 * (true_rews @ disc).reshape(n_states, A, S).mean(-1))

    # model branch values (same CRN action sequences)
    from stove_tpu.planning.simulators import LearnedSimulator
    sim = LearnedSimulator(model, params)
    z_rep = jnp.repeat(z, A, axis=0)
    z1, r0_model = sim.step(z_rep, jnp.asarray(root_acts), k_roll)
    z_roll = jnp.repeat(z1, S, axis=0)
    mod_rews = np.zeros((n_states * A * S, H), np.float32)
    cur = z_roll
    for h in range(H):
        cur, r = sim.step(cur, jnp.asarray(flat_seqs[:, h]),
                          jax.random.fold_in(k_roll, h + 1))
        mod_rews[:, h] = np.asarray(r)
    model_vals = (np.asarray(r0_model).reshape(n_states, A)
                  + cfg.mcts_discount
                  * (mod_rews @ disc).reshape(n_states, A, S).mean(-1))

    # ---- metrics
    def spearman(a, b):
        ra = np.argsort(np.argsort(a, -1), -1).astype(float)
        rb = np.argsort(np.argsort(b, -1), -1).astype(float)
        ra -= ra.mean(-1, keepdims=True)
        rb -= rb.mean(-1, keepdims=True)
        num = (ra * rb).sum(-1)
        den = np.sqrt((ra ** 2).sum(-1) * (rb ** 2).sum(-1)) + 1e-12
        return num / den

    best_true = true_vals.max(-1)
    pick_model = true_vals[np.arange(n_states), model_vals.argmax(-1)]
    regret = best_true - pick_model
    # regret of a uniformly random root action, for scale
    regret_rand = best_true - true_vals.mean(-1)
    rho = spearman(model_vals, true_vals)
    auc_depth = [float(np.asarray(binary_auc(
        jnp.asarray(mod_rews[:, h]), jnp.asarray(true_rews[:, h]))))
        for h in range(H)]
    auc0 = float(np.asarray(binary_auc(
        jnp.asarray(np.asarray(r0_model)),
        jnp.asarray(np.asarray(r0_true, np.float32)))))

    out = {
        "run": run, "n_states": n_states, "samples": S, "horizon": H,
        "mean_regret_per_step": float(regret.mean()),
        "mean_regret_random_root": float(regret_rand.mean()),
        "regret_ratio_vs_random": float(regret.mean()
                                        / max(regret_rand.mean(), 1e-9)),
        "spearman_mean": float(rho.mean()),
        "reward_auc_root": auc0,
        "reward_auc_per_depth": auc_depth,
    }
    with open(f"runs/plan_branch_diag_{name}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
