"""Second-stage probe for the fused rollout kernel (post-fix validation).

1. parity of the TRUE-f32 kernel vs the f32-precision XLA rollout (the
   first probe compared against XLA's default single-pass-bf16 dots and
   measured their noise, not the kernel's)
2. block 2048/4096 timings (block 1024 was still scaling in probe 1)
3. short-horizon (H=8, B=2048) timing — the MCTS leaf-evaluation shape

Writes runs/pallas_rollout_probe2.json.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from stove_tpu.config import Config  # noqa: E402
from stove_tpu.models import stove as stove_lib  # noqa: E402
from stove_tpu.ops import pallas_rollout as pr  # noqa: E402

OUT = "/root/repo/runs/pallas_rollout_probe2.json"
RES = {}


def rec(k, v):
    RES[k] = v
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(f"[probe2] {k}: {v}", flush=True)


def timeit(fn, *args, iters=5):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    cfg = Config()
    specs = stove_lib.make_specs(jax.random.key(0), cfg)
    params = stove_lib.init_params(jax.random.key(1), cfg, specs)
    w = params["dynamics"]["out"][-1]["w"]
    params["dynamics"]["out"][-1]["w"] = 0.01 * jax.random.normal(
        jax.random.key(5), w.shape)
    rec("device", str(jax.devices()[0]))

    try:
        err = pr.self_check(params["dynamics"], cfg, jax.random.key(2),
                            batch=256, horizon=8, dtype=jnp.float32)
        rec("parity_f32_vs_f32xla", float(err))
        err16 = pr.self_check(params["dynamics"], cfg, jax.random.key(2),
                              batch=256, horizon=8, dtype=jnp.bfloat16)
        rec("parity_bf16_vs_f32xla", float(err16))
    except Exception as e:
        rec("parity_FAILED", f"{type(e).__name__}: {e}"[:300])
        return

    B, H = 16384, 92
    z0 = 0.1 * jax.random.normal(jax.random.key(4),
                                 (B, cfg.num_obj, cfg.full_state_dim))
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        prep = pr.prepare_params(params["dynamics"], cfg, dt)
        for blk in (1024, 2048, 4096):
            try:
                fn = lambda pp, z: pr.rollout_states(  # noqa: E731
                    pp, cfg, z, H, 7, True, blk, dt)
                t = timeit(fn, prep, z0)
                rec(f"fps_{name}_b{blk}", round(B * H / t, 0))
            except Exception as e:
                rec(f"fps_{name}_b{blk}_FAILED",
                    f"{type(e).__name__}: {e}"[:200])

    # action+reward kernel (the MCTS leaf path): parity + timing
    cfg_a = Config().with_overrides(task="avoidance",
                                    action_conditioned=True,
                                    reward_head=True)
    specs_a = stove_lib.make_specs(jax.random.key(0), cfg_a)
    params_a = stove_lib.init_params(jax.random.key(1), cfg_a, specs_a)
    wa = params_a["dynamics"]["out"][-1]["w"]
    params_a["dynamics"]["out"][-1]["w"] = 0.01 * jax.random.normal(
        jax.random.key(5), wa.shape)
    try:
        Ba, Ha = 2048, 8
        za = 0.1 * jax.random.normal(
            jax.random.key(6), (Ba, cfg_a.num_obj, cfg_a.full_state_dim))
        aa = jax.random.randint(jax.random.key(7), (Ba, Ha), 0,
                                cfg_a.num_actions)
        with jax.default_matmul_precision("float32"):
            ref_s, ref_r = stove_lib.rollout(params_a, cfg_a, za, aa, Ha,
                                             jax.random.key(8),
                                             sample=False)
            ref_r = ref_r.block_until_ready()
        prep_a = pr.prepare_params(params_a["dynamics"], cfg_a,
                                   jnp.float32)
        got_s, got_r = pr.rollout_act(prep_a, cfg_a, za, aa, Ha, 0,
                                      sample=False, block=256,
                                      dtype=jnp.float32)
        rec("act_parity_state", float(jnp.max(jnp.abs(got_s - ref_s))))
        rec("act_parity_reward", float(jnp.max(jnp.abs(got_r - ref_r))))
        prep16 = pr.prepare_params(params_a["dynamics"], cfg_a,
                                   jnp.bfloat16)
        t = timeit(lambda pp, z, a: pr.rollout_act(
            pp, cfg_a, z, a, Ha, 7, True, 256, jnp.bfloat16)[1],
            prep16, za, aa)
        rec("act_kernel_b2048_h8_ms", round(1e3 * t, 3))
        roll_xla_a = jax.jit(lambda p, z, a, k: stove_lib.rollout(
            p, cfg_a, z, a, Ha, k, sample=True)[1])
        t = timeit(roll_xla_a, params_a, za, aa, jax.random.key(9))
        rec("act_xla_b2048_h8_ms", round(1e3 * t, 3))
    except Exception as e:
        rec("act_FAILED", f"{type(e).__name__}: {e}"[:300])

    # MCTS leaf-eval shape: B=2048, H=8 (frontier 32*9=288 leaves x ~7 eps)
    z2 = 0.1 * jax.random.normal(jax.random.key(6),
                                 (2048, cfg.num_obj, cfg.full_state_dim))
    prep16 = pr.prepare_params(params["dynamics"], cfg, jnp.bfloat16)
    t = timeit(lambda pp, z: pr.rollout_states(pp, cfg, z, 8, 7, True,
                                               1024, jnp.bfloat16),
               prep16, z2)
    rec("mcts_shape_b2048_h8_ms", round(1e3 * t, 3))
    roll_xla = jax.jit(lambda p, z, k: stove_lib.rollout(
        p, cfg, z, None, 8, k, sample=True)[0])
    t = timeit(roll_xla, params, z2, jax.random.key(8))
    rec("mcts_shape_xla_ms", round(1e3 * t, 3))
    print("[probe2] DONE", flush=True)


if __name__ == "__main__":
    main()
