"""Probe the fused Pallas rollout kernel on real TPU silicon.

1. compile + numerical parity vs the XLA rollout (mean path), f32 and bf16
2. sampled-path execution + distribution sanity (mean/std of injected noise)
3. throughput at bench shapes (B=16384, H=92) for XLA vs pallas f32/bf16

Writes runs/pallas_rollout_probe.json.
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

OUT = "/root/repo/runs/pallas_rollout_probe.json"
RES = {}


def rec(k, v):
    RES[k] = v
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(f"[probe] {k}: {v}", flush=True)


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
    params["dynamics"]["out"][-1]["w"] = 0.05 * jax.random.normal(
        jax.random.key(5), w.shape)
    rec("device", str(jax.devices()[0]))

    # ---- parity (mean path)
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        try:
            err = pr.self_check(params["dynamics"], cfg, jax.random.key(2),
                                batch=256, horizon=8, dtype=dt)
            rec(f"parity_maxerr_{name}", float(err))
        except Exception as e:
            rec(f"parity_{name}_FAILED", f"{type(e).__name__}: {e}"[:300])
            return

    # ---- sampled path sanity
    try:
        z0 = 0.1 * jax.random.normal(jax.random.key(3), (256, 3, 22))
        s = pr.rollout_pallas(params["dynamics"], cfg, z0, 8, seed=7,
                              sample=True, block=256, dtype=jnp.bfloat16)
        m = pr.rollout_pallas(params["dynamics"], cfg, z0, 8, seed=7,
                              sample=False, block=256, dtype=jnp.bfloat16)
        noise = s[:, 0] - m[:, 0]  # first-step injected noise (pos/vel/lat)
        rec("sampled_noise_mean", float(jnp.mean(noise[..., 4:6])))
        rec("sampled_noise_std_vel", float(jnp.std(noise[..., 4:6])))
    except Exception as e:
        rec("sampled_FAILED", f"{type(e).__name__}: {e}"[:300])

    # ---- throughput at bench shapes
    B, H = 16384, 92
    z0 = 0.1 * jax.random.normal(jax.random.key(4),
                                 (B, cfg.num_obj, cfg.full_state_dim))

    roll_xla = jax.jit(lambda p, z, k: stove_lib.rollout(
        p, cfg, z, None, H, k, sample=True)[0])
    t = timeit(roll_xla, params, z0, jax.random.key(6))
    rec("xla_sampled_fps", round(B * H / t, 0))

    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for blk in (256, 512, 1024):
            try:
                prep = pr.prepare_params(params["dynamics"], cfg, dt)
                fn = lambda pp, z: pr.rollout_states(  # noqa: E731
                    pp, cfg, z, H, 7, True, blk, dt)
                t = timeit(fn, prep, z0)
                rec(f"pallas_sampled_fps_{name}_b{blk}",
                    round(B * H / t, 0))
            except Exception as e:
                rec(f"pallas_{name}_b{blk}_FAILED",
                    f"{type(e).__name__}: {e}"[:300])
    print("[probe] DONE", flush=True)


if __name__ == "__main__":
    main()
