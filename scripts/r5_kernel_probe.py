"""Round-5 kernel-time decomposition probe for the fused Pallas rollout.

Times the whole-horizon rollout kernel at the bench shape (B=65536,
block 1024, H=92, bf16) with the noise path on and off, so the Box-Muller
/ PRNG share of the step is measured rather than guessed — the input to
deciding whether a noise-path optimization is worth building.

Writes artifacts/r5/kernel_probe.json.  [ref: SURVEY.md §3.3 — the
rollout loop is the throughput metric; BASELINE.md round-5 batch sweep]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from stove_tpu.config import Config
from stove_tpu.models import stove as stove_lib
from stove_tpu.ops import pallas_rollout as pr

B, BLOCK, H = 65536, 1024, 92
REPS = 10


def timed(fn):
    out = fn()  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main():
    cfg = Config()
    specs = stove_lib.make_specs(jax.random.key(0), cfg)
    params = stove_lib.init_params(jax.random.key(1), cfg, specs)
    z0 = 0.1 * jax.random.normal(
        jax.random.key(2), (B, cfg.num_obj, cfg.full_state_dim))
    prepared = pr.prepare_params(params["dynamics"], cfg)
    seed = jnp.zeros((1,), jnp.int32)

    rows = {}
    for name, kw in (
        ("sampled", dict(sample=True)),
        ("mean", dict(sample=False)),
    ):
        dt = timed(lambda kw=kw: pr.rollout_states(
            prepared, cfg, z0, H, seed, block=BLOCK, **kw))
        rows[name] = {"ms": dt * 1e3, "frames_per_s": B * H / dt}
        print(f"{name:8s}: {dt*1e3:8.2f} ms  "
              f"{B*H/dt/1e6:7.1f}M frames/s")

    noise_share = 1.0 - rows["mean"]["ms"] / rows["sampled"]["ms"]
    print(f"noise-path share of sampled step: {noise_share:.1%}")
    out = {"B": B, "block": BLOCK, "H": H, "reps": REPS,
           "rows": rows, "noise_share_of_sampled": noise_share}
    with open("artifacts/r5/kernel_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
