"""Benchmark: STOVE latent rollout throughput (frames/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md "Measurement plan"): the reference (jlko/STOVE)
publishes no throughput numbers and the reference mount was empty, so the
baseline is the CPU-eager rollout of this same implementation — jit disabled,
op-by-op like the PyTorch reference's python rollout loop [ref: stove.py
rollout; SURVEY.md §3.3] — measured on this machine:

    CPU eager, full-size model (O=3, cl=16, h=128), B=256, H=92, sampled:
    1094.7 frames/s   (2026-08-16, this container, jax 0.9.0 CPU)

The benchmark times the jitted `lax.scan` rollout (sampling enabled, the
planner/eval path) on the available accelerator and reports frames/sec/chip.
Re-measure the baseline with `python bench.py --measure-baseline`.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

CPU_EAGER_BASELINE_FPS = 1094.7  # see module docstring
BATCH = 16384  # measured best-scaling batch for the XLA scan (BASELINE.md)
# The fused Pallas kernel keeps scaling past 16384 (per-dispatch overhead
# amortizes over more grid blocks): measured 83.3M fps @ 16384 -> 94.1M @
# 65536 -> 94.6M @ 131072 (saturated) -> OOM @ 262144 on v5e (2026-08-19).
# 65536 is the recorded sweet spot with 2x headroom to the OOM cliff; the
# bench falls back to BATCH if the larger allocation ever fails.
PALLAS_BATCH = 65536
HORIZON = 92


def build():
    from stove_tpu.config import Config
    from stove_tpu.models import stove as stove_lib

    cfg = Config()  # full-size flagship (3-ball billiards STOVE)
    specs = stove_lib.make_specs(jax.random.key(0), cfg)
    params = stove_lib.init_params(jax.random.key(1), cfg, specs)
    return cfg, specs, params, stove_lib


def measure_baseline() -> float:
    cfg, specs, params, stove_lib = build()
    B, H = 256, HORIZON
    z0 = 0.1 * jax.random.normal(
        jax.random.key(2), (B, cfg.num_obj, cfg.full_state_dim))
    with jax.disable_jit():
        t0 = time.perf_counter()
        states, _ = stove_lib.rollout(params, cfg, z0, None, H,
                                      jax.random.key(3), sample=True)
        states.block_until_ready()
        dt = time.perf_counter() - t0
    return B * H / dt


V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e per-chip bf16 peak (public spec)


def bench_train_step(dtype: str, spn_impl: str = "dense",
                     batch: int = 1024, real_data: bool = False) -> dict:
    """Full ELBO train-step throughput (windows/sec) + FLOPs/window + MFU.

    FLOPs come from XLA's own cost analysis of the compiled step; MFU is
    reported against the v5e bf16 peak (a conservative denominator for the
    f32 parts).  Steps are host-dispatched but carry (params, opt_state)
    dependencies, so the device pipeline stays busy; at batch ≥ 1024 the
    axon tunnel's ~1-2 ms dispatch latency is <5% of step time.

    real_data=True samples actual billiards windows (generating the corpus
    if needed): encoder/SPN activation statistics and overlap-chain box
    positions on rendered frames differ from uniform noise, so this mode
    pins the throughput claims to the trained-data distribution (VERDICT
    r2 weak #6).  Default stays synthetic noise so the bench needs no
    dataset.
    """
    import optax

    from stove_tpu.config import Config
    from stove_tpu.models import stove as stove_lib

    cfg = Config().with_overrides(compute_dtype=dtype, spn_impl=spn_impl,
                                  encoder_space_to_depth=2)
    specs = stove_lib.make_specs(jax.random.key(0), cfg)
    params = stove_lib.init_params(jax.random.key(1), cfg, specs)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    B = batch
    if real_data:
        from stove_tpu.envs import data as data_lib
        ep = data_lib.ensure_dataset(cfg, "train")
        frames = data_lib.sample_windows(ep, cfg, jax.random.key(2),
                                         B)["frames"]
    else:
        frames = jax.random.uniform(
            jax.random.key(2), (B, cfg.window, cfg.img_size, cfg.img_size))

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: stove_lib.elbo(p, cfg, specs, frames, None, None,
                                     key).loss)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = step.lower(params, opt_state, jax.random.key(3)).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    params, opt_state, loss = compiled(params, opt_state, jax.random.key(3))
    loss.block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = compiled(params, opt_state,
                                           jax.random.key(i))
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    wps = iters * B / dt
    flops_per_window = flops / B
    achieved = wps * flops_per_window
    return {
        "windows_per_sec": wps,
        "flops_per_window": flops_per_window,
        "achieved_tflops": achieved / 1e12,
        "mfu_vs_bf16_peak": achieved / V5E_BF16_PEAK_FLOPS,
    }


def main() -> int:
    if "--measure-baseline" in sys.argv:
        fps = measure_baseline()
        print(f"CPU eager baseline: {fps:.1f} frames/s")
        return 0

    if "--train" in sys.argv:
        batch = 1024
        for a in sys.argv:
            if a.startswith("--batch="):
                batch = int(a.split("=")[1])
        real = "--real-data" in sys.argv
        impls = (("float32", "dense"), ("float32", "matmul"),
                 ("bfloat16", "dense"))
        if "--quick" in sys.argv:
            impls = (("float32", "dense"),)
        for dtype, impl in impls:
            m = bench_train_step(dtype, impl, batch, real_data=real)
            print(f"train step ({dtype}, spn={impl}, B={batch}"
                  f"{', real-data' if real else ''}): "
                  f"{m['windows_per_sec']:.1f} windows/s | "
                  f"{m['flops_per_window'] / 1e6:.1f} MFLOP/window | "
                  f"{m['achieved_tflops']:.2f} TFLOP/s | "
                  f"MFU {100 * m['mfu_vs_bf16_peak']:.2f}% of bf16 peak")
        return 0

    cfg, specs, params, stove_lib = build()
    n_chips = max(1, len(jax.devices()))
    B, H = BATCH, HORIZON
    z0 = 0.1 * jax.random.normal(
        jax.random.key(2), (B, cfg.num_obj, cfg.full_state_dim))

    roll = jax.jit(lambda p, z, k: stove_lib.rollout(
        p, cfg, z, None, H, k, sample=True))
    # warm-up / compile
    roll(params, z0, jax.random.key(3))[0].block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        states, _ = roll(params, z0, jax.random.key(4 + i))
    states.block_until_ready()
    dt = time.perf_counter() - t0
    fps_per_chip = iters * B * H / dt / n_chips
    print(f"xla rollout: {fps_per_chip:,.0f} frames/s/chip")

    # Fused Pallas whole-horizon rollout (ops/pallas_rollout.py): gated on
    # an on-machine numerical parity check with NON-trivial weights (the
    # init net is identity-flow, which would pass vacuously), with fallback
    # to the XLA number on any failure.
    if "--no-pallas" not in sys.argv:
        try:
            from stove_tpu.ops import pallas_rollout as pr

            pert = jax.tree_util.tree_map(lambda x: x, params)
            w = pert["dynamics"]["out"][-1]["w"]
            pert["dynamics"]["out"][-1]["w"] = 0.01 * jax.random.normal(
                jax.random.key(9), w.shape)
            err = pr.self_check(pert["dynamics"], cfg, jax.random.key(10),
                                batch=256, horizon=8, dtype=jnp.float32)
            print(f"pallas f32 self-check max err (8 steps): {err:.5f}")
            if err < 2e-3:
                # bf16 is the perf path (f32 = 3-pass matmuls, measured
                # 3.5x slower); blocks beyond 1024 overflow VMEM on v5e.
                # Batch PALLAS_BATCH amortizes per-dispatch overhead over
                # more grid blocks (see the constant's comment); every
                # (batch, block) combo is guarded so one failure — e.g. an
                # HBM OOM at the large batch — falls back instead of
                # dropping the headline.
                best = None
                prep = pr.prepare_params(params["dynamics"], cfg,
                                         jnp.bfloat16)
                for pb in (PALLAS_BATCH, BATCH):
                    try:
                        zb = z0 if pb == B else 0.1 * jax.random.normal(
                            jax.random.key(2),
                            (pb, cfg.num_obj, cfg.full_state_dim))
                    except Exception:
                        continue
                    done = False
                    for blk in (1024, 512):
                        if pb % blk:
                            continue
                        try:
                            fn = lambda s: pr.rollout_states(  # noqa: E731
                                prep, cfg, zb, H, s, True, blk,
                                jnp.bfloat16)
                            fn(3).block_until_ready()
                            t0 = time.perf_counter()
                            for i in range(iters):
                                out = fn(4 + i)
                            out.block_until_ready()
                            fps = (iters * pb * H
                                   / (time.perf_counter() - t0) / n_chips)
                            print(f"pallas rollout (bf16, B={pb}, "
                                  f"block {blk}): {fps:,.0f} frames/s/chip")
                            best = max(best or 0.0, fps)
                            done = True
                            break  # largest working block wins
                        except Exception as e:
                            print(f"pallas B={pb} block {blk} failed "
                                  f"({type(e).__name__}); trying smaller")
                    if done:
                        break  # largest working batch wins
                if best and best > fps_per_chip:
                    fps_per_chip = best
        except Exception as e:  # headline must never fail on the probe
            print(f"pallas path unavailable ({type(e).__name__}: "
                  f"{str(e)[:120]}); using XLA number")

    print(json.dumps({
        "metric": "rollout_frames_per_sec_per_chip",
        "value": round(fps_per_chip, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / CPU_EAGER_BASELINE_FPS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
