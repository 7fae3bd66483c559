"""Staged on-silicon Pallas/Mosaic probe through the axon TPU tunnel.

Round-1 finding: Mosaic kernels appeared to hang over the tunnel, so the
fused SPN kernel (ops/pallas_spn.py) shipped with interpret-mode evidence
only (VERDICT.md "What's missing" #1).  This probe re-tests with the
remote-compile path (PALLAS_AXON_REMOTE_COMPILE=1), staged from trivial to
the real kernel, writing incremental evidence to runs/pallas_probe.json so
a hang at stage N still leaves stages < N on record.

Run as a single foreground process and let it exit on its own — killing a
process mid-TPU-op wedges the tunnel backend for ~50 min.

Stages:
  0. plain XLA op on the TPU (tunnel sanity + baseline dispatch latency)
  1a. AOT lower+compile of a trivial pallas kernel (isolates Mosaic compile)
  1b. execute the trivial kernel
  2. MXU matmul pallas kernel
  3. real fused SPN kernel vs dense XLA path (correctness, obj-SPN size)
  4. benchmark fused vs dense SPN forward (obj + bg sizes)
"""

import json
import os
import sys
import time

RESULTS_PATH = os.path.join(os.path.dirname(__file__), "..", "runs",
                            "pallas_probe.json")
RESULTS = {}


def record(key, value):
    RESULTS[key] = value
    os.makedirs(os.path.dirname(RESULTS_PATH), exist_ok=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"[probe] {key}: {value}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    skip_to = int(os.environ.get("PROBE_SKIP_TO", "0"))

    t0 = time.time()
    devs = jax.devices()
    record("platform", f"{devs[0].platform} x{len(devs)}")
    record("jax_version", jax.__version__)

    # ---- stage 0: plain XLA --------------------------------------------
    x = jnp.ones((8, 128), jnp.float32)
    y = jax.jit(lambda a: a * 2.0)(x)
    y.block_until_ready()
    record("stage0_xla_s", round(time.time() - t0, 2))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if skip_to <= 2:
        def trivial(i_ref, o_ref):
            o_ref[:] = i_ref[:] * 2.0

        call = pl.pallas_call(
            trivial,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        # ---- stage 1a: AOT compile (no execution) ----------------------
        t = time.time()
        print("[probe] stage1a lower+compile START", flush=True)
        compiled = jax.jit(call).lower(x).compile()
        record("stage1a_compile_s", round(time.time() - t, 2))

        # ---- stage 1b: execute ------------------------------------------
        t = time.time()
        print("[probe] stage1b execute START", flush=True)
        out = compiled(x)
        out.block_until_ready()
        record("stage1b_execute_s", round(time.time() - t, 2))
        record("stage1_correct", bool(jnp.allclose(out, 2.0)))

        # ---- stage 2: MXU matmul kernel ---------------------------------
        def mm(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=jnp.float32)

        a = jax.random.normal(jax.random.key(0), (128, 256), jnp.float32)
        b = jax.random.normal(jax.random.key(1), (256, 128), jnp.float32)
        t = time.time()
        print("[probe] stage2 matmul START", flush=True)
        o = pl.pallas_call(
            mm,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        o.block_until_ready()
        record("stage2_matmul_s", round(time.time() - t, 2))
        record("stage2_correct",
               bool(jnp.allclose(o, a @ b, rtol=3e-2, atol=3e-2)))

    # ---- stage 3: real fused SPN kernel vs dense ------------------------
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from stove_tpu.config import Config
    from stove_tpu.models import spn as spn_lib
    from stove_tpu.ops.pallas_spn import spn_log_prob_fused

    cfg = Config()
    spec = spn_lib.make_spec(
        jax.random.key(2), cfg.patch_size ** 2, cfg.obj_spn_depth,
        cfg.obj_spn_num_sums, cfg.obj_spn_num_leaves,
        cfg.obj_spn_repetitions, min_std=cfg.leaf_min_std,
        max_std=cfg.leaf_max_std)
    params = spn_lib.init_params(jax.random.key(3), spec)
    B, V = 256, cfg.patch_size ** 2
    xx = jax.random.uniform(jax.random.key(4), (B, V))
    ww = jnp.ones((B, V))
    t = time.time()
    print("[probe] stage3 fused SPN START", flush=True)
    fused = jax.jit(lambda p, x, w: spn_log_prob_fused(spec, p, x, w))(
        params, xx, ww)
    fused.block_until_ready()
    record("stage3_fused_spn_s", round(time.time() - t, 2))
    dense = jax.jit(lambda p, x, w: spn_lib.spn_log_prob(spec, p, x, w))(
        params, xx, ww)
    err = float(jnp.max(jnp.abs(fused - dense)))
    rel = float(jnp.max(jnp.abs(fused - dense)
                        / (jnp.abs(dense) + 1.0)))
    record("stage3_max_abs_err", err)
    record("stage3_max_rel_err", rel)
    record("stage3_correct", rel < 1e-3)

    # ---- stage 4: benchmark fused vs dense ------------------------------
    def bench(fn, params_, x_, w_, iters=200):
        """Per-call device time: chain `iters` calls inside ONE jit so the
        axon tunnel's ~2 ms per-dispatch latency is amortized away (a naive
        python loop measures the tunnel, not the chip).  The 1e-30·carry
        feedback defeats constant folding / loop-invariant hoisting without
        perturbing values."""
        def chained(p, x, w):
            def body(carry, _):
                out = fn(p, x + 1e-30 * carry[:, None], w)
                return out[:x.shape[0]], None
            z0 = jnp.zeros((x.shape[0],), x.dtype)
            final, _ = jax.lax.scan(body, z0, None, length=iters)
            return final

        run = jax.jit(chained)
        run(params_, x_, w_).block_until_ready()  # warm-up / compile
        t = time.time()
        r = run(params_, x_, w_)
        r.block_until_ready()
        return (time.time() - t) / iters

    sizes = {"obj": (4096, cfg.patch_size ** 2, spec, params)}
    bg_spec = spn_lib.make_spec(
        jax.random.key(5), cfg.img_size ** 2, cfg.bg_spn_depth,
        cfg.bg_spn_num_sums, cfg.bg_spn_num_leaves, cfg.bg_spn_repetitions,
        min_std=cfg.leaf_min_std, max_std=cfg.leaf_max_std)
    bg_params = spn_lib.init_params(jax.random.key(6), bg_spec)
    sizes["bg"] = (2048, cfg.img_size ** 2, bg_spec, bg_params)

    tile_sweep = {"obj": (128, 512, 1024), "bg": (128, 256)}
    for name, (Bb, Vv, sp, pp) in sizes.items():
        xb = jax.random.uniform(jax.random.key(7), (Bb, Vv))
        wb = jnp.ones((Bb, Vv))
        best_tf, best_tile = None, None
        for tile in tile_sweep[name]:
            f_fused = lambda p, x, w, sp=sp, tl=tile: spn_log_prob_fused(
                sp, p, x, w, tile=tl)
            tf = bench(f_fused, pp, xb, wb)
            record(f"stage4_{name}_fused_t{tile}_us", round(tf * 1e6, 1))
            if best_tf is None or tf < best_tf:
                best_tf, best_tile = tf, tile
        f_dense = lambda p, x, w, sp=sp: spn_lib.spn_log_prob(sp, p, x, w)
        td = bench(f_dense, pp, xb, wb)
        f_mm = lambda p, x, w, sp=sp: spn_lib.spn_log_prob_matmul(
            sp, p, x, w)
        tm = bench(f_mm, pp, xb, wb)
        record(f"stage4_{name}_dense_us_per_call", round(td * 1e6, 1))
        record(f"stage4_{name}_matmul_us_per_call", round(tm * 1e6, 1))
        record(f"stage4_{name}_best_tile", best_tile)
        record(f"stage4_{name}_speedup_fused_over_dense",
               round(td / best_tf, 3))
        record(f"stage4_{name}_speedup_matmul_over_dense",
               round(td / tm, 3))

    record("probe_complete", True)
    print("[probe] DONE", flush=True)


if __name__ == "__main__":
    main()
