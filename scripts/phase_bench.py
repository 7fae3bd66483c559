"""Per-phase train-step timing on the TPU (VERDICT round-1 item 4: find the
top time sinks in the ~3%-MFU ELBO step).

Times forward+backward of each phase in isolation with chained jitted
iterations (the axon tunnel's per-dispatch latency would otherwise dominate):

  encode     — encoder CNN over B·T frames
  glimpse    — spatial-transformer patch extraction (+ coverage chain)
  obj_spn    — object SPN log-lik over B·T·O patches
  bg_spn     — background SPN log-lik over B·T frames
  likelihood — full SuPAIR likelihood (glimpse + both SPNs + overlap chain)
  scan       — the t-recursion (dynamics + posterior algebra), encoder fixed
  full       — the whole ELBO step (sum of parts + optimizer ≈ this)

Writes runs/phase_bench.json.
"""

import json
import os
import resource
import time

import jax
import jax.numpy as jnp

# Address-space ceiling: the round-5 run of this bench was OOM-KILLED by
# the kernel (130 GB anon RSS on a 125 GB host) while compiling the grad
# of the fused pallas likelihood at B=1024 — losing every row after
# likelihood_fwd_ms for the second round running.  With a hard rlimit the
# allocation fails INSIDE the process as MemoryError/bad_alloc, the arm's
# try/except records the failure, and the remaining arms still run.
_AS_LIMIT = int(os.environ.get("PB_AS_GB", "96")) << 30
resource.setrlimit(resource.RLIMIT_AS, (_AS_LIMIT, _AS_LIMIT))

B = int(os.environ.get("PB_BATCH", "1024"))
ITERS = int(os.environ.get("PB_ITERS", "10"))
RESULTS_PATH = os.path.join(os.path.dirname(__file__), "..", "runs",
                            "phase_bench.json")
RESULTS = {}


def record(key, value):
    RESULTS[key] = value
    with open(RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"[phase] {key}: {value}", flush=True)


def timeit(grad_fn, params, *args):
    """Mean seconds per grad call, ITERS chained inside one jit."""
    def chained(p, *a):
        def body(carry, _):
            g = grad_fn(jax.tree_util.tree_map(
                lambda x: x + 1e-30 * carry, p), *a)
            leaves = jax.tree_util.tree_leaves(g)
            s = sum(jnp.sum(l) for l in leaves) * 1e-30
            return carry + s, None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return out

    run = jax.jit(chained)
    run(params, *args).block_until_ready()
    t = time.time()
    run(params, *args).block_until_ready()
    return (time.time() - t) / ITERS


def main():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from stove_tpu.config import Config
    from stove_tpu.models import stove as stove_lib
    from stove_tpu.models import supair as supair_lib
    from stove_tpu.models import spn as spn_lib
    from stove_tpu.ops import glimpse as glimpse_lib

    cfg = Config().with_overrides(
        spn_impl=os.environ.get("PB_SPN", "dense"),  # match repo default
        encoder_space_to_depth=int(os.environ.get("PB_S2D", "1")),
        overlap_impl=os.environ.get("PB_OVERLAP", "patch"))
    specs = stove_lib.make_specs(jax.random.key(0), cfg)
    params = stove_lib.init_params(jax.random.key(1), cfg, specs)
    T, O, P = cfg.window, cfg.num_obj, cfg.patch_size
    record("config", f"B={B} T={T} impl={cfg.spn_impl} iters={ITERS}")

    # Resolve the pallas gate HERE, outside any trace, and record the
    # decision — the 08:46 run consulted it first from inside a jit
    # trace, the probe raised, and every "pallas" arm silently measured
    # the dense fallback (likelihood_pallas_maxerr == 0.0 exactly).
    record("pallas_gate", bool(supair_lib._pallas_available()))

    frames = jax.random.uniform(jax.random.key(2),
                                (B, T, cfg.img_size, cfg.img_size))
    flat = frames.reshape(B * T, cfg.img_size, cfg.img_size)
    boxes = jnp.tile(jnp.array([0.24, 0.24, 0.1, -0.1]), (B * T, O, 1))
    patches = jax.random.uniform(jax.random.key(3), (B * T * O, P * P))
    pweights = jnp.ones((B * T * O, P * P))

    # encode
    enc = jax.grad(lambda p, f: jnp.sum(
        supair_lib.encode(p["supair"], cfg, f)[0]))
    record("encode_ms", round(1e3 * timeit(enc, params, flat), 2))

    # glimpse extraction alone (grad w.r.t. boxes — the trained path)
    gl = jax.grad(lambda b, f: jnp.sum(
        glimpse_lib.extract_glimpses(f, b, P)))
    record("glimpse_ms", round(1e3 * timeit(gl, boxes, flat), 2))

    # obj spn
    if cfg.spn_impl == "dense":
        spn_fn = spn_lib.spn_log_prob
    else:
        spn_fn = spn_lib.spn_log_prob_matmul
    obj = jax.grad(lambda p, x, w: jnp.sum(
        spn_fn(specs.supair.obj, p["supair"]["obj_spn"], x, w)))
    record("obj_spn_ms", round(1e3 * timeit(obj, params, patches,
                                            pweights), 2))

    # bg spn
    bg = jax.grad(lambda p, x: jnp.sum(
        spn_fn(specs.supair.bg, p["supair"]["bg_spn"], x,
               jnp.ones_like(x))))
    record("bg_spn_ms", round(1e3 * timeit(
        bg, params, flat.reshape(B * T, -1)), 2))

    # full likelihood (forward+backward, and forward alone — the fused
    # kernel replaces only the forward; the VJP re-runs the dense path)
    lik = jax.grad(lambda p, f, b: jnp.sum(supair_lib.likelihood(
        p["supair"], cfg, specs.supair, f, b)))
    record("likelihood_ms", round(1e3 * timeit(lik, params, flat, boxes), 2))
    lik_f = lambda p, f, b: jnp.sum(supair_lib.likelihood(
        p["supair"], cfg, specs.supair, f, b)) * jnp.ones(())
    record("likelihood_fwd_ms",
           round(1e3 * timeit(lik_f, params, flat, boxes), 2))

    # posterior scan alone: fwd+bwd and fwd-only, XLA vs fused kernel
    T2, O, D = T - 2, cfg.num_obj, cfg.full_state_dim
    ks = jax.random.split(jax.random.key(11), 8)
    z1 = 0.1 * jax.random.normal(ks[0], (B, O, D))
    cm = 0.1 * jax.random.normal(ks[1], (B, O, 2))
    cs = 0.1 + 0.1 * jax.random.uniform(ks[2], (B, O, 2))
    smn = 0.3 * jax.random.normal(ks[3], (B, T2, O, 4))
    sst = 0.05 + 0.1 * jax.random.uniform(ks[4], (B, T2, O, 4))
    acts = jax.random.randint(ks[5], (B, T2), 0, cfg.num_actions)
    eps = jax.random.normal(ks[6], (B, T2, O, D))

    def scan_loss(p, impl):
        z, zm, kl, rew = stove_lib.scan_posterior(
            p["dynamics"], cfg.with_overrides(scan_impl=impl), z1, cm, cs,
            smn, sst, acts, eps)
        return (jnp.sum(z) * 1e-6 + jnp.sum(zm) * 1e-6 + jnp.sum(kl)
                + jnp.sum(rew))

    record("scan_xla_ms", round(1e3 * timeit(
        jax.grad(lambda p: scan_loss(p, "xla")), params), 2))
    record("scan_xla_fwd_ms", round(1e3 * timeit(
        lambda p: scan_loss(p, "xla"), params), 2))

    # full elbo — the dense profile of record; measured BEFORE any fused
    # arm so a kernel-compile incident can never lose it again
    full = jax.grad(lambda p, f: stove_lib.elbo(
        p, cfg, specs, f, None, None, jax.random.key(7)).loss)
    t_full = timeit(full, params, frames)
    record("full_elbo_ms", round(1e3 * t_full, 2))
    record("windows_per_sec", round(B / t_full, 1))

    # ---- fused-kernel arms (VERDICT r4 task 3), riskiest LAST ----
    if os.environ.get("PB_PALLAS_SCAN", "1") == "1":
        try:
            import stove_tpu.models.supair as _sup
            if _sup._pallas_available():
                record("attempting", "scan_pallas")
                record("scan_pallas_ms", round(1e3 * timeit(
                    jax.grad(lambda p: scan_loss(p, "pallas")), params), 2))
                record("scan_pallas_fwd_ms", round(1e3 * timeit(
                    lambda p: scan_loss(p, "pallas"), params), 2))
        except Exception as e:
            record("scan_pallas_error", f"{type(e).__name__}: {e}")

    if os.environ.get("PB_PALLAS_SCAN", "1") == "1":
        try:
            import stove_tpu.models.supair as _sup
            if _sup._pallas_available():
                record("attempting", "full_elbo_pallas_scan")
                cfg_s = cfg.with_overrides(scan_impl="pallas")
                full_s = jax.grad(lambda p, f: stove_lib.elbo(
                    p, cfg_s, specs, f, None, None,
                    jax.random.key(7)).loss)
                t_fs = timeit(full_s, params, frames)
                record("full_elbo_pallas_scan_ms", round(1e3 * t_fs, 2))
                record("windows_per_sec_pallas_scan", round(B / t_fs, 1))
        except Exception as e:
            record("full_elbo_pallas_scan_error",
                   f"{type(e).__name__}: {e}")

    # fused whole-likelihood kernel arms — this grad compile is the one
    # that blew past 130 GB host RSS in the r5 run; it runs LAST, behind
    # the rlimit, with a breadcrumb row so a hard death is attributable
    if (os.environ.get("PB_PALLAS_LIK", "1") == "1"
            and supair_lib._pallas_available()):
        try:
            cfg_p = cfg.with_overrides(likelihood_impl="pallas")
            lik_pf = lambda p, f, b: jnp.sum(supair_lib.likelihood(
                p["supair"], cfg_p, specs.supair, f, b)) * jnp.ones(())
            record("attempting", "likelihood_pallas_fwd")
            record("likelihood_pallas_fwd_ms",
                   round(1e3 * timeit(lik_pf, params, flat, boxes), 2))
            # numerical sanity on-device (bf16 MXU passes both paths)
            a = supair_lib.likelihood(params["supair"], cfg, specs.supair,
                                      flat[:256], boxes[:256])
            b = supair_lib.likelihood(params["supair"], cfg_p, specs.supair,
                                      flat[:256], boxes[:256])
            record("likelihood_pallas_maxerr",
                   float(jnp.max(jnp.abs(a - b))))
            record("attempting", "likelihood_pallas_grad")
            lik_p = jax.grad(lambda p, f, b: jnp.sum(supair_lib.likelihood(
                p["supair"], cfg_p, specs.supair, f, b)))
            record("likelihood_pallas_ms",
                   round(1e3 * timeit(lik_p, params, flat, boxes), 2))
        except Exception as e:
            record("likelihood_pallas_error", f"{type(e).__name__}: {e}")
        try:
            record("attempting", "full_elbo_pallas")
            specs_p = stove_lib.make_specs(jax.random.key(0), cfg_p)
            full_p = jax.grad(lambda p, f: stove_lib.elbo(
                p, cfg_p, specs_p, f, None, None, jax.random.key(7)).loss)
            t_fp = timeit(full_p, params, frames)
            record("full_elbo_pallas_ms", round(1e3 * t_fp, 2))
            record("windows_per_sec_pallas", round(B / t_fp, 1))
            # both fused paths together
            record("attempting", "full_elbo_pallas_both")
            cfg_b = cfg.with_overrides(scan_impl="pallas",
                                       likelihood_impl="pallas")
            full_b = jax.grad(lambda p, f: stove_lib.elbo(
                p, cfg_b, specs_p, f, None, None, jax.random.key(7)).loss)
            t_fb = timeit(full_b, params, frames)
            record("full_elbo_pallas_both_ms", round(1e3 * t_fb, 2))
            record("windows_per_sec_pallas_both", round(B / t_fb, 1))
        except Exception as e:
            record("full_elbo_pallas_error", f"{type(e).__name__}: {e}")

    record("attempting", "done")
    print("[phase] DONE", flush=True)


if __name__ == "__main__":
    main()
