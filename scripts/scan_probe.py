"""Decompose the posterior-scan cost on TPU: full infer grad vs
dynamics-MLP-only scan vs posterior-algebra-only scan (round-2 MFU hunt)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stove_tpu.config import Config
from stove_tpu.models import dynamics as dyn_lib
from stove_tpu.models import stove as stove_lib
from stove_tpu.ops import gaussians

cfg = Config()
specs = stove_lib.make_specs(jax.random.key(0), cfg)
params = stove_lib.init_params(jax.random.key(1), cfg, specs)
B, T, O = 1024, cfg.window, cfg.num_obj
frames = jax.random.uniform(jax.random.key(2), (B, T, 32, 32))
z0 = 0.1 * jax.random.normal(jax.random.key(3), (B, O, cfg.full_state_dim))


def timeit(f, *a, iters=10):
    jax.block_until_ready(f(*a))
    t = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t) / iters * 1e3


g_inf = jax.jit(jax.grad(lambda p, f: jnp.sum(
    stove_lib.infer(p, cfg, specs, f, None, jax.random.key(5)).z)))
print("infer_grad_ms", round(timeit(g_inf, params, frames), 2), flush=True)


def dyn_scan(p, z):
    def body(zc, _):
        out = dyn_lib.apply(p["dynamics"], cfg, zc, None)
        return out.mean, jnp.sum(out.std)
    zf, s = jax.lax.scan(body, z, None, length=T - 2)
    return jnp.sum(zf) + jnp.sum(s)


g_dyn = jax.jit(jax.grad(dyn_scan))
print("dyn_scan_grad_ms", round(timeit(g_dyn, params, z0), 2), flush=True)

sup_mean = jax.random.uniform(jax.random.key(6), (T - 2, B, O, 4))
sup_std = 0.1 + 0.1 * jax.random.uniform(jax.random.key(7), (T - 2, B, O, 4))


def alg_scan(z):
    def body(carry, x):
        zp, pm, ps = carry
        d_mean = zp + 0.01
        d_std = jnp.zeros_like(zp) + 0.1
        sm, ss = stove_lib.align_slots(d_mean[..., 2:4], x[0][..., 2:4],
                                       x[0], x[1])
        qm, qs = gaussians.product(sm[..., 2:4], ss[..., 2:4],
                                   d_mean[..., 2:4], d_std[..., 2:4])
        zt = zp.at[..., 2:4].set(qm)
        lp = jnp.sum(gaussians.log_prob(zt, d_mean, d_std), (-2, -1))
        return (zt, sm[..., 2:4], ss[..., 2:4]), jnp.sum(lp)
    _, out = jax.lax.scan(
        body, (z, z[..., :2] * 0, z[..., :2] * 0 + 1), (sup_mean, sup_std))
    return jnp.sum(out)


g_alg = jax.jit(jax.grad(alg_scan))
print("algebra_scan_grad_ms", round(timeit(g_alg, z0), 2), flush=True)
print("SCANPROBE_DONE", flush=True)
