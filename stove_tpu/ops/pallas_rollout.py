"""Fused Pallas rollout: the whole H-step dynamics rollout in one kernel.

Why: the XLA rollout (`models/stove.py::rollout`) is HBM-bound — each scan
step writes/reads ~0.5 GB of (B·O, h) activations and the (B, O, O, h) pair
tensor, measured ~666 µs/step at B=16k on v5e vs a ~120 µs bf16 MXU FLOP
floor.  This kernel keeps the recurrent state, every activation, and all
weights VMEM-resident for the entire horizon; HBM traffic collapses to z0 in
+ the trajectory out.

Layout (SURVEY §2.1 state): everything is stored TRANSPOSED as
(features, batch_tile) 2-D tiles — feature rows ≤ 128, batch lanes = TB —
so every op is a clean (rows, lanes) tile op and the per-object graph-net
structure unrolls statically (O is 3; no (B,O,O,·) tensor ever exists:
pair activations are recv_o + send_j broadcast adds, one (h, TB) tile per
ordered pair).

Scope: the action-free rollout (billiards/gravity bench + eval path;
reward head not evaluated).  Sampled rollouts draw transition noise from
the on-core PRNG (Box-Muller), injecting the same std the XLA path uses
(std_open when cfg.open_loop_sigma).  Mean rollouts are bit-comparable to
XLA up to matmul precision (kernel matmuls run bf16xbf16→f32 by default;
set dtype=float32 for exact-tolerance tests).

Reference: [ref: model/video_prediction/dynamics.py + stove.py rollout —
SURVEY.md §2, §3.3; mount empty, see SURVEY §0].
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stove_tpu.config import Config

_TWO_PI = 2.0 * math.pi


def prepare_params(dyn_params: Dict, cfg: Config, dtype=jnp.bfloat16) -> Dict:
    """Transpose + cast the dynamics weights for the kernel.

    All weight matrices become (out_features, in_features) in `dtype`
    (bf16 operands, f32 accumulation on the MXU); biases stay f32 as
    (out_features, 1) so they broadcast along batch lanes.
    """
    h = cfg.dyn_hidden

    def wt(layer):
        return jnp.asarray(layer["w"].T, dtype)

    def bt(layer):
        return jnp.asarray(layer["b"][:, None], jnp.float32)

    p = dyn_params
    rel0 = p["rel"][0]
    out = {
        "w_e0": wt(p["embed"][0]), "b_e0": bt(p["embed"][0]),
        "w_e1": wt(p["embed"][1]), "b_e1": bt(p["embed"][1]),
        "w_s0": wt(p["self"][0]), "b_s0": bt(p["self"][0]),
        "w_s1": wt(p["self"][1]), "b_s1": bt(p["self"][1]),
        # first rel layer factored into receiver/sender halves
        "w_recv": jnp.asarray(rel0["w"][:h].T, dtype),
        "w_send": jnp.asarray(rel0["w"][h:].T, dtype),
        "b_r0": bt(rel0),
        "w_r1": wt(p["rel"][1]), "b_r1": bt(p["rel"][1]),
        # last rel layer: h feature columns + 1 attention column
        "w_rf": jnp.asarray(p["rel"][2]["w"][:, :-1].T, dtype),
        "b_rf": jnp.asarray(p["rel"][2]["b"][:-1][:, None], jnp.float32),
        "w_ra": jnp.asarray(p["rel"][2]["w"][:, -1:], jnp.float32),  # (h,1)
        "b_ra": jnp.asarray(p["rel"][2]["b"][-1:], jnp.float32),     # (1,)
        # out layer 0 split into self-/rel-input halves
        "w_o0s": jnp.asarray(p["out"][0]["w"][:h].T, dtype),
        "w_o0r": jnp.asarray(p["out"][0]["w"][h:].T, dtype),
        "b_o0": bt(p["out"][0]),
        "w_o1": wt(p["out"][1]), "b_o1": bt(p["out"][1]),
        "w_o2": wt(p["out"][2]), "b_o2": bt(p["out"][2]),
    }
    return out


_PARAM_ORDER = ("w_e0", "b_e0", "w_e1", "b_e1", "w_s0", "b_s0", "w_s1",
                "b_s1", "w_recv", "w_send", "b_r0", "w_r1", "b_r1", "w_rf",
                "b_rf", "w_ra", "b_ra", "w_o0s", "w_o0r", "b_o0", "w_o1",
                "b_o1", "w_o2", "b_o2")


def _normals(shape):
    """Standard normals from the on-core PRNG via Box-Muller."""
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    # top 24 bits → uniform in [0, 1): exact in f32
    u1 = (b1 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    u2 = (b2 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    u1 = jnp.maximum(u1, 1e-12)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _make_kernel(cfg: Config, horizon: int, TB: int, sample: bool,
                 dtype):
    O = cfg.num_obj
    cl = cfg.cl
    D = 6 + cl                       # per-object state rows
    SD = O * D
    use_open = bool(cfg.open_loop_sigma)
    lo = cfg.min_open_std if use_open else cfg.min_dyn_std
    hi = cfg.max_dyn_std
    size_std = cfg.size_std
    latent_residual = cfg.latent_residual

    # f32 weights → true f32 matmuls (3-pass); otherwise single-pass bf16.
    # Without the explicit precision, Mosaic lowers f32 dots as one bf16
    # MXU pass too (measured: f32 and bf16 kernels ran at the same speed
    # AND the same rounding error) — the f32 variant exists for the parity
    # gate, so it must actually be f32.
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def mm(w_ref, x, b=None, relu=False):
        y = jnp.dot(w_ref[:], x.astype(dtype),
                    preferred_element_type=jnp.float32, precision=prec)
        if b is not None:
            y = y + b[:]
        return jnp.maximum(y, 0.0) if relu else y

    def kernel(seed_ref, z0_ref, *refs):
        params = dict(zip(_PARAM_ORDER, refs[:len(_PARAM_ORDER)]))
        out_ref = refs[len(_PARAM_ORDER)]
        if sample:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        def step(t, z):
            # ---- embed + self core, per object (unrolled; O static)
            es, ss = [], []
            for o in range(O):
                zo = z[D * o:D * (o + 1), :]                   # (D, TB)
                x = mm(params["w_e0"], zo, params["b_e0"], relu=True)
                e = mm(params["w_e1"], x, params["b_e1"])
                es.append(e)
                sx = mm(params["w_s0"], e, params["b_s0"], relu=True)
                ss.append(mm(params["w_s1"], sx, params["b_s1"]))

            # ---- pair cores: recv_o + send_j broadcast adds, no pair tensor
            recv = [mm(params["w_recv"], es[o]) for o in range(O)]
            send = [mm(params["w_send"], es[o]) for o in range(O)]
            rs = []
            for o in range(O):
                acc = None
                for j in range(O):
                    if j == o:
                        continue
                    h1 = jnp.maximum(recv[o] + send[j]
                                     + params["b_r0"][:], 0.0)
                    h2 = mm(params["w_r1"], h1, params["b_r1"], relu=True)
                    feat = mm(params["w_rf"], h2, params["b_rf"])
                    logit = (jnp.sum(h2 * params["w_ra"][:], axis=0,
                                     keepdims=True)
                             + params["b_ra"][0])              # (1, TB)
                    term = feat * jax.nn.sigmoid(logit)
                    acc = term if acc is None else acc + term
                rs.append(acc)

            # ---- output MLP + Euler integration, per object
            zs = []
            for o in range(O):
                g = jnp.maximum(mm(params["w_o0s"], ss[o])
                                + mm(params["w_o0r"], rs[o])
                                + params["b_o0"][:], 0.0)
                g = mm(params["w_o1"], g, params["b_o1"], relu=True)
                out = mm(params["w_o2"], g, params["b_o2"])    # (d_out, TB)

                zo = z[D * o:D * (o + 1), :]
                dv = out[0:2, :]
                dl = out[2:2 + cl, :]
                vel = zo[4:6, :] + dv
                pos = zo[2:4, :] + vel
                lat = (zo[6:, :] + dl) if latent_residual else dl
                mean = jnp.concatenate([zo[0:2, :], pos, vel, lat], axis=0)
                if sample:
                    raw = (out[6 + 2 * cl:10 + 3 * cl, :] if use_open
                           else out[2 + cl:6 + 2 * cl, :])     # (4+cl, TB)
                    std_pvl = lo + (hi - lo) * jax.nn.sigmoid(raw)
                    std = jnp.concatenate(
                        [jnp.full((2, TB), size_std, jnp.float32), std_pvl],
                        axis=0)
                    mean = mean + std * _normals((D, TB))
                zs.append(mean)

            z_next = jnp.concatenate(zs, axis=0)               # (SD, TB)
            out_ref[t] = z_next
            return z_next

        jax.lax.fori_loop(0, horizon, step, z0_ref[:], unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "horizon", "sample",
                                             "block", "dtype", "interpret"))
def rollout_states(prepared: Dict, cfg: Config, z0: jnp.ndarray,
                   horizon: int, seed, sample: bool = True,
                   block: int = 256, dtype=jnp.bfloat16,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused rollout.  z0: (B, O, 6+cl) f32 → states (B, horizon, O, 6+cl).

    Matches `stove.rollout(...)[0]` (mean path exactly up to matmul
    precision; sampled path in distribution — kernel PRNG, not threefry).
    B must be a multiple of `block`.
    """
    B, O, D = z0.shape
    SD = O * D
    if B % block:
        raise ValueError(f"batch {B} not a multiple of block {block}")
    grid = B // block

    zt = z0.reshape(B, SD).T                                   # (SD, B)
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)

    kernel = _make_kernel(cfg, horizon, block, sample, dtype)
    weights = [prepared[k] for k in _PARAM_ORDER]

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # seed
            pl.BlockSpec((SD, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # z0
            *[pl.BlockSpec(memory_space=pltpu.VMEM)
              for _ in _PARAM_ORDER],
        ],
        out_specs=pl.BlockSpec((horizon, SD, block),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((horizon, SD, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed_arr, zt, *weights)

    # (H, SD, B) → (B, H, O, D), matching stove.rollout's state output
    return jnp.moveaxis(out, 2, 0).reshape(B, horizon, O, D)


def rollout_pallas(dyn_params: Dict, cfg: Config, z0: jnp.ndarray,
                   horizon: int, seed: int = 0, sample: bool = True,
                   block: int = 256, dtype=jnp.bfloat16,
                   interpret: bool = False) -> jnp.ndarray:
    """Convenience wrapper: prepare + run (prepare once per params if you
    call repeatedly — use `prepare_params` + `rollout_states`)."""
    prepared = prepare_params(dyn_params, cfg, dtype)
    return rollout_states(prepared, cfg, z0, horizon, seed, sample, block,
                          dtype, interpret)


def self_check(dyn_params: Dict, cfg: Config, key, batch: int = 256,
               horizon: int = 8, dtype=jnp.float32,
               interpret: bool = False) -> float:
    """Max |pallas − xla| on a mean rollout (the deterministic path).

    The XLA reference is pinned to true-f32 matmuls: on TPU, XLA's default
    f32 dot runs single-pass bf16 on the MXU, whose rounding noise a
    chaotic test net amplifies ~2x/step — comparing the f32 kernel against
    the DEFAULT-precision XLA path measures the reference's noise, not the
    kernel's (measured 0.2 after 8 steps with 0.05-scale random weights,
    identical for f32 and bf16 kernels).  Structural correctness is gated
    on the f32 kernel; bench then times the fastest dtype variant.
    """
    from stove_tpu.models import stove as stove_lib

    z0 = 0.1 * jax.random.normal(
        key, (batch, cfg.num_obj, cfg.full_state_dim))
    with jax.default_matmul_precision("float32"):
        ref, _ = stove_lib.rollout({"dynamics": dyn_params}, cfg, z0, None,
                                   horizon, key, sample=False)
        ref = ref.block_until_ready()
    got = rollout_pallas(dyn_params, cfg, z0, horizon, 0, sample=False,
                         block=min(batch, 256), dtype=dtype,
                         interpret=interpret)
    return float(jnp.max(jnp.abs(got - ref)))
