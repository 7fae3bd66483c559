"""Pallas TPU kernel: the entire RAT-SPN forward fused into one kernel.

The SPN stack (Gaussian leaves → scope contraction → alternating
product/sum layers → root mixture) is evaluated layer-by-layer by XLA in
`stove_tpu.models.spn.spn_log_prob`; every layer boundary is a potential HBM
round-trip.  This kernel keeps a whole batch-tile's activations in VMEM from
pixels to root log-density: one `pallas_call`, zero intermediate HBM traffic,
with the layer loops fully unrolled at trace time (the region graph is
static — SURVEY.md §7 stage 2 / stage 7a).

Layouts are chosen for the TPU lane dimension: per-variable work is shaped
(TB, I, V) with V (≥100) on lanes, and all contractions are expressed as 2-D
`jnp.dot`s on the MXU (batch/region loops are unrolled — P ≤ 4, R ≤ 8).

Gradient: `spn_log_prob_fused` carries a `jax.custom_vjp` whose backward
runs XLA autodiff of the mathematically identical dense path — forward
inference (eval, planning, likelihood scoring) takes the fused kernel, the
training backward keeps XLA's well-fused gradient.  Equivalence is pinned by
tests in interpret mode (CPU) and on device.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stove_tpu.models import spn as spn_lib

_LOG2PI = float(np.log(2.0 * np.pi))


def _prepare(spec: spn_lib.SpnSpec, params: Dict[str, jnp.ndarray]):
    """Precompute kernel-friendly parameter layouts (tiny host-free ops).

    Sum-layer weights are pre-transposed for the kernel's factorized
    product+sum contraction (see `_make_kernel`): W (R, P, S, c²) with
    c² = (left i, right j) becomes W2T (R, P, c, S·c) with
    W2T[r, p, j, s·c+i] = W[r, p, s, i·c+j], so the right-child exp goes
    through one 2-D matmul and the left-child exp through a lane-tiled
    elementwise multiply + block-sum matmul — no >2-D reshapes (Mosaic
    rejects those shape casts).
    """
    mu_t = jnp.transpose(params["leaf_mu"], (0, 2, 1))         # (R, I, V)
    std_t = jnp.transpose(
        spn_lib._leaf_std(spec, params["leaf_raw_std"]), (0, 2, 1))
    scope_t = jnp.transpose(jnp.asarray(spec.scopes), (0, 2, 1))  # (R, V, L)
    R, S = spec.num_reps, spec.num_sums
    sum_w2t = []
    c = spec.num_leaves
    for d in range(spec.depth - 1, -1, -1):
        P = 2 ** d
        w = jnp.exp(jax.nn.log_softmax(params[f"sum_logits_{d}"], axis=-1))
        w3 = w.reshape(R, P, S, c, c)                          # [.., s, i, j]
        w2t = jnp.transpose(w3, (0, 1, 4, 2, 3)).reshape(R, P, c, S * c)
        sum_w2t.append(w2t)
        c = S
    root_logw = jax.nn.log_softmax(params["root_logits"])       # (R*S,)
    return mu_t, std_t, scope_t, sum_w2t, root_logw


def _blocksum_matrices(spec: spn_lib.SpnSpec):
    """Static (S·c, S) 0/1 matrices summing lane blocks of c, per level."""
    S = spec.num_sums
    mats = []
    c = spec.num_leaves
    for _ in range(spec.depth):
        m = np.zeros((S * c, S), np.float32)
        for s in range(S):
            m[s * c:(s + 1) * c, s] = 1.0
        mats.append(jnp.asarray(m))
        c = S
    return mats


def spn_tile_body(spec: spn_lib.SpnSpec, tile: int, x, wgt, mu_ref,
                  std_ref, scope_ref, sum_refs, block_refs, root_ref):
    """The fused SPN forward on one VMEM-resident batch tile.

    x, wgt: (TB, V) values already in registers/VMEM; the param arguments
    are pallas refs (or indexable arrays).  Returns (TB, 1) root
    log-densities.  Shared by the standalone SPN kernel below and the
    whole-likelihood kernel (ops/pallas_likelihood.py), which evaluates
    the object and background SPNs on patches it computed in-kernel.
    """
    R, I, S, D = (spec.num_reps, spec.num_leaves, spec.num_sums, spec.depth)
    V, L = spec.num_vars, spec.num_leaf_regions

    tops = []
    for r in range(R):                                     # unrolled
        mu = mu_ref[r]                                     # (I, V)
        std = std_ref[r]
        z = (x[:, None, :] - mu[None]) / std[None]         # (TB, I, V)
        ll = (-0.5 * (z * z + _LOG2PI) - jnp.log(std)[None])
        ll = ll * wgt[:, None, :]
        # scope contraction: (TB·I, V) @ (V, L) on the MXU
        acts = jnp.dot(ll.reshape(tile * I, V), scope_ref[r],
                       preferred_element_type=jnp.float32)
        acts3 = jnp.transpose(acts.reshape(tile, I, L), (0, 2, 1))
        # per-region activation list: everything below stays strictly
        # 2-D (TB, channels) — Mosaic rejects >2-D shape casts/gathers
        region_acts = [acts3[:, k, :] for k in range(L)]   # L× (TB, I)

        c = I
        for level, d in enumerate(range(D - 1, -1, -1)):   # unrolled
            P = 2 ** d
            nxt = []
            for p in range(P):                             # unrolled, ≤4
                lft, rgt = region_acts[2 * p], region_acts[2 * p + 1]
                # factorized log-sum-product:
                #   Σ_{ij} W[s,i,j] e^{l_i + r_j − m}
                # = Σ_i e^{l_i − ml} · Σ_j W[s,i,j] e^{r_j − mr},
                # with m = ml + mr (max factorizes over the outer sum)
                ml = jnp.max(lft, axis=-1, keepdims=True)  # (TB, 1)
                mr = jnp.max(rgt, axis=-1, keepdims=True)
                el = jnp.exp(lft - ml)                     # (TB, c)
                er = jnp.exp(rgt - mr)
                t2 = jnp.dot(er, sum_refs[level][r, p],
                             preferred_element_type=jnp.float32)
                #   t2[b, s·c+i] = Σ_j W[s,i,j] er[b,j]     (TB, S·c)
                mixed = jnp.dot(t2 * jnp.tile(el, (1, S)),
                                block_refs[level][:],
                                preferred_element_type=jnp.float32)
                nxt.append(jnp.log(jnp.maximum(mixed, 1e-38))
                           + ml + mr)                      # (TB, S)
            region_acts = nxt
            c = S
        tops.append(region_acts[0])                        # (TB, S)

    top = jnp.concatenate(tops, axis=-1)                   # (TB, R·S)
    scored = top + root_ref[:]                             # log-weights
    m = jnp.max(scored, axis=-1, keepdims=True)
    return jnp.log(jnp.sum(jnp.exp(scored - m), axis=-1,
                           keepdims=True)) + m             # (TB, 1)


def _make_kernel(spec: spn_lib.SpnSpec, tile: int):
    D = spec.depth

    def kernel(x_ref, w_ref, mu_ref, std_ref, scope_ref, *rest):
        sum_refs = rest[:D]          # W2T per level, (R, P, c, S·c)
        block_refs = rest[D:2 * D]   # block-sum matrices, (S·c, S)
        root_ref = rest[2 * D]
        o_ref = rest[2 * D + 1]
        o_ref[:] = spn_tile_body(spec, tile, x_ref[:], w_ref[:], mu_ref,
                                 std_ref, scope_ref, sum_refs, block_refs,
                                 root_ref)

    return kernel


def _fused_forward(spec: spn_lib.SpnSpec, params, x, weight,
                   tile: int, interpret: bool) -> jnp.ndarray:
    B, V = x.shape
    mu_t, std_t, scope_t, sum_w2t, root_logw = _prepare(spec, params)
    blocksums = _blocksum_matrices(spec)
    if weight is None:
        weight = jnp.ones_like(x)

    pad = (-B) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        weight = jnp.pad(weight, ((0, pad), (0, 0)))
    Bp = B + pad

    kernel = _make_kernel(spec, tile)
    grid = (Bp // tile,)

    tile_spec = pl.BlockSpec((tile, V), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, tile_spec, full(mu_t), full(std_t),
                  full(scope_t)]
        + [full(wd) for wd in sum_w2t]
        + [full(bm) for bm in blocksums]
        + [full(root_logw.reshape(1, -1))],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        # large tiles (≥2048 rows) exceed the 16M default scoped-vmem
        # budget (probe measured 24.45M at tile 4096) — raise it like the
        # likelihood/scan kernels do
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, weight, mu_t, std_t, scope_t, *sum_w2t, *blocksums,
      root_logw.reshape(1, -1))
    return out[:B, 0]


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def spn_log_prob_fused(spec: spn_lib.SpnSpec, params, x, weight,
                       tile: int = 128, interpret: bool = False
                       ) -> jnp.ndarray:
    """Drop-in fused replacement for `spn_lib.spn_log_prob`.

    x: (B, V); weight: (B, V) or None → (B,) log-densities.
    """
    return _fused_forward(spec, params, x, weight, tile, interpret)


def _fwd(spec, params, x, weight, tile, interpret):
    out = _fused_forward(spec, params, x, weight, tile, interpret)
    return out, (params, x, weight)


def _bwd(spec, tile, interpret, res, g):
    params, x, weight = res
    # backward through the mathematically identical dense XLA path
    _, vjp = jax.vjp(
        lambda p, xx, ww: spn_lib.spn_log_prob(spec, p, xx, ww),
        params, x, weight if weight is not None else jnp.ones_like(x))
    dp, dx, dw = vjp(g)
    return dp, dx, (None if weight is None else dw)


spn_log_prob_fused.defvjp(_fwd, _bwd)
