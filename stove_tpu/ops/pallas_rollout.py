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

Scope: both the action-free rollout (billiards/gravity bench + eval path)
and the action-conditioned rollout WITH the reward head (the MCTS leaf
evaluation: per-step one-hot action rows are two extra matmul terms, and
the geometry-aware reward head's pairwise distances are O(O²) elementwise
(1, TB) row ops).  Sampled rollouts draw transition noise from the on-core
PRNG (Box-Muller), injecting the same std the XLA path uses (std_open when
cfg.open_loop_sigma, scaled by cfg.rollout_sigma_temp like stove.rollout).  Mean rollouts are bit-comparable to XLA up to
matmul precision (kernel matmuls run bf16xbf16→f32 by default; the f32
variant pins Precision.HIGHEST for exact-tolerance tests).

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
    D = cfg.full_state_dim
    # embed layer 0: state rows and (optional) action one-hot rows split
    w_embed0 = p["embed"][0]["w"]                        # (D [+A], h)
    out = {
        "w_e0": jnp.asarray(w_embed0[:D].T, dtype), "b_e0": bt(p["embed"][0]),
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
    if cfg.action_conditioned:
        out["w_e0a"] = jnp.asarray(w_embed0[D:].T, dtype)     # (h, A)
    if cfg.open_loop_sigma and "open" in p:
        h = cfg.dyn_hidden
        w0 = p["open"][0]["w"]                                # (2h, h)
        out["w_op_s"] = jnp.asarray(w0[:h].T, dtype)
        out["w_op_r"] = jnp.asarray(w0[h:].T, dtype)
        out["b_op0"] = bt(p["open"][0])
        out["w_op1"] = wt(p["open"][1])
        out["b_op1"] = bt(p["open"][1])
    if cfg.reward_head and "reward" in p:
        h = cfg.dyn_hidden
        for name, mlp in (("rw", p["reward"]), ("ra2", p["reward_att"])):
            w0 = mlp[0]["w"]                                  # (2h+2, h)
            out[f"w_{name}_s"] = jnp.asarray(w0[:h].T, dtype)
            out[f"w_{name}_r"] = jnp.asarray(w0[h:2 * h].T, dtype)
            # the two scalar geometry features multiply (1, TB) rows:
            # store their weight rows as (h, 1) columns
            out[f"w_{name}_g"] = jnp.asarray(w0[2 * h][:, None], jnp.float32)
            out[f"w_{name}_d"] = jnp.asarray(w0[2 * h + 1][:, None],
                                             jnp.float32)
            out[f"b_{name}0"] = bt(mlp[0])
            out[f"w_{name}1"] = wt(mlp[1])
            out[f"b_{name}1"] = bt(mlp[1])
            out[f"w_{name}2"] = jnp.asarray(mlp[2]["w"], jnp.float32)  # (h,1)
            out[f"b_{name}2"] = jnp.asarray(mlp[2]["b"], jnp.float32)  # (1,)
    return out


_PARAM_ORDER = ("w_e0", "b_e0", "w_e1", "b_e1", "w_s0", "b_s0", "w_s1",
                "b_s1", "w_recv", "w_send", "b_r0", "w_r1", "b_r1", "w_rf",
                "b_rf", "w_ra", "b_ra", "w_o0s", "w_o0r", "b_o0", "w_o1",
                "b_o1", "w_o2", "b_o2")

_ACTION_PARAMS = ("w_e0a",)
_OPEN_PARAMS = ("w_op_s", "w_op_r", "b_op0", "w_op1", "b_op1")
_REWARD_PARAMS = ("w_rw_s", "w_rw_r", "w_rw_g", "w_rw_d", "b_rw0", "w_rw1",
                  "b_rw1", "w_rw2", "b_rw2",
                  "w_ra2_s", "w_ra2_r", "w_ra2_g", "w_ra2_d", "b_ra20",
                  "w_ra21", "b_ra21", "w_ra22", "b_ra22")


def _bits_to_normals(b1, b2):
    """Box-Muller on two SIGNED int32 random-bit tensors.

    `pltpu.prng_random_bits` returns SIGNED int32, so the shift must be
    LOGICAL: an arithmetic `>> 8` leaves half the draws negative and the
    `maximum(·, 1e-12)` collapses them to an atom — measured std 3.83
    with 26% of draws beyond 5σ (round-3 advisor finding, high).  The
    logical shift keeps the top 24 bits as a uniform in [0, 1), exact in
    f32.  Pure jnp so the CPU test suite can drive it with threefry bits
    (tests/test_pallas.py moment test); silicon moments are checked by
    scripts/pallas_rollout_probe.py.
    """
    return _bits_to_normal_pairs(b1, b2)[0]


def _bits_to_normal_pairs(b1, b2):
    """BOTH Box-Muller branches (cos and sin) from one uniform pair.

    The two outputs are independent N(0,1) tensors — the classical
    Box-Muller property — so a consumer needing N normals draws bits for
    only N/2 of them and pays N/2 logs/sqrts instead of N (measured: the
    noise path was 17.9% of the sampled rollout step before this,
    artifacts/r5/kernel_probe.json).  Shift caveats as in
    `_bits_to_normals` (logical shift on signed bits; round-3 advisor
    finding, high).  Pure jnp so the CPU suite can drive it with threefry
    bits (tests/test_pallas.py moment tests).
    """
    u1 = jax.lax.shift_right_logical(b1, 8).astype(jnp.float32) \
        * (1.0 / (1 << 24))
    u2 = jax.lax.shift_right_logical(b2, 8).astype(jnp.float32) \
        * (1.0 / (1 << 24))
    u1 = jnp.maximum(u1, 1e-12)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _normals(shape):
    """Standard normals from the on-core PRNG via Box-Muller, using both
    branches of each pair (half the PRNG draws and half the log/sqrt of
    the one-branch form; odd leading dims drop one surplus row)."""
    rows, cols = shape
    half = (rows + 1) // 2
    z1, z2 = _bits_to_normal_pairs(pltpu.prng_random_bits((half, cols)),
                                   pltpu.prng_random_bits((half, cols)))
    return jnp.concatenate([z1, z2], axis=0)[:rows, :]


def make_mm(dtype):
    """(w, x[, b][, relu]) matmul helper at the kernel's precision policy:
    bf16 single-pass by default, true-f32 (3-pass) when dtype is f32 —
    see the precision note in _make_kernel."""
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def mm(w_ref, x, b=None, relu=False):
        y = jnp.dot(w_ref[:], x.astype(dtype),
                    preferred_element_type=jnp.float32, precision=prec)
        if b is not None:
            y = y + b[:]
        return jnp.maximum(y, 0.0) if relu else y

    return mm


def dyn_tile_core(params, mm, cfg: Config, z, act_term=None):
    """One graph-net dynamics evaluation on a transposed (SD, TB) tile.

    Shared by the rollout kernel below and the posterior-scan kernel
    (ops/pallas_scan.py).  Returns per-object lists (es, ss, rs, outs):
    embed features, self-core outputs, attention-pooled pair features, and
    the raw output-MLP rows (d_out, TB) — callers do integration /
    std-bounding / reward pooling themselves.

    Layout: objects are stacked along the LANE axis — every matmul runs
    once at (·, O·TB) (and the pair cores once at (·, O·(O−1)·TB))
    instead of O (or O·(O−1)) narrow dispatches.  Per-column math is
    unchanged (same K-reductions on the same data), so results are
    bit-identical to the per-object form at both precisions; measured
    +16% on the whole-horizon kernel (artifacts/r5/kernel_probe.json,
    lane-stacking row).
    """
    O = cfg.num_obj
    D = cfg.full_state_dim
    TB = z.shape[1]

    # ---- embed + self cores, all objects in one (·, O·TB) pass.
    # The first (K=D) matmul stays per-object: z's D-row object slices sit
    # at sublane offsets D·o mod 8, and Mosaic cannot lane-concat vectors
    # whose non-concat (sublane) offsets differ ("result/input offset
    # mismatch on non-concat dimension") — the matmul outputs are
    # offset-0, so stacking starts at the first hidden layer.
    xs = []
    for o in range(O):
        zo = z[D * o:D * (o + 1), :]                           # (D, TB)
        x = mm(params["w_e0"], zo, params["b_e0"])
        if act_term is not None:
            x = x + act_term      # same action term for every object
        xs.append(jnp.maximum(x, 0.0))
    x_all = jnp.concatenate(xs, axis=1)                        # (h, O·TB)
    e_all = mm(params["w_e1"], x_all, params["b_e1"])          # (h, O·TB)
    sx = mm(params["w_s0"], e_all, params["b_s0"], relu=True)
    s_all = mm(params["w_s1"], sx, params["b_s1"])
    es = [e_all[:, o * TB:(o + 1) * TB] for o in range(O)]
    ss = [s_all[:, o * TB:(o + 1) * TB] for o in range(O)]

    # ---- pair cores: recv_o + send_j broadcast adds, no pair tensor;
    # all O·(O−1) ordered pairs in one (·, P·TB) pass
    recv_all = mm(params["w_recv"], e_all)                     # (h, O·TB)
    send_all = mm(params["w_send"], e_all)
    pairs = [(o, j) for o in range(O) for j in range(O) if j != o]
    h1 = jnp.concatenate(
        [recv_all[:, o * TB:(o + 1) * TB]
         + send_all[:, j * TB:(j + 1) * TB] for o, j in pairs],
        axis=1)                                                # (h, P·TB)
    h1 = jnp.maximum(h1 + params["b_r0"][:], 0.0)
    h2 = mm(params["w_r1"], h1, params["b_r1"], relu=True)
    feat = mm(params["w_rf"], h2, params["b_rf"])
    logit = (jnp.sum(h2 * params["w_ra"][:], axis=0, keepdims=True)
             + params["b_ra"][0])                              # (1, P·TB)
    term = feat * jax.nn.sigmoid(logit)
    rs = []
    for o in range(O):
        acc = None
        for p, (po, _) in enumerate(pairs):
            if po != o:
                continue
            t = term[:, p * TB:(p + 1) * TB]
            acc = t if acc is None else acc + t
        rs.append(acc)

    # ---- output MLP, all objects in one pass
    r_all = jnp.concatenate(rs, axis=1)                        # (h, O·TB)
    g = jnp.maximum(mm(params["w_o0s"], s_all)
                    + mm(params["w_o0r"], r_all)
                    + params["b_o0"][:], 0.0)
    g = mm(params["w_o1"], g, params["b_o1"], relu=True)
    out_all = mm(params["w_o2"], g, params["b_o2"])            # (d_out, O·TB)
    outs = [out_all[:, o * TB:(o + 1) * TB] for o in range(O)]
    return es, ss, rs, outs


def integrate_mean(z, out, o, cfg: Config):
    """Euler integration of object o's output rows into the next mean
    (identical to dynamics.apply's mean construction)."""
    D, cl = cfg.full_state_dim, cfg.cl
    zo = z[D * o:D * (o + 1), :]
    dv = out[0:2, :]
    dl = out[2:2 + cl, :]
    vel = zo[4:6, :] + dv
    pos = zo[2:4, :] + vel
    lat = (zo[6:, :] + dl) if cfg.latent_residual else dl
    return jnp.concatenate([zo[0:2, :], pos, vel, lat], axis=0)


def reward_tile_pool(params, mm, cfg: Config, means, ss, rs):
    """Geometry-aware reward head on the predicted means (transposed
    tiles); identical math to the rollout kernel's in-step reward block
    (attention-pooled per-object scores → sigmoid).  Returns (1, TB)."""
    O = cfg.num_obj
    pos_o = [means[o][2:4, :] for o in range(O)]
    size_o = [jnp.mean(means[o][0:2, :], axis=0, keepdims=True)
              for o in range(O)]
    dists = {}
    for o in range(O):
        for j in range(o + 1, O):
            d2 = jnp.sum((pos_o[o] - pos_o[j]) ** 2, axis=0, keepdims=True)
            dists[(o, j)] = jnp.sqrt(d2 + 1e-8)               # (1, TB)
    scores, logits = [], []
    for o in range(O):
        mg, md = None, None
        for j in range(O):
            if j == o:
                continue
            dd = dists[(min(o, j), max(o, j))]
            gg = dd - (size_o[o] + size_o[j])
            mg = gg if mg is None else jnp.minimum(mg, gg)
            md = dd if md is None else jnp.minimum(md, dd)
        for name, sink in (("rw", scores), ("ra2", logits)):
            f = jnp.maximum(
                mm(params[f"w_{name}_s"], ss[o])
                + mm(params[f"w_{name}_r"], rs[o])
                + params[f"w_{name}_g"][:] * mg
                + params[f"w_{name}_d"][:] * md
                + params[f"b_{name}0"][:], 0.0)
            f = mm(params[f"w_{name}1"], f, params[f"b_{name}1"],
                   relu=True)
            v = (jnp.sum(f * params[f"w_{name}2"][:], axis=0,
                         keepdims=True)
                 + params[f"b_{name}2"][0])                   # (1, TB)
            sink.append(v)
    mx = functools.reduce(jnp.maximum, logits)
    exps = [jnp.exp(lg - mx) for lg in logits]
    denom = functools.reduce(lambda a, b: a + b, exps)
    pooled = functools.reduce(
        lambda a, b: a + b,
        [e * s for e, s in zip(exps, scores)]) / denom
    return jax.nn.sigmoid(pooled)


def _make_kernel(cfg: Config, horizon: int, TB: int, sample: bool,
                 dtype, actions_on: bool = False, reward_on: bool = False):
    O = cfg.num_obj
    A = cfg.num_actions
    cl = cfg.cl
    D = 6 + cl                       # per-object state rows
    SD = O * D
    use_open = bool(cfg.open_loop_sigma)
    lo = cfg.min_open_std if use_open else cfg.min_dyn_std
    hi = cfg.max_dyn_std
    size_std = cfg.size_std
    # the XLA path samples with std * rollout_sigma_temp (stove.py:500);
    # the kernel must inject the SAME std or the two impls silently
    # diverge under the round-3 gravity recipe (temp < 1) — round-3
    # advisor finding (medium)
    sigma_temp = cfg.rollout_sigma_temp
    latent_residual = cfg.latent_residual

    # f32 weights → true f32 matmuls (3-pass); otherwise single-pass bf16.
    # Without the explicit precision, Mosaic lowers f32 dots as one bf16
    # MXU pass too (measured: f32 and bf16 kernels ran at the same speed
    # AND the same rounding error) — the f32 variant exists for the parity
    # gate, so it must actually be f32.
    mm = make_mm(dtype)

    open_head = use_open and sample
    order = list(_PARAM_ORDER)
    if actions_on:
        order += list(_ACTION_PARAMS)
    if reward_on:
        order += list(_REWARD_PARAMS)
    if open_head:
        order += list(_OPEN_PARAMS)

    def kernel(seed_ref, z0_ref, *refs):
        k = 0
        act_ref = None
        if actions_on:
            act_ref = refs[0]
            k = 1
        params = dict(zip(order, refs[k:k + len(order)]))
        out_ref = refs[k + len(order)]
        rew_ref = refs[k + len(order) + 1] if reward_on else None
        if sample:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        def step(t, z):
            act_term = None
            if actions_on:
                a_row = act_ref[pl.ds(t, 1), :]                # (1, TB)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, TB), 0)
                onehot = (row_ids == a_row).astype(jnp.float32)
                act_term = mm(params["w_e0a"], onehot)         # (h, TB)

            _, ss, rs, outs = dyn_tile_core(params, mm, cfg, z, act_term)

            # ---- Euler integration (+ optional noise), per object
            zs, means = [], []
            if sample:
                # one PRNG draw for all objects: (SD, TB) sliced per
                # object below — fewer ops and less sublane padding than
                # O separate (D, TB) draws
                noise_all = _normals((SD, TB))
            for o in range(O):
                out = outs[o]
                mean = integrate_mean(z, out, o, cfg)
                means.append(mean)
                if sample:
                    if open_head:
                        # detached open-loop std head on (s, r) features
                        f = jnp.maximum(mm(params["w_op_s"], ss[o])
                                        + mm(params["w_op_r"], rs[o])
                                        + params["b_op0"][:], 0.0)
                        raw = mm(params["w_op1"], f, params["b_op1"])
                    else:
                        raw = out[2 + cl:6 + 2 * cl, :]        # (4+cl, TB)
                    std_pvl = lo + (hi - lo) * jax.nn.sigmoid(raw)
                    std = jnp.concatenate(
                        [jnp.full((2, TB), size_std, jnp.float32), std_pvl],
                        axis=0)
                    mean = mean + (sigma_temp * std) \
                        * noise_all[D * o:D * (o + 1), :]
                zs.append(mean)

            if reward_on:
                # geometry-aware reward head on the PREDICTED MEAN next
                # state (as in dynamics.apply) — shared with pallas_scan
                rew_ref[t] = reward_tile_pool(params, mm, cfg, means, ss,
                                              rs)               # (1, TB)

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
    order = list(_PARAM_ORDER)
    if sample and cfg.open_loop_sigma:
        order += list(_OPEN_PARAMS)
    weights = [prepared[k] for k in order]

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # seed
            pl.BlockSpec((SD, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # z0
            *[pl.BlockSpec(memory_space=pltpu.VMEM)
              for _ in order],
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


@functools.partial(jax.jit, static_argnames=("cfg", "horizon", "sample",
                                             "block", "dtype", "interpret"))
def rollout_act(prepared: Dict, cfg: Config, z0: jnp.ndarray,
                actions: jnp.ndarray, horizon: int, seed,
                sample: bool = False, block: int = 256,
                dtype=jnp.bfloat16, interpret: bool = False):
    """Action-conditioned fused rollout WITH the reward head.

    z0: (B, O, 6+cl); actions: (B, horizon) int32.
    Returns (states (B, H, O, D), rewards (B, H)) — the MCTS leaf shape
    (matches `stove.rollout`; rewards are the raw head probabilities,
    calibration/temperature stay caller-side as in LearnedSimulator).
    """
    B, O, D = z0.shape
    SD = O * D
    if B % block:
        raise ValueError(f"batch {B} not a multiple of block {block}")
    grid = B // block
    reward_on = bool(cfg.reward_head)

    zt = z0.reshape(B, SD).T
    at = actions.T                                             # (H, B)
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)

    kernel = _make_kernel(cfg, horizon, block, sample, dtype,
                          actions_on=True, reward_on=reward_on)
    order = (list(_PARAM_ORDER) + list(_ACTION_PARAMS)
             + (list(_REWARD_PARAMS) if reward_on else [])
             + (list(_OPEN_PARAMS)
                if (sample and cfg.open_loop_sigma) else []))
    weights = [prepared[k] for k in order]

    out_shapes = [jax.ShapeDtypeStruct((horizon, SD, B), jnp.float32)]
    out_specs = [pl.BlockSpec((horizon, SD, block), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)]
    if reward_on:
        out_shapes.append(
            jax.ShapeDtypeStruct((horizon, 1, B), jnp.float32))
        out_specs.append(pl.BlockSpec((horizon, 1, block),
                                      lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # seed
            pl.BlockSpec((SD, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # z0
            pl.BlockSpec((horizon, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # actions
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in order],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed_arr, zt, at, *weights)

    states = jnp.moveaxis(outs[0], 2, 0).reshape(B, horizon, O, D)
    if reward_on:
        rewards = outs[1][:, 0, :].T                           # (B, H)
    else:
        rewards = jnp.zeros((B, horizon), jnp.float32)
    return states, rewards


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
