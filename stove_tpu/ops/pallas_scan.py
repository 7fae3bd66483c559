"""Pallas TPU kernel: the whole posterior scan (phase 2) fused per tile.

`stove.infer`'s t-recursion is a `lax.scan` of tiny per-step ops (graph-net
dynamics, slot alignment, product-of-Gaussians algebra, a reparameterized
sample, two Gaussian log-densities) — T−2 sequential steps whose activations
bounce through HBM at every step boundary and whose launch latency the
round-2 phase profile measured at ~38% of the train step.  This kernel
keeps the recurrent state, all dynamics weights, and every per-step
intermediate VMEM-resident for the whole window, exactly like the rollout
kernel (whose dynamics core it shares — ops/pallas_rollout.dyn_tile_core).

Determinism: the posterior sample z_t = q_mean + q_std·ε_t consumes
PRE-DRAWN threefry normals ε (generated outside with the same per-step
keys the XLA scan used), so the kernel is bit-deterministic and matches
the XLA path up to matmul precision — no kernel PRNG in the training path.

Slot alignment (O ≤ 4): the O! permutations are enumerated statically;
per-permutation costs are (1, TB) rows and the argmin is realized as
first-match boolean masks, reproducing `_exact_assignment`'s first-minimal-
index tie rule without gathers.

Gradient: `scan_posterior` in models/stove.py wraps this forward in a
custom_vjp whose backward is XLA autodiff of the mathematically identical
dense scan (same ε) — training keeps XLA's fused BPTT backward.

Reference: [ref: model/video_prediction/stove.py per-step posterior loop —
SURVEY.md §2.1 "Inference q"; mount empty, see SURVEY §0].
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stove_tpu.config import Config
from stove_tpu.ops.pallas_rollout import (_ACTION_PARAMS, _PARAM_ORDER,
                                          _REWARD_PARAMS, dyn_tile_core,
                                          integrate_mean, make_mm,
                                          reward_tile_pool)

_LOG2PI = math.log(2.0 * math.pi)


def _logn_rows(x, mean, std):
    z = (x - mean) / std
    return -0.5 * (z * z + _LOG2PI) - jnp.log(std)


def _product_rows(ma, sa, mb, sb):
    va, vb = sa * sa, sb * sb
    denom = va + vb
    return (ma * vb + mb * va) / denom, jnp.sqrt(va * vb / denom)


def _make_kernel(cfg: Config, T2: int, TB: int, dtype,
                 reward_on: bool):
    O = cfg.num_obj
    A = cfg.num_actions
    cl = cfg.cl
    D = cfg.full_state_dim
    SD = O * D
    lo, hi = cfg.min_dyn_std, cfg.max_dyn_std
    size_std = cfg.size_std
    filtered = cfg.velocity_obs == "filtered"
    full_std = cfg.velocity_obs_full_std
    mm = make_mm(dtype)
    perms = list(itertools.permutations(range(O)))  # static, O! ≤ 24

    order = list(_PARAM_ORDER)
    if cfg.action_conditioned:
        order += list(_ACTION_PARAMS)
    if reward_on:
        order += list(_REWARD_PARAMS)

    def kernel(z1_ref, cm_ref, cs_ref, supm_ref, sups_ref, act_ref,
               eps_ref, *refs):
        params = dict(zip(order, refs[:len(order)]))
        z_out = refs[len(order)]
        zm_out = refs[len(order) + 1]
        kl_out = refs[len(order) + 2]
        rew_out = refs[len(order) + 3] if reward_on else None

        def step(t, carry):
            z, prev_m, prev_s, kl_acc = carry

            act_term = None
            if cfg.action_conditioned:
                a_row = act_ref[pl.ds(t, 1), :]                # (1, TB)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, TB), 0)
                onehot = (row_ids == a_row).astype(jnp.float32)
                act_term = mm(params["w_e0a"], onehot)         # (h, TB)

            _, ss, rs, outs = dyn_tile_core(params, mm, cfg, z, act_term)
            d_means, d_stds = [], []
            for o in range(O):
                d_means.append(integrate_mean(z, outs[o], o, cfg))
                raw = outs[o][2 + cl:6 + 2 * cl, :]            # (4+cl, TB)
                std_pvl = lo + (hi - lo) * jax.nn.sigmoid(raw)
                d_stds.append(jnp.concatenate(
                    [jnp.full((2, TB), size_std, jnp.float32), std_pvl],
                    axis=0))                                   # (D, TB)

            sup_m = supm_ref[t]                                # (4O, TB)
            sup_s = sups_ref[t]
            obs_m = [sup_m[4 * j:4 * j + 4, :] for j in range(O)]
            obs_s = [sup_s[4 * j:4 * j + 4, :] for j in range(O)]

            # ---- exact slot alignment: enumerate O! permutations --------
            cost = {}
            for i in range(O):
                pm = d_means[i][2:4, :]                        # pred pos
                for j in range(O):
                    dd = pm - obs_m[j][2:4, :]
                    cost[(i, j)] = jnp.sum(dd * dd, axis=0,
                                           keepdims=True)      # (1, TB)
            percost = [sum(cost[(i, p[i])] for i in range(O))
                       for p in perms]
            best = functools.reduce(jnp.minimum, percost)
            sel, taken = [], None
            for pc in percost:                # first-minimal-index masks
                m = (pc <= best)
                if taken is not None:
                    m = m & ~taken
                taken = m if taken is None else (taken | m)
                sel.append(m.astype(jnp.float32))              # (1, TB)
            sm = [sum(sel[p] * obs_m[perms[p][o]] for p in range(len(perms)))
                  for o in range(O)]                           # O× (4, TB)
            ssd = [sum(sel[p] * obs_s[perms[p][o]] for p in range(len(perms)))
                   for o in range(O)]

            # ---- product-of-Gaussians posterior, per object --------------
            zs, qms, qss = [], [], []
            pm_new, ps_new = [], []
            for o in range(O):
                dm, dsd = d_means[o], d_stds[o]
                q_pos_m, q_pos_s = _product_rows(
                    sm[o][2:4, :], ssd[o][2:4, :], dm[2:4, :], dsd[2:4, :])
                if cfg.velocity_posterior:
                    if filtered:
                        v_obs = q_pos_m - prev_m[2 * o:2 * o + 2, :]
                        v_obs_s = jnp.sqrt(
                            q_pos_s ** 2
                            + prev_s[2 * o:2 * o + 2, :] ** 2)
                    elif full_std:
                        v_obs = sm[o][2:4, :] - prev_m[2 * o:2 * o + 2, :]
                        v_obs_s = jnp.sqrt(
                            ssd[o][2:4, :] ** 2
                            + prev_s[2 * o:2 * o + 2, :] ** 2)
                    else:
                        v_obs = sm[o][2:4, :] - z[D * o + 2:D * o + 4, :]
                        v_obs_s = ssd[o][2:4, :]
                    q_vel_m, q_vel_s = _product_rows(
                        v_obs, v_obs_s, dm[4:6, :], dsd[4:6, :])
                else:
                    q_vel_m, q_vel_s = dm[4:6, :], dsd[4:6, :]
                q_size_m, q_size_s = _product_rows(
                    sm[o][0:2, :], ssd[o][0:2, :], dm[0:2, :], dsd[0:2, :])

                q_mean = jnp.concatenate(
                    [q_size_m, q_pos_m, q_vel_m, dm[6:, :]], axis=0)
                q_std = jnp.concatenate(
                    [q_size_s, q_pos_s, q_vel_s, dsd[6:, :]], axis=0)
                e = eps_ref[t][D * o:D * (o + 1), :]           # (D, TB)
                z_t = q_mean + q_std * e
                zs.append(z_t)
                qms.append(q_mean)
                qss.append(q_std)
                if filtered:
                    pm_new.append(q_pos_m)
                    ps_new.append(q_pos_s)
                else:
                    pm_new.append(sm[o][2:4, :])
                    ps_new.append(ssd[o][2:4, :])

            # ---- KL increment: log p(z|z_prev) − log q(z) ----------------
            inc = None
            for o in range(O):
                lp = jnp.sum(_logn_rows(zs[o], d_means[o], d_stds[o]),
                             axis=0, keepdims=True)            # (1, TB)
                lq = jnp.sum(_logn_rows(zs[o], qms[o], qss[o]),
                             axis=0, keepdims=True)
                d = lp - lq
                inc = d if inc is None else inc + d
            kl_acc = kl_acc + inc

            if reward_on:
                rew_out[t] = reward_tile_pool(params, mm, cfg, d_means,
                                              ss, rs)          # (1, TB)

            z_next = jnp.concatenate(zs, axis=0)               # (SD, TB)
            z_out[t] = z_next
            zm_out[t] = jnp.concatenate(qms, axis=0)
            return (z_next, jnp.concatenate(pm_new, axis=0),
                    jnp.concatenate(ps_new, axis=0), kl_acc)

        init = (z1_ref[:], cm_ref[:], cs_ref[:],
                jnp.zeros((1, TB), jnp.float32))
        carry = jax.lax.fori_loop(0, T2, step, init, unroll=False)
        kl_out[:] = carry[3]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "block", "dtype",
                                             "interpret"))
def scan_fused(prepared: Dict, cfg: Config, z1, carry_m, carry_s,
               sup_mean, sup_std, actions, eps, block: int = 256,
               dtype=jnp.bfloat16, interpret: bool = False):
    """Fused posterior scan forward.

    z1 (B, O, D); carry_m/carry_s (B, O, 2); sup_mean/sup_std
    (B, T2, O, 4); actions (B, T2) int32; eps (B, T2, O, D).
    Returns (z (B, T2, O, D), z_mean (B, T2, O, D), kl (B,),
    rewards (B, T2)).  B is zero-padded to a multiple of `block`.
    """
    B, O, D = z1.shape
    T2 = sup_mean.shape[1]
    SD = O * D
    # dynamics.apply computes the reward head whenever the params exist —
    # NOT gated on action_conditioned (billiards models keep a head too)
    reward_on = bool(cfg.reward_head) and "w_rw_s" in prepared

    pad = (-B) % block
    if pad:
        padb = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        z1, carry_m, carry_s, sup_mean, sup_std, actions, eps = map(
            padb, (z1, carry_m, carry_s, sup_mean, sup_std, actions, eps))
        # padded rows roll garbage that is sliced off; stds must stay
        # positive for the log/products to stay finite
        sup_std = sup_std.at[B:].set(1.0)
    Bp = B + pad
    grid = Bp // block

    zt = z1.reshape(Bp, SD).T                                  # (SD, Bp)
    cmt = carry_m.reshape(Bp, 2 * O).T
    cst = carry_s.reshape(Bp, 2 * O).T
    smt = jnp.moveaxis(sup_mean.reshape(Bp, T2, 4 * O), 0, 2)  # (T2,4O,Bp)
    sst = jnp.moveaxis(sup_std.reshape(Bp, T2, 4 * O), 0, 2)
    att = actions.T                                            # (T2, Bp)
    ept = jnp.moveaxis(eps.reshape(Bp, T2, SD), 0, 2)          # (T2,SD,Bp)

    order = list(_PARAM_ORDER)
    if cfg.action_conditioned:
        order += list(_ACTION_PARAMS)
    if reward_on:
        order += list(_REWARD_PARAMS)
    weights = [prepared[k] for k in order]

    kernel = _make_kernel(cfg, T2, block, dtype, reward_on)
    tile2 = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    tile3 = lambda r: pl.BlockSpec((T2, r, block), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((T2, SD, Bp), jnp.float32),
                  jax.ShapeDtypeStruct((T2, SD, Bp), jnp.float32),
                  jax.ShapeDtypeStruct((1, Bp), jnp.float32)]
    out_specs = [tile3(SD), tile3(SD), tile2(1)]
    if reward_on:
        out_shapes.append(jax.ShapeDtypeStruct((T2, 1, Bp), jnp.float32))
        out_specs.append(tile3(1))

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tile2(SD), tile2(2 * O), tile2(2 * O), tile3(4 * O),
                  tile3(4 * O),
                  pl.BlockSpec((T2, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  tile3(SD)]
        + [full(w) for w in weights],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zt, cmt, cst, smt, sst, att, ept, *weights)

    z = jnp.moveaxis(outs[0], 2, 0)[:B].reshape(B, T2, O, D)
    z_mean = jnp.moveaxis(outs[1], 2, 0)[:B].reshape(B, T2, O, D)
    kl = outs[2][0, :B]
    rewards = (outs[3][:, 0, :B].T if reward_on
               else jnp.zeros((B, T2), jnp.float32))
    return z, z_mean, kl, rewards
