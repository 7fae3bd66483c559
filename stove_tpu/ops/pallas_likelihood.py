"""Pallas TPU kernel: the whole SuPAIR likelihood fused per batch tile.

The likelihood phase (glimpse extraction + patch-space overlap weights +
object SPNs + background visibility + background SPN) is the largest slice
of the train step after round 3 (BASELINE.md phase table), and the step is
HBM/latency-bound at ~1.75% MFU: every XLA stage boundary writes small,
badly-tiled intermediates — patches (B·O, P, P) pad their 10-wide lane dim
~13×, claim weights likewise, bg visibility is a full frame-sized tensor.
This kernel carries one batch tile from FRAME ROWS to the summed root
log-density with zero intermediate HBM traffic (VERDICT r4 task 3: apply
the whole-chain-fusion lesson of the rollout kernel to the likelihood).

In-kernel layout (batch on sublanes, pixels on lanes):

* glimpse rows:   for each (object, patch-row) the bilinear row weight is
  a hat function of the lane's image-row index — built by iota, applied as
  an elementwise multiply on the (TB, H·W) frame tile, contracted to
  (TB, W) by a static (H·W, W) block-sum matmul on the MXU.
* glimpse cols:   per patch-row, the row tile is lane-tiled to (TB, P·W),
  multiplied by the hat of per-lane column coordinates, and contracted to
  (TB, P) by a static (P·W, P) block-sum — patch vars appear in the same
  row-major (p·P+q) order the XLA path uses.
* overlap:        the separable sigmoid claim edges are (TB, 1) × (TB, P)
  broadcasts over the SAME sample coordinates as supair.likelihood's
  patch-space path (sharpness 8, max over earlier objects, clip).
* SPNs:           object and background SPNs reuse the proven fused body
  (ops/pallas_spn.spn_tile_body) on the in-register patches/frame.

Gradient: `likelihood_fused` carries a custom_vjp whose backward is XLA
autodiff of the mathematically identical dense path (supair.likelihood),
exactly like pallas_spn — training keeps XLA's fused backward, inference
and the forward half of training take the kernel.

Reference: [ref: model/video_prediction/supair.py likelihood — SURVEY.md
§2.1 "Observation model"; mount empty, see SURVEY §0].
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stove_tpu.models import spn as spn_lib
from stove_tpu.ops import pallas_spn


def _blocksum(n_blocks: int, width: int) -> jnp.ndarray:
    """(n_blocks·width, n_blocks) 0/1 matrix summing each width-lane block."""
    m = np.zeros((n_blocks * width, n_blocks), np.float32)
    for b in range(n_blocks):
        m[b * width:(b + 1) * width, b] = 1.0
    return jnp.asarray(m)


def _edge(t, s, c, sharpness=8.0):
    """Separable sigmoid box edge (identical to supair.likelihood's)."""
    return jax.nn.sigmoid(sharpness * (s - jnp.abs(c - t))
                          / jnp.maximum(s, 1e-3))


def _make_kernel(cfg, obj_spec: spn_lib.SpnSpec, bg_spec: spn_lib.SpnSpec,
                 tile: int):
    O, P, H = cfg.num_obj, cfg.patch_size, cfg.img_size
    V = H * H
    D_obj, D_bg = obj_spec.depth, bg_spec.depth
    half = (H - 1) / 2.0
    g = np.linspace(-1.0, 1.0, P)                    # static patch grid

    def kernel(frames_ref, boxes_ref, *refs):
        # obj SPN params, bg SPN params, 2 block-sum mats, out ref
        n_obj = 3 + D_obj * 2 + 1
        obj_refs = refs[:n_obj]
        bg_refs = refs[n_obj:n_obj + 3 + D_bg * 2 + 1]
        k = n_obj + 3 + D_bg * 2 + 1
        bsum_rows_ref, bsum_cols_ref = refs[k], refs[k + 1]
        out_ref = refs[k + 2]

        img = frames_ref[:]                                    # (TB, V)
        boxes = boxes_ref[:]                                   # (TB, 4O)

        # per-lane image coordinates of the flattened (h, w) pixel grid
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, V), 1)
        h_l = (lane // H).astype(jnp.float32)                  # image row
        w_l = (lane % H).astype(jnp.float32)                   # image col
        # per-lane fields of the (p·W + w) column workspace
        laneq = jax.lax.broadcasted_iota(jnp.int32, (tile, P * H), 1)
        q_l = (laneq // H).astype(jnp.float32)                 # patch col q
        wq_l = (laneq % H).astype(jnp.float32)                 # image col
        gq_l = -1.0 + q_l * (2.0 / (P - 1))                    # ST coord of q
        # per-lane patch-column index of a (p·P + q) patch workspace
        lanep = jax.lax.broadcasted_iota(jnp.int32, (tile, P), 1)
        gq_p = -1.0 + lanep.astype(jnp.float32) * (2.0 / (P - 1))

        def box(o):
            return (boxes[:, 4 * o:4 * o + 1], boxes[:, 4 * o + 1:4 * o + 2],
                    boxes[:, 4 * o + 2:4 * o + 3], boxes[:, 4 * o + 3:4 * o + 4])

        total = None
        for o in range(O):                                     # unrolled
            sx, sy, tx, ty = box(o)                            # (TB, 1) each

            # ---- glimpse: rows then columns, hat weights built by iota
            cxq = jnp.clip((tx + sx * gq_l + 1.0) * half, 0.0, H - 1.0)
            hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(cxq - wq_l))  # (TB, P·W)
            prow_tiles = []
            for p in range(P):                                 # unrolled
                cy = jnp.clip((ty + sy * g[p] + 1.0) * half, 0.0, H - 1.0)
                hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(cy - h_l))  # (TB, V)
                row = jnp.dot(img * hat_y, bsum_rows_ref[:],
                              preferred_element_type=jnp.float32)  # (TB, W)
                prow = jnp.dot(jnp.tile(row, (1, P)) * hat_x,
                               bsum_cols_ref[:],
                               preferred_element_type=jnp.float32)  # (TB, P)
                prow_tiles.append(prow)
            x_obj = jnp.concatenate(prow_tiles, axis=-1)       # (TB, P²)

            # ---- patch-space overlap weights at o's OWN sample coords
            if cfg.overlap_correction and o > 0:
                u_q = tx + sx * gq_p                           # (TB, P)
                w_tiles = []
                for p in range(P):
                    v_p = ty + sy * g[p]                       # (TB, 1)
                    claimed = None
                    for j in range(o):
                        sxj, syj, txj, tyj = box(j)
                        ey = _edge(tyj, syj, v_p)              # (TB, 1)
                        ex = _edge(txj, sxj, u_q)              # (TB, P)
                        c = ey * ex
                        claimed = c if claimed is None \
                            else jnp.maximum(claimed, c)
                    w_tiles.append(jnp.clip(1.0 - claimed, 0.0, 1.0))
                w_obj = jnp.concatenate(w_tiles, axis=-1)      # (TB, P²)
            else:
                w_obj = jnp.ones((tile, P * P), jnp.float32)

            ll_o = pallas_spn.spn_tile_body(
                obj_spec, tile, x_obj, w_obj, obj_refs[0], obj_refs[1],
                obj_refs[2], obj_refs[3:3 + D_obj],
                obj_refs[3 + D_obj:3 + 2 * D_obj], obj_refs[3 + 2 * D_obj])
            total = ll_o if total is None else total + ll_o

        # ---- background visibility: 1 − max_o cover_o on the pixel grid
        ycoord = -1.0 + h_l * (2.0 / (H - 1))                  # (TB, V)
        xcoord = -1.0 + w_l * (2.0 / (H - 1))
        if cfg.overlap_correction and O > 1:
            cover = None
            for o in range(O):
                sx, sy, tx, ty = box(o)
                c = _edge(ty, sy, ycoord) * _edge(tx, sx, xcoord)
                cover = c if cover is None else jnp.maximum(cover, c)
            bg_w = 1.0 - cover
        else:
            bg_w = jnp.ones((tile, V), jnp.float32)
            for o in range(O):
                sx, sy, tx, ty = box(o)
                bg_w = bg_w * (1.0 - _edge(ty, sy, ycoord)
                               * _edge(tx, sx, xcoord))

        ll_bg = pallas_spn.spn_tile_body(
            bg_spec, tile, img, bg_w, bg_refs[0], bg_refs[1], bg_refs[2],
            bg_refs[3:3 + D_bg], bg_refs[3 + D_bg:3 + 2 * D_bg],
            bg_refs[3 + 2 * D_bg])

        out_ref[:] = total + ll_bg

    return kernel


def _spn_inputs(spec, params):
    mu_t, std_t, scope_t, sum_w2t, root_logw = pallas_spn._prepare(
        spec, params)
    blocks = pallas_spn._blocksum_matrices(spec)
    return [mu_t, std_t, scope_t, *sum_w2t, *blocks,
            root_logw.reshape(1, -1)]


def _fused_forward(cfg, specs, params: Dict, frames, boxes, tile: int,
                   interpret: bool):
    """frames (B, H, W), boxes (B, O, 4) → (B,) log-likelihoods."""
    B = frames.shape[0]
    O, P, H = cfg.num_obj, cfg.patch_size, cfg.img_size
    V = H * H

    x = frames.reshape(B, V).astype(jnp.float32)
    bx = boxes.reshape(B, O * 4).astype(jnp.float32)
    pad = (-B) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        # pad boxes with unit-size off-center boxes (any finite value works
        # — padded rows are sliced off; avoid 0-size boxes only to keep the
        # kernel's divides well-behaved)
        bx = jnp.pad(bx, ((0, pad), (0, 0)), constant_values=0.5)
    Bp = B + pad

    obj_in = _spn_inputs(specs.obj, params["obj_spn"])
    bg_in = _spn_inputs(specs.bg, params["bg_spn"])
    # rows: contract the IMAGE-ROW index h out of lanes (h·W + w), keeping
    # w — a vertically tiled identity, NOT a block-diagonal sum
    bsum_rows = jnp.asarray(np.tile(np.eye(H, dtype=np.float32), (H, 1)))
    # cols: sum each W-lane block of the (q·W + w) workspace down to q
    bsum_cols = _blocksum(P, H)                                # (P·W, P)

    kernel = _make_kernel(cfg, specs.obj, specs.bg, tile)
    tile_spec = lambda n: pl.BlockSpec((tile, n), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    consts = obj_in + bg_in + [bsum_rows, bsum_cols]

    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[tile_spec(V), tile_spec(O * 4)]
        + [full(a) for a in consts],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, bx, *consts)
    return out[:B, 0]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6))
def likelihood_fused(cfg, specs, params: Dict, frames, boxes,
                     tile: int = 128, interpret: bool = False):
    """Drop-in fused replacement for `supair.likelihood` (patch-space
    overlap path).  params: the 'supair' param dict (obj_spn + bg_spn)."""
    return _fused_forward(cfg, specs, params, frames, boxes, tile,
                          interpret)


def _fwd(cfg, specs, params, frames, boxes, tile, interpret):
    out = _fused_forward(cfg, specs, params, frames, boxes, tile, interpret)
    return out, (params, frames, boxes)


def _bwd(cfg, specs, tile, interpret, res, grad):
    params, frames, boxes = res
    from stove_tpu.models import supair as supair_lib

    _, vjp = jax.vjp(
        lambda p, f, b: supair_lib.likelihood(p, cfg, specs, f, b),
        params, frames, boxes)
    dp, df, db = vjp(grad)
    return dp, df, db


likelihood_fused.defvjp(_fwd, _bwd)
