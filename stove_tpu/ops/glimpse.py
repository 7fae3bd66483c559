"""Spatial-transformer glimpse extraction as separable dense matmuls.

The reference extracts per-object patches with `F.affine_grid` +
`F.grid_sample` (bilinear) [ref: model/video_prediction/supair.py patch
helper; SURVEY.md §2].  A gather-based bilinear sampler maps poorly onto TPU
(scalar/gather bound).  Because STOVE's boxes are axis-aligned (no rotation),
bilinear sampling is **separable**: the sampling grid factors into
per-row and per-column 1-D interpolations, so

    patch[ph, pw] = W_y (ph×H) · image (H×W) · W_xᵀ (W×pw)

where W_y / W_x are dense bilinear weight matrices (each row has ≤2 nonzeros,
built with a hat function — no gathers, no scatters).  The whole batched
extraction becomes two MXU matmuls; its transpose (the VJP) is the same
matmuls transposed, which XLA derives automatically.

Conventions: boxes are (sx, sy, tx, ty) in ST [−1, 1] coordinates
(align_corners=True, matching torch-1.x-era `grid_sample` used by the
reference); sampling outside the image clamps to the border.

Also provides the inverse-direction op the likelihood needs: a differentiable
soft mask of pixels covered by a box (background marginalization, SURVEY
§2.1 "Observation model").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _hat_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dense bilinear weight matrix.

    coords: (..., P) sampling positions in pixel units (align_corners=True:
    0 … size−1 spans the image).  Returns (..., P, size) where row p holds
    hat-function weights max(0, 1 − |coords_p − c|) over source pixels c —
    exactly linear interpolation with border clamping.
    """
    c = jnp.clip(coords, 0.0, size - 1.0)
    src = jnp.arange(size, dtype=coords.dtype)               # (size,)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - src))


def glimpse_weights(boxes: jnp.ndarray, img_size: int, patch_size: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-box interpolation matrices (W_y, W_x), each (..., patch, img).

    boxes: (..., 4) = (sx, sy, tx, ty) in [−1, 1] ST coords.
    """
    sx, sy, tx, ty = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    g = jnp.linspace(-1.0, 1.0, patch_size, dtype=boxes.dtype)  # patch grid
    u = tx[..., None] + sx[..., None] * g                     # (..., P) x-coords
    v = ty[..., None] + sy[..., None] * g                     # (..., P) y-coords
    half = (img_size - 1) / 2.0
    wx = _hat_weights((u + 1.0) * half, img_size)             # (..., P, W)
    wy = _hat_weights((v + 1.0) * half, img_size)             # (..., P, H)
    return wy, wx


def extract_glimpses(images: jnp.ndarray, boxes: jnp.ndarray,
                     patch_size: int) -> jnp.ndarray:
    """Batched patch extraction as separable dense matmuls.

    images: (B, H, W); boxes: (B, O, 4) → patches (B, O, patch, patch).
    Two einsums: rows then columns — both MXU matmuls; the VJP is the same
    matmuls transposed (scatter-free, which matters: box-dependent masks
    also flow through this op in the overlap-correction chain, so a
    gather-based forward would put scatter-adds on the training backward —
    measured 30× slower end-to-end, see `extract_glimpses_gather`).
    """
    H = images.shape[-2]
    wy, wx = glimpse_weights(boxes, H, patch_size)            # (B, O, P, H/W)
    rows = jnp.einsum("boph,bhw->bopw", wy, images)           # (B, O, P, W)
    return jnp.einsum("bopw,boqw->bopq", rows, wx)            # (B, O, P, P)


def extract_glimpses_gather(images: jnp.ndarray, boxes: jnp.ndarray,
                            patch_size: int) -> jnp.ndarray:
    """Patch extraction as 2-tap separable bilinear gather + lerp.

    images: (B, H, W); boxes: (B, O, 4) → patches (B, O, patch, patch).
    Same semantics as `extract_glimpses` / the map_coordinates oracle
    (align_corners=True, border clamp).  NOT used on the training path: its
    VJP w.r.t. `images` is a scatter-add, which is catastrophically slow on
    TPU (measured round 2: 35k → 1.1k windows/s when swapped in).  Kept as
    an inference-only alternative and as documentation of the measurement.
    """
    B, H, W = images.shape
    O = boxes.shape[1]
    P = patch_size
    dtype = images.dtype
    sx, sy, tx, ty = (boxes[..., 0], boxes[..., 1],
                      boxes[..., 2], boxes[..., 3])
    g = jnp.linspace(-1.0, 1.0, P, dtype=boxes.dtype)
    u = tx[..., None] + sx[..., None] * g                     # (B, O, P) x
    v = ty[..., None] + sy[..., None] * g                     # (B, O, P) y
    cx = jnp.clip((u + 1.0) * ((W - 1) / 2.0), 0.0, W - 1.0)
    cy = jnp.clip((v + 1.0) * ((H - 1) / 2.0), 0.0, H - 1.0)
    iy = jnp.clip(jnp.floor(cy), 0, H - 2).astype(jnp.int32)
    ix = jnp.clip(jnp.floor(cx), 0, W - 2).astype(jnp.int32)
    fy = (cy - iy).astype(dtype)                              # (B, O, P)
    fx = (cx - ix).astype(dtype)

    # rows: gather the two bracketing image rows per (o, p), lerp over y
    idx0 = iy.reshape(B, O * P, 1)
    r0 = jnp.take_along_axis(images, jnp.broadcast_to(idx0, (B, O * P, W)),
                             axis=1)
    r1 = jnp.take_along_axis(images,
                             jnp.broadcast_to(idx0 + 1, (B, O * P, W)),
                             axis=1)
    fyf = fy.reshape(B, O * P, 1)
    rows = r0 * (1.0 - fyf) + r1 * fyf                        # (B, O·P, W)

    # columns: per object (O ≤ ~6, unrolled), gather bracketing columns
    patches = []
    for o in range(O):
        rt = jnp.swapaxes(rows[:, o * P:(o + 1) * P, :], 1, 2)  # (B, W, P)
        jx = ix[:, o, :, None]                                # (B, Q, 1)
        c0 = jnp.take_along_axis(rt, jnp.broadcast_to(jx, (B, P, P)), axis=1)
        c1 = jnp.take_along_axis(rt, jnp.broadcast_to(jx + 1, (B, P, P)),
                                 axis=1)
        fxo = fx[:, o, :, None]                               # (B, Q, 1)
        col = c0 * (1.0 - fxo) + c1 * fxo                     # (B, Q, P)
        patches.append(jnp.swapaxes(col, 1, 2))               # (B, P, Q)
    return jnp.stack(patches, axis=1)                         # (B, O, P, P)


def paste_glimpses(patches: jnp.ndarray, boxes: jnp.ndarray, img_size: int
                   ) -> jnp.ndarray:
    """Transpose direction: scatter patches back into image space.

    patches: (B, O, P, P) → (B, O, H, W) contribution images (the adjoint of
    `extract_glimpses`; used for visualization overlays and appearance
    rendering).  Rows of W are normalized so repeated pixels average.
    """
    wy, wx = glimpse_weights(boxes, img_size, patches.shape[-1])
    # normalize columns (sum over patch rows) to make this an average paste
    ny = wy / (jnp.sum(wy, axis=-2, keepdims=True) + 1e-6)
    nx = wx / (jnp.sum(wx, axis=-2, keepdims=True) + 1e-6)
    rows = jnp.einsum("boph,bopq->bohq", ny, patches)         # (B, O, H, P)
    return jnp.einsum("bohq,boqw->bohw", rows, nx)            # (B, O, H, W)


def box_coverage(boxes: jnp.ndarray, img_size: int, sharpness: float = 8.0
                 ) -> jnp.ndarray:
    """Differentiable per-pixel box coverage masks.

    boxes: (B, O, 4) → (B, O, H, W) in (0, 1): ≈1 inside the box, ≈0 outside,
    with a sigmoid edge of width ~1/sharpness in ST units.  The background
    SPN marginalizes pixels where any object mask is on (SURVEY §2.1); the
    product over objects of (1−mask) gives the bg visibility weights.
    """
    dtype = boxes.dtype
    coord = jnp.linspace(-1.0, 1.0, img_size, dtype=dtype)    # pixel centers
    sx, sy, tx, ty = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])

    def edge(t, s, c):
        # inside distance: s − |c − t| (>0 inside), sharpened
        return jax.nn.sigmoid(sharpness * (s[..., None] - jnp.abs(c - t[..., None])) / jnp.maximum(s[..., None], 1e-3))

    mx = edge(tx, sx, coord)                                  # (B, O, W)
    my = edge(ty, sy, coord)                                  # (B, O, H)
    return my[..., :, None] * mx[..., None, :]                # (B, O, H, W)


def background_visibility(boxes: jnp.ndarray, img_size: int,
                          sharpness: float = 8.0) -> jnp.ndarray:
    """(B, H, W) weight per pixel for the background SPN: Π_o (1 − cover_o)."""
    cover = box_coverage(boxes, img_size, sharpness)
    return jnp.prod(1.0 - cover, axis=1)


def reference_bilinear(image: jnp.ndarray, boxes: jnp.ndarray, patch_size: int
                       ) -> jnp.ndarray:
    """Slow oracle: per-pixel bilinear gather via map_coordinates.

    Used only in tests to pin `extract_glimpses` to classic grid-sample
    semantics (align_corners=True, border clamp).
    """
    H, W = image.shape

    def one(box):
        sx, sy, tx, ty = box
        g = jnp.linspace(-1.0, 1.0, patch_size)
        u = tx + sx * g                                       # x
        v = ty + sy * g                                       # y
        px = jnp.clip((u + 1.0) * (W - 1) / 2.0, 0, W - 1)
        py = jnp.clip((v + 1.0) * (H - 1) / 2.0, 0, H - 1)
        yy, xx = jnp.meshgrid(py, px, indexing="ij")
        return jax.scipy.ndimage.map_coordinates(image, [yy, xx], order=1)

    return jax.vmap(one)(boxes)
