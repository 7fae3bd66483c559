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


def extract_glimpses(images: jnp.ndarray, boxes: jnp.ndarray, patch_size: int
                     ) -> jnp.ndarray:
    """Batched patch extraction.

    images: (B, H, W); boxes: (B, O, 4) → patches (B, O, patch, patch).
    Two einsums: rows then columns — both MXU matmuls.
    """
    H = images.shape[-2]
    wy, wx = glimpse_weights(boxes, H, patch_size)            # (B, O, P, H/W)
    rows = jnp.einsum("boph,bhw->bopw", wy, images)           # (B, O, P, W)
    return jnp.einsum("bopw,boqw->bopq", rows, wx)            # (B, O, P, P)


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
