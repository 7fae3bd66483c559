"""Visualization: frame grids and rollout gifs with box overlays.

Reference parity [ref: visualize.py(?); SURVEY.md §2 "Visualization"]:
matplotlib frame grids and gifs of true vs reconstructed vs predicted
rollouts with bounding boxes overlaid.  Implemented with PIL only (no
matplotlib dependency on the hot path); gifs are assembled from upscaled
frames with per-object colored box outlines.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from stove_tpu.config import Config

# distinct RGB colors per object slot
_COLORS = np.array([
    [255, 80, 80], [80, 255, 80], [100, 140, 255],
    [255, 220, 80], [255, 100, 255], [80, 255, 255],
], dtype=np.uint8)


def _to_rgb(frame: np.ndarray, scale: int = 4) -> np.ndarray:
    """(H, W) float [0,1] → (H*s, W*s, 3) uint8."""
    img = np.clip(np.asarray(frame), 0.0, 1.0)
    img = (img * 255).astype(np.uint8)
    img = np.repeat(np.repeat(img, scale, 0), scale, 1)
    return np.stack([img] * 3, axis=-1)


def _draw_box(rgb: np.ndarray, box: np.ndarray, color: np.ndarray,
              scale: int = 4) -> None:
    """Draw one box outline in place.  box = (sx, sy, tx, ty) in [−1,1]."""
    H = rgb.shape[0]
    n = H // scale
    sx, sy, tx, ty = box
    half = (n - 1) / 2.0
    x0 = int(np.clip((tx - sx + 1) * half, 0, n - 1) * scale)
    x1 = int(np.clip((tx + sx + 1) * half, 0, n - 1) * scale) + scale - 1
    y0 = int(np.clip((ty - sy + 1) * half, 0, n - 1) * scale)
    y1 = int(np.clip((ty + sy + 1) * half, 0, n - 1) * scale) + scale - 1
    rgb[y0:y1 + 1, x0] = color
    rgb[y0:y1 + 1, x1] = color
    rgb[y0, x0:x1 + 1] = color
    rgb[y1, x0:x1 + 1] = color


def frames_to_gif(path: str, frames: np.ndarray,
                  boxes: Optional[np.ndarray] = None,
                  scale: int = 4, fps: int = 8) -> str:
    """frames (T, H, W) [0,1]; boxes (T, O, 4) optional → animated gif."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = []
    for t in range(frames.shape[0]):
        rgb = _to_rgb(frames[t], scale)
        if boxes is not None:
            for o in range(boxes.shape[1]):
                _draw_box(rgb, np.asarray(boxes[t, o]),
                          _COLORS[o % len(_COLORS)], scale)
        imgs.append(Image.fromarray(rgb))
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def side_by_side_gif(path: str, rows: Sequence[np.ndarray],
                     boxes: Optional[Sequence[Optional[np.ndarray]]] = None,
                     scale: int = 4, fps: int = 8) -> str:
    """Stack several (T, H, W) sequences horizontally (true | recon | pred)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    T = rows[0].shape[0]
    gap = 2 * scale
    imgs = []
    for t in range(T):
        panels = []
        for i, seq in enumerate(rows):
            rgb = _to_rgb(seq[t], scale)
            if boxes is not None and boxes[i] is not None:
                for o in range(boxes[i].shape[1]):
                    _draw_box(rgb, np.asarray(boxes[i][t, o]),
                              _COLORS[o % len(_COLORS)], scale)
            panels.append(rgb)
        H = panels[0].shape[0]
        sep = np.full((H, gap, 3), 60, np.uint8)
        row = panels[0]
        for p in panels[1:]:
            row = np.concatenate([row, sep, p], axis=1)
        imgs.append(Image.fromarray(row))
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def frame_grid(path: str, frames: np.ndarray,
               boxes: Optional[np.ndarray] = None,
               cols: int = 8, scale: int = 4) -> str:
    """(T, H, W) frames → one PNG grid image (reference's matplotlib frame
    grids [ref: visualize.py(?)], PIL-only)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    T = frames.shape[0]
    rows = (T + cols - 1) // cols
    H = frames.shape[1] * scale
    gap = scale
    canvas = np.full((rows * (H + gap) - gap, cols * (H + gap) - gap, 3),
                     30, np.uint8)
    for t in range(T):
        rgb = _to_rgb(frames[t], scale)
        if boxes is not None:
            for o in range(boxes.shape[1]):
                _draw_box(rgb, np.asarray(boxes[t, o]),
                          _COLORS[o % len(_COLORS)], scale)
        r, c = divmod(t, cols)
        y, x = r * (H + gap), c * (H + gap)
        canvas[y:y + H, x:x + H] = rgb
    Image.fromarray(canvas).save(path)
    return path


def render_states(cfg: Config, positions: np.ndarray, radii: np.ndarray
                  ) -> np.ndarray:
    """Render (T, O, 2) model-coordinate positions to (T, H, W) frames
    (for visualizing pure-latent rollouts)."""
    from stove_tpu.envs import physics
    from stove_tpu.envs.data import model_to_arena

    arena = model_to_arena(cfg, np.asarray(positions))
    return np.asarray(physics.render_sequence(
        cfg, arena, np.asarray(radii)))


def dump_rollout_gif(cfg: Config, run_dir: str, tag: str,
                     true_frames: np.ndarray, pred_pos_model: np.ndarray,
                     boxes: Optional[np.ndarray] = None,
                     pred_sizes: Optional[np.ndarray] = None) -> str:
    """true | predicted-rendered side-by-side gif for one sequence.

    pred_sizes (T, O, 2): the model's inferred box scales (fraction of
    image); when given, predicted balls render at the inferred size
    (radius = scale·arena/2) so size-estimate drift is visible in the gif."""
    if pred_sizes is not None:
        radii = np.mean(np.asarray(pred_sizes), axis=(0, 2)) \
            * cfg.arena_size / 2.0
    else:
        radii = np.full((pred_pos_model.shape[1],), cfg.ball_radius)
    pred_frames = render_states(cfg, pred_pos_model, radii)
    path = os.path.join(run_dir, f"rollout_{tag}.gif")
    return side_by_side_gif(path, [true_frames, pred_frames],
                            [boxes, None])
