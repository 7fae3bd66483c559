"""Per-frame encoder CNN: image → q(z_where) box parameters per object.

The reference's `EncoderNet` [ref: model/video_prediction/supair.py; SURVEY.md
§2] predicts, for each of O objects, mean and variance of the bounding-box
parameters (sx, sy, tx, ty) in one forward pass (no autoregression over
objects — all slots at once, which is exactly what batching on TPU wants).

Implemented as a plain pytree of params + pure functions (no flax module
state): conv stack with stride-2 downsampling → MLP → (O, 8) outputs.
Scale means are squashed into [scale_min, scale_max] (config bounds),
positions into (−1, 1); stds are sigmoid-bounded (SURVEY §5.6 keys
`min_enc_std`/`max_enc_std`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from stove_tpu.config import Config
from stove_tpu.ops import gaussians


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((cout,))}


def _dense_init(key, din, dout, scale=1.0):
    w = jax.random.normal(key, (din, dout)) * jnp.sqrt(scale / din)
    return {"w": w, "b": jnp.zeros((dout,))}


def init_params(key: jax.Array, cfg: Config) -> Dict:
    keys = jax.random.split(key, len(cfg.encoder_channels) + 3)
    params: Dict = {"convs": []}
    s2d = max(1, cfg.encoder_space_to_depth)
    cin = cfg.channels * s2d * s2d
    size = cfg.img_size // s2d
    n_convs = len(cfg.encoder_channels)
    for i, cout in enumerate(cfg.encoder_channels):
        params["convs"].append(_conv_init(keys[i], 3, 3, cin, cout))
        cin = cout
        if not (cfg.encoder_final_stride1 and i == n_convs - 1):
            size = (size + 1) // 2  # stride-2
    flat = size * size * cin
    params["mlp1"] = _dense_init(keys[-3], flat, cfg.encoder_mlp_hidden, 2.0)
    params["mlp2"] = _dense_init(keys[-2], cfg.encoder_mlp_hidden,
                                 cfg.encoder_mlp_hidden, 2.0)
    # 8 outputs per object: 4 means + 4 raw stds; small init so boxes start
    # near the center with mid-range scales
    params["head"] = _dense_init(keys[-1], cfg.encoder_mlp_hidden,
                                 cfg.num_obj * 8, 0.01)
    return params


def apply(params: Dict, cfg: Config, frames: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frames (B, H, W) → (mean, std), each (B, O, 4) = (sx, sy, tx, ty).

    Runs every frame independently — callers flatten (batch, time) together
    so the whole window's encoding is one big MXU-friendly batch
    (SURVEY §3.2: encoder runs over B·T at once).

    With cfg.compute_dtype="bfloat16" the conv/matmul operands run in bf16
    on the MXU with float32 accumulation (box params stay f32 downstream).
    """
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x = frames[..., None].astype(cd)                          # (B, H, W, 1)
    s2d = max(1, cfg.encoder_space_to_depth)
    if s2d > 1:
        # space-to-depth: an s×s pixel block becomes s² input channels.
        # The first conv otherwise contracts only 3·3·1 = 9 values — a ~7%
        # MXU occupancy; s=2 quadruples the contraction (and quarters the
        # spatial work of the whole stack) at identical information content.
        B, H, W, C = x.shape
        x = x.reshape(B, H // s2d, s2d, W // s2d, s2d, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, H // s2d, W // s2d, s2d * s2d * C)
    n_convs = len(params["convs"])
    for i, conv in enumerate(params["convs"]):
        # operands in cd; MXU accumulates f32 internally.  No
        # preferred_element_type here: its transpose (backward) rejects the
        # mixed bf16-operand/f32-cotangent combination.
        stride = (1, 1) if (cfg.encoder_final_stride1
                            and i == n_convs - 1) else (2, 2)
        x = jax.lax.conv_general_dilated(
            x, conv["w"].astype(cd), window_strides=stride, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x.astype(jnp.float32) + conv["b"]).astype(cd)
    x = x.reshape(x.shape[0], -1)

    def dense(layer, v):
        return jnp.dot(v, layer["w"].astype(cd),
                       preferred_element_type=jnp.float32) + layer["b"]

    x = jax.nn.relu(dense(params["mlp1"], x)).astype(cd)
    x = jax.nn.relu(dense(params["mlp2"], x)).astype(cd)
    out = dense(params["head"], x)
    out = out.reshape(-1, cfg.num_obj, 8)
    raw_mean, raw_std = out[..., :4], out[..., 4:]

    smin, smax = cfg.scale_min, cfg.scale_max
    scales = smin + (smax - smin) * jax.nn.sigmoid(raw_mean[..., 0:2] + 0.5)
    pos = jnp.tanh(raw_mean[..., 2:4]) * (1.0 - smin)         # keep in frame
    mean = jnp.concatenate([scales, pos], axis=-1)
    std = gaussians.bounded_std(raw_std, cfg.min_enc_std, cfg.max_enc_std)
    return mean, std
