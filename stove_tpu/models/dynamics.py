"""Graph-net transition model p(z_t | z_{t−1}, a_{t−1}).

Mirrors the reference's `Dynamics` module [ref:
model/video_prediction/dynamics.py; SURVEY.md §2 + §2.1 "Transition"]:
per-object self-dynamics MLP, pairwise interaction MLP over all ordered pairs
weighted by a learned attention score and summed per object, an output MLP
producing (Δvelocity, Δlatent, per-dim transition σ), and an optional reward
head on the pooled relational embedding (action-conditioned variant).

State layout per object (model/ST coordinates, SURVEY §2.1 "State"):
    z_o = [sx, sy, x, y, vx, vy, ℓ_1..ℓ_cl]        (6 + cl dims)
Euler integration: v_t = v_{t−1} + Δv,  p_t = p_{t−1} + v_t;  sizes carried
with a small learned-free σ; latents are residual (configurable).

Everything is dense batched over (B, O) and (B, O, O) — at O=3 the pair
tensor is tiny and the MLPs dominate, which is exactly what the MXU wants.
The whole step is one fused XLA computation inside the training/rollout scan.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stove_tpu.config import Config
from stove_tpu.ops import gaussians

# state slicing
SIZE = slice(0, 2)
POS = slice(2, 4)
VEL = slice(4, 6)
LAT = slice(6, None)


class DynOut(NamedTuple):
    mean: jnp.ndarray     # (B, O, 6+cl) predicted next-state mean
    std: jnp.ndarray      # (B, O, 6+cl) transition std (sizes get size_std)
    reward: jnp.ndarray   # (B,) predicted reward in [0, 1] (zeros if no head)


def _mlp_init(key, sizes, scale=2.0):
    layers = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, din, dout in zip(keys, sizes[:-1], sizes[1:]):
        layers.append({
            "w": jax.random.normal(k, (din, dout)) * jnp.sqrt(scale / din),
            "b": jnp.zeros((dout,)),
        })
    return layers


def _mlp(layers, x, final_act=None, dtype=jnp.float32):
    """MLP with configurable matmul operand dtype (f32 accumulation)."""
    for i, lyr in enumerate(layers):
        x = jnp.dot(x.astype(dtype), lyr["w"].astype(dtype),
                    preferred_element_type=jnp.float32) + lyr["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return final_act(x) if final_act is not None else x


def init_params(key: jax.Array, cfg: Config) -> Dict:
    h = cfg.dyn_hidden
    d_in = cfg.full_state_dim + (cfg.num_actions if cfg.action_conditioned else 0)
    d_out = 2 + cfg.cl + (4 + cfg.cl)  # Δv, Δℓ, raw stds for pos/vel/lat
    hid = [h] * cfg.dyn_layers
    k = jax.random.split(key, 6)
    params = {
        "embed": _mlp_init(k[0], [d_in] + hid),
        "self": _mlp_init(k[1], [h] + hid),
        "rel": _mlp_init(k[2], [2 * h] + hid),
        "att": _mlp_init(k[3], [2 * h] + hid + [1]),
        "out": _mlp_init(k[4], [2 * h] + hid + [d_out], scale=1.0),
    }
    # zero-init the final output layer: the transition starts as the identity
    # flow (Δv = Δℓ = 0, mid-range σ), which stabilizes early training
    params["out"][-1]["w"] = jnp.zeros_like(params["out"][-1]["w"])
    if cfg.reward_head:
        # +2: min/mean pairwise-distance features of predicted positions
        params["reward"] = _mlp_init(k[5], [h + 2] + hid + [1])
    return params


def apply(params: Dict, cfg: Config, z: jnp.ndarray,
          action: Optional[jnp.ndarray] = None) -> DynOut:
    """One transition step.

    z: (B, O, 6+cl) current state; action: (B,) int32 or None.
    Returns the Gaussian p(z_t | z_{t−1}, a) and predicted reward.
    """
    B, O, _ = z.shape
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    inp = z
    if cfg.action_conditioned:
        if action is None:
            action = jnp.zeros((B,), jnp.int32)
        onehot = jax.nn.one_hot(action, cfg.num_actions, dtype=z.dtype)
        inp = jnp.concatenate([z, jnp.tile(onehot[:, None, :], (1, O, 1))], -1)

    e = _mlp(params["embed"], inp, dtype=cd)                  # (B, O, h)
    s = _mlp(params["self"], e, dtype=cd)                     # (B, O, h)

    # ordered pair tensor (B, O, O, 2h): receiver o listens to sender j
    pair = jnp.concatenate([
        jnp.broadcast_to(e[:, :, None, :], (B, O, O, e.shape[-1])),
        jnp.broadcast_to(e[:, None, :, :], (B, O, O, e.shape[-1])),
    ], axis=-1)
    rel = _mlp(params["rel"], pair, dtype=cd)                 # (B, O, O, h)
    att = jax.nn.sigmoid(_mlp(params["att"], pair, dtype=cd))  # (B, O, O, 1)
    mask = (1.0 - jnp.eye(O, dtype=z.dtype))[None, :, :, None]
    r = jnp.sum(rel * att * mask, axis=2)                     # (B, O, h)

    out = _mlp(params["out"], jnp.concatenate([s, r], -1),
               dtype=cd)                                      # (B, O, d_out)
    dv = out[..., 0:2]
    dl = out[..., 2:2 + cfg.cl]
    raw_std = out[..., 2 + cfg.cl:]

    vel = z[..., VEL] + dv
    pos = z[..., POS] + vel
    lat = (z[..., LAT] + dl) if cfg.latent_residual else dl
    mean = jnp.concatenate([z[..., SIZE], pos, vel, lat], axis=-1)

    std_pvl = gaussians.bounded_std(raw_std, cfg.min_dyn_std, cfg.max_dyn_std)
    std = jnp.concatenate([
        jnp.full_like(z[..., SIZE], cfg.size_std),
        std_pvl,
    ], axis=-1)

    if cfg.reward_head and "reward" in params:
        pooled = jnp.mean(r, axis=1)                          # (B, h)
        # collision geometry of the *predicted* next positions: the avoidance
        # reward is a function of post-transition contact, so feed the head
        # the pairwise-distance summary directly (permutation invariant)
        ppos = mean[..., POS]
        pdiff = ppos[:, :, None, :] - ppos[:, None, :, :]
        pdist = jnp.sqrt(jnp.sum(pdiff**2, -1) + 1e-8)
        pdist = pdist + 10.0 * jnp.eye(O, dtype=z.dtype)[None]
        mind = jnp.min(pdist, axis=-1)                        # (B, O)
        geom = jnp.stack([jnp.min(mind, -1), jnp.mean(mind, -1)], -1)
        reward = jax.nn.sigmoid(_mlp(
            params["reward"], jnp.concatenate([pooled, geom], -1),
            dtype=cd))[..., 0]
    else:
        reward = jnp.zeros((B,), z.dtype)
    return DynOut(mean, std, reward)
