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
    std_open: jnp.ndarray  # (B, O, 6+cl) OPEN-LOOP process-noise std.  The
    #   filter std above must cover posterior-sample jitter (it scores
    #   sampled z_t in the ELBO), which overstates true process noise ~2×
    #   in sampled long rollouts (round-2 gravity energy inflation).  When
    #   cfg.open_loop_sigma is on this second head is trained on 1-step
    #   open-loop NLL against posterior MEANS and used by
    #   rollout(sample=True); otherwise it aliases std.


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
        # relational features and the pairwise attention score share one
        # MLP trunk (outputs h+1: h features + 1 attention logit) — halves
        # the sequential pair-MLP matmuls inside the training scan, where
        # small-op serialization dominates (round-2 phase_bench)
        "rel": _mlp_init(k[2], [2 * h] + hid + [h + 1]),
        "out": _mlp_init(k[4], [2 * h] + hid + [d_out], scale=1.0),
    }
    # zero-init the final output layer: the transition starts as the identity
    # flow (Δv = Δℓ = 0, mid-range σ), which stabilizes early training
    params["out"][-1]["w"] = jnp.zeros_like(params["out"][-1]["w"])
    if cfg.open_loop_sigma:
        # OPEN-LOOP process-noise std head, fed STOP-GRADDED trunk features:
        # its NLL objective has magnitude ~|log σ|·dims ≈ 40+ per window and
        # sharing the trunk let that gradient wreck the dynamics features
        # (measured: gravity detect_mse 0.13 vs 0.0004, kl −26 vs −12).
        # A detached head calibrates σ_open with ZERO influence on the mean
        # dynamics or the filter.
        ko = jax.random.fold_in(key, 17)
        params["open"] = _mlp_init(ko, [2 * h, h, 4 + cfg.cl])
    if cfg.reward_head:
        # per-object reward attribution: each object gets a score from its
        # (self, relational, contact-gap) features; a learned attention
        # pools the scores so the head can single out the agent ball (the
        # avoidance reward depends only on the controlled ball's contact,
        # and slots are permutation-arbitrary)
        kr, ka = jax.random.split(k[5])
        d_rf = 2 * h + 2
        params["reward"] = _mlp_init(kr, [d_rf] + hid + [1])
        params["reward_att"] = _mlp_init(ka, [d_rf] + hid + [1])
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

    # pair features for ordered pairs (receiver o listens to sender j).
    # The first rel layer on concat(e_o, e_j) factors exactly into two
    # (B·O, h) matmuls + a broadcast add — the (B, O, O, 2h) concat tensor
    # never materializes (it dominated rollout HBM traffic; same math,
    # reordered contraction):  W·[e_o; e_j] = W_recv·e_o + W_send·e_j
    w1, rest = params["rel"][0], params["rel"][1:]
    h_e = e.shape[-1]
    ecd = e.astype(cd)
    recv = jnp.dot(ecd, w1["w"][:h_e].astype(cd),
                   preferred_element_type=jnp.float32)        # (B, O, h)
    send = jnp.dot(ecd, w1["w"][h_e:].astype(cd),
                   preferred_element_type=jnp.float32)
    pair_h = jax.nn.relu(recv[:, :, None, :] + send[:, None, :, :]
                         + w1["b"])                           # (B, O, O, h)
    rel_att = _mlp(rest, pair_h, dtype=cd)                    # (B, O, O, h+1)
    rel = rel_att[..., :-1]
    att = jax.nn.sigmoid(rel_att[..., -1:])                   # (B, O, O, 1)
    mask = (1.0 - jnp.eye(O, dtype=z.dtype))[None, :, :, None]
    r = jnp.sum(rel * att * mask, axis=2)                     # (B, O, h)

    out = _mlp(params["out"], jnp.concatenate([s, r], -1),
               dtype=cd)                                      # (B, O, d_out)
    dv = out[..., 0:2]
    dl = out[..., 2:2 + cfg.cl]
    raw_std = out[..., 2 + cfg.cl:6 + 2 * cfg.cl]

    vel = z[..., VEL] + dv
    pos = z[..., POS] + vel
    lat = (z[..., LAT] + dl) if cfg.latent_residual else dl
    mean = jnp.concatenate([z[..., SIZE], pos, vel, lat], axis=-1)

    std_pvl = gaussians.bounded_std(raw_std, cfg.min_dyn_std, cfg.max_dyn_std)
    size_std = jnp.full_like(z[..., SIZE], cfg.size_std)
    std = jnp.concatenate([size_std, std_pvl], axis=-1)
    if cfg.open_loop_sigma and "open" in params:
        # detached head (see init_params): NLL gradients stop here
        feats = jax.lax.stop_gradient(jnp.concatenate([s, r], -1))
        raw_open = _mlp(params["open"], feats, dtype=cd)
        open_pvl = gaussians.bounded_std(raw_open, cfg.min_open_std,
                                         cfg.max_dyn_std)
        std_open = jnp.concatenate([size_std, open_pvl], axis=-1)
    else:
        std_open = std

    if cfg.reward_head and "reward" in params:
        # collision geometry of the *predicted* next state: contact happens
        # when |p_o − p_j| < r_o + r_j, and in model units the inferred box
        # scale IS the ball radius (scale s covers fraction s of the 2-wide
        # image → radius s).  Feed each object its signed contact gap
        # min_j(dist − (s_o + s_j)) and raw min distance, then let a learned
        # attention pool per-object scores — the reward depends only on the
        # agent ball's contact, and attention can find the agent from its
        # action-correlated embedding (slots are permutation-arbitrary).
        ppos = mean[..., POS]
        psize = jnp.mean(mean[..., SIZE], axis=-1)            # (B, O) radius
        pdiff = ppos[:, :, None, :] - ppos[:, None, :, :]
        pdist = jnp.sqrt(jnp.sum(pdiff**2, -1) + 1e-8)        # (B, O, O)
        gap = pdist - (psize[:, :, None] + psize[:, None, :])
        big = 10.0 * jnp.eye(O, dtype=z.dtype)[None]
        min_gap = jnp.min(gap + big, axis=-1)                 # (B, O)
        min_dist = jnp.min(pdist + big, axis=-1)              # (B, O)
        feat = jnp.concatenate(
            [s, r, min_gap[..., None], min_dist[..., None]], -1)
        score = _mlp(params["reward"], feat, dtype=cd)[..., 0]     # (B, O)
        att = jax.nn.softmax(
            _mlp(params["reward_att"], feat, dtype=cd)[..., 0], axis=-1)
        reward = jax.nn.sigmoid(jnp.sum(att * score, axis=-1))    # (B,)
    else:
        reward = jnp.zeros((B,), z.dtype)
    return DynOut(mean, std, reward, std_open)
