"""Diagonal-Gaussian algebra used throughout the STOVE state-space model.

The reference computes its posterior as a closed-form product of two
Gaussians inside the per-timestep python loop [ref:
model/video_prediction/stove.py; SURVEY.md §2.1 "Inference q"].  Here they
are pure jnp functions, usable inside `lax.scan` and differentiable.

All functions operate elementwise on matching-shape mean/std arrays
(diagonal covariance), so they broadcast over (B, O, D) without ceremony.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG2PI = math.log(2.0 * math.pi)


def log_prob(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Elementwise log N(x; mean, std²). Sum over trailing dims yourself."""
    z = (x - mean) / std
    return -0.5 * (z * z + _LOG2PI) - jnp.log(std)


def sample(key: jax.Array, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Reparameterized sample mean + std ⊙ ε."""
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def product(mean_a: jnp.ndarray, std_a: jnp.ndarray,
            mean_b: jnp.ndarray, std_b: jnp.ndarray,
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Product of two Gaussian densities, renormalized: precision-weighted.

    N(x; μa, σa²)·N(x; μb, σb²) ∝ N(x; μ, σ²) with
      1/σ² = 1/σa² + 1/σb²,   μ = σ²·(μa/σa² + μb/σb²).

    This is the STOVE posterior q(p_t|·) ∝ q_sup · p_dyn (SURVEY §2.1).
    Computed via variance form for numerical friendliness near small σ.
    """
    va, vb = std_a * std_a, std_b * std_b
    denom = va + vb
    var = va * vb / denom
    mean = (mean_a * vb + mean_b * va) / denom
    return mean, jnp.sqrt(var)


def kl(mean_q: jnp.ndarray, std_q: jnp.ndarray,
       mean_p: jnp.ndarray, std_p: jnp.ndarray) -> jnp.ndarray:
    """Elementwise KL(N_q || N_p) for diagonal Gaussians."""
    vq, vp = std_q * std_q, std_p * std_p
    return 0.5 * (vq / vp + (mean_q - mean_p) ** 2 / vp - 1.0) \
        + jnp.log(std_p) - jnp.log(std_q)


def entropy(std: jnp.ndarray) -> jnp.ndarray:
    """Elementwise differential entropy of N(·, std²)."""
    return 0.5 * (1.0 + _LOG2PI) + jnp.log(std)


def bounded_std(raw: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Map unconstrained raw values to std ∈ (lo, hi) via scaled sigmoid."""
    return lo + (hi - lo) * jax.nn.sigmoid(raw)
