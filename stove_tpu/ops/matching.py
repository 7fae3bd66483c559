"""Object matching for evaluation (predicted slots ↔ ground-truth objects).

The reference Hungarian-matches once at the rollout handoff and reports
per-step position MSE [ref: model/video_prediction/train.py eval; SURVEY.md
§3.3].  For STOVE's object counts (O ≤ 5) an exact assignment by static
enumeration of all O! permutations is cheaper than a host round-trip and is
jit-safe; scipy's `linear_sum_assignment` is kept as the host-side fallback
for larger O and as the test oracle.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def assignment_bruteforce(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment via permutation enumeration.

    cost: (..., O, O) where cost[..., i, j] matches row i to column j.
    Returns col indices (..., O): row i ↔ column out[..., i].  Jit-safe for
    O ≤ ~6 (O! static permutations).
    """
    O = cost.shape[-1]
    perms = jnp.asarray(list(itertools.permutations(range(O))))   # (P, O)
    rows = jnp.arange(O)
    totals = jnp.sum(cost[..., rows, perms], axis=-1)             # (..., P)
    best = jnp.argmin(totals, axis=-1)
    return perms[best]


def assignment(cost: np.ndarray) -> np.ndarray:
    """Host-side exact assignment (scipy) — test oracle / large-O fallback."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    if cost.ndim == 2:
        _, cols = linear_sum_assignment(cost)
        return cols
    out = np.zeros(cost.shape[:-1], dtype=np.int64)
    flat = cost.reshape(-1, *cost.shape[-2:])
    for i, c in enumerate(flat):
        _, cols = linear_sum_assignment(c)
        out.reshape(-1, cost.shape[-1])[i] = cols
    return out


def match_positions(pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    """Match predicted object slots to ground-truth objects by position.

    pred, true: (B, O, 2).  Returns permutation (B, O) such that
    pred[b, perm[b, i]] corresponds to true[b, i].
    """
    cost = jnp.sum((true[:, :, None, :] - pred[:, None, :, :]) ** 2, -1)
    return assignment_bruteforce(cost)


def apply_permutation(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Gather slots: x (B, O, ...) reordered by perm (B, O)."""
    B, O = perm.shape
    idx = perm.reshape(B, O, *([1] * (x.ndim - 2)))
    return jnp.take_along_axis(x, idx, axis=1)
