"""RAT-SPN (random tensorized sum-product network) as dense log-space einsums.

The reference vendors a PyTorch port of RAT-SPN (Peharz et al. 2019) for the
SuPAIR appearance model [ref: model/video_prediction/rat_spn.py,
region_graph.py(?); SURVEY.md §2].  That implementation walks a region-graph
object per layer.  Here the region graph is *fixed at init* and lowered into a
static stack of dense tensor ops, so the whole SPN evaluation is a handful of
MXU matmuls + logsumexp — no graph interpretation, no sparsity, no gathers:

* Each repetition r draws a random permutation of the variables and splits it
  into balanced halves recursively (depth D).  Region k at depth d has
  children 2k, 2k+1 at depth d+1 — so product-layer pairing is a pure
  reshape, and leaf scopes are one (R, L, V) 0/1 matrix.
* Leaves: per repetition, per variable, I Gaussian components — params
  (R, V, I).  A leaf *region*'s i-th distribution is the product of its
  scope's per-variable components: one matmul with the scope matrix.
* Product layers: outer sums of log-probs over channel pairs (VPU).
* Sum layers: log-mixtures over children = exp-normalize + matmul + log (MXU).
* Root: learned mixture over all repetitions' top sums.

**Marginalization** (the key SuPAIR requirement — scoring the background with
object pixels integrated out): a per-pixel weight w ∈ [0, 1] multiplies the
per-variable leaf log-likelihoods.  w=0 reproduces exact SPN marginalization
(the integrated-out leaf contributes log 1 = 0); fractional w gives the
differentiable soft masks the box gradients need.

Everything is shape-static; `spn_log_prob` jits, vmaps, and shards freely.
A deliberately naive numpy evaluator (`spn_log_prob_numpy`) walks the region
tree recursively and serves as the golden oracle in tests (SURVEY.md §7
"hard parts": mitigate RAT-SPN divergence with a slow oracle).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SpnSpec(NamedTuple):
    """Static structure of one RAT-SPN (captured in closures, not traced)."""
    num_vars: int
    depth: int            # D recursive splits → 2^D leaf regions per rep
    num_sums: int         # S sum nodes per internal region
    num_leaves: int       # I Gaussian components per (rep, variable)
    num_reps: int         # R repetitions (independent random region graphs)
    perms: np.ndarray     # (R, V) variable permutation per repetition
    scopes: np.ndarray    # (R, 2^D, V) float32 leaf-region scope matrix
    min_std: float
    max_std: float

    @property
    def num_leaf_regions(self) -> int:
        return 2 ** self.depth


def _region_slices(num_vars: int, depth: int):
    """Balanced contiguous chunk boundaries for 2^depth regions."""
    bounds = np.linspace(0, num_vars, 2 ** depth + 1).round().astype(int)
    return [(bounds[k], bounds[k + 1]) for k in range(2 ** depth)]


def make_spec(key: jax.Array, num_vars: int, depth: int, num_sums: int,
              num_leaves: int, num_reps: int,
              min_std: float = 0.05, max_std: float = 1.0) -> SpnSpec:
    assert 2 ** depth <= num_vars, "more leaf regions than variables"
    seeds = jax.random.randint(key, (num_reps,), 0, 2**31 - 1)
    perms = np.stack([
        np.random.RandomState(int(s)).permutation(num_vars) for s in seeds
    ])
    L = 2 ** depth
    scopes = np.zeros((num_reps, L, num_vars), dtype=np.float32)
    for r in range(num_reps):
        for k, (a, b) in enumerate(_region_slices(num_vars, depth)):
            scopes[r, k, perms[r, a:b]] = 1.0
    return SpnSpec(num_vars, depth, num_sums, num_leaves, num_reps,
                   perms, scopes, min_std, max_std)


def init_params(key: jax.Array, spec: SpnSpec) -> Dict[str, jnp.ndarray]:
    """Parameter pytree: Gaussian leaves + sum-layer logits + root logits."""
    R, V, I, S, D = (spec.num_reps, spec.num_vars, spec.num_leaves,
                     spec.num_sums, spec.depth)
    k_mu, k_sig, *k_sums = jax.random.split(key, 2 + D + 1)
    params: Dict[str, jnp.ndarray] = {
        # pixel intensities live in [0, 1]; spread means across that range
        "leaf_mu": jax.random.uniform(k_mu, (R, V, I), minval=0.0, maxval=1.0),
        "leaf_raw_std": 0.5 * jax.random.normal(k_sig, (R, V, I)),
    }
    # sum layer at depth d mixes the products of depth-(d+1) regions:
    # channels in = c_{d+1}², channels out = S (1 learned root handles depth 0)
    c = I
    for d in range(D - 1, -1, -1):
        P = 2 ** d
        params[f"sum_logits_{d}"] = 0.01 * jax.random.normal(
            k_sums[d], (R, P, S, c * c))
        c = S
    params["root_logits"] = 0.01 * jax.random.normal(k_sums[-1], (R * S,))
    return params


def _leaf_std(spec: SpnSpec, raw: jnp.ndarray) -> jnp.ndarray:
    return spec.min_std + (spec.max_std - spec.min_std) * jax.nn.sigmoid(raw)


_LOG2PI = float(np.log(2.0 * np.pi))


def spn_log_prob(spec: SpnSpec, params: Dict[str, jnp.ndarray],
                 x: jnp.ndarray, weight: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """log p(x) under the RAT-SPN.  x: (B, V); weight: (B, V) in [0,1] or None.

    weight[b, v] = 0 marginalizes variable v out of sample b exactly.
    Returns (B,).
    """
    R, I, S, D = spec.num_reps, spec.num_leaves, spec.num_sums, spec.depth
    mu = params["leaf_mu"]                                    # (R, V, I)
    std = _leaf_std(spec, params["leaf_raw_std"])
    z = (x[:, None, :, None] - mu[None]) / std[None]          # (B, R, V, I)
    ll = -0.5 * (z * z + _LOG2PI) - jnp.log(std)[None]
    if weight is not None:
        ll = ll * weight[:, None, :, None]
    scope = jnp.asarray(spec.scopes)                          # (R, L, V)
    # HIGHEST: log-densities accumulate to O(100s); default TPU bf16 matmul
    # passes would cost ~0.5 nats of error per patch
    acts = jnp.einsum("brvi,rlv->brli", ll, scope,
                      precision=jax.lax.Precision.HIGHEST)    # (B, R, L, I)

    for d in range(D - 1, -1, -1):
        left = acts[:, :, 0::2, :, None]                      # (B,R,P,c,1)
        right = acts[:, :, 1::2, None, :]                     # (B,R,P,1,c)
        prod = (left + right).reshape(
            acts.shape[0], R, acts.shape[2] // 2, -1)         # (B,R,P,c²)
        logw = jax.nn.log_softmax(params[f"sum_logits_{d}"], axis=-1)
        m = jax.lax.stop_gradient(jnp.max(prod, axis=-1, keepdims=True))
        # exp-normalize then mix in probability space: one MXU matmul
        mixed = jnp.einsum("brpc,rpsc->brps", jnp.exp(prod - m),
                           jnp.exp(logw),
                           precision=jax.lax.Precision.HIGHEST)
        acts = jnp.log(jnp.maximum(mixed, 1e-38)) + m         # (B,R,P,S)

    top = acts.reshape(acts.shape[0], R * S)                  # depth-0 sums
    root_logw = jax.nn.log_softmax(params["root_logits"])
    return jax.scipy.special.logsumexp(top + root_logw[None], axis=-1)


def spn_log_prob_matmul(spec: SpnSpec, params: Dict[str, jnp.ndarray],
                        x: jnp.ndarray, weight: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """`spn_log_prob` with the leaf stage restructured as three MXU matmuls.

    The dense path materializes ll (B, R, V, I) — for the background SPN at
    training batch sizes that is hundreds of MB of HBM traffic per step and
    dominates the train-step time (round-1 MFU finding).  Expanding the
    Gaussian log-density in powers of x,

        w·ll[b,r,v,i] = −½ (w x²)[b,v] a2[r,v,i] + (w x)[b,v] a1[r,v,i]
                        − w[b,v] c0[r,v,i],
        a2 = 1/σ², a1 = μ/σ², c0 = ½μ²/σ² + ½log 2π + log σ,

    lets the scope contraction Σ_v scope[r,l,v] · (w·ll) fold into the
    coefficients: acts (B, R·L·I) = three (B, V) @ (V, R·L·I) matmuls with
    parameter-only matrices M_k[v, rli] = scope[r,l,v]·coef_k[r,v,i].  No
    (B,R,V,I) tensor ever exists.  Mathematically identical to
    `spn_log_prob` up to f32 summation order (golden-tested).
    """
    R, I, S, D = spec.num_reps, spec.num_leaves, spec.num_sums, spec.depth
    B, V = x.shape
    L = spec.num_leaf_regions
    if weight is None:
        weight = jnp.ones_like(x)

    mu = params["leaf_mu"]                                    # (R, V, I)
    std = _leaf_std(spec, params["leaf_raw_std"])
    a2 = 1.0 / (std * std)
    a1 = mu * a2
    c0 = 0.5 * mu * mu * a2 + 0.5 * _LOG2PI + jnp.log(std)
    scope = jnp.asarray(spec.scopes)                          # (R, L, V)

    def fold(coef):                                           # (V, R·L·I)
        return jnp.einsum("rlv,rvi->vrli", scope, coef,
                          precision=jax.lax.Precision.HIGHEST
                          ).reshape(V, R * L * I)

    # HIGH (bf16x3) carries ~f32 accuracy at half the pass count of HIGHEST;
    # verified against the dense/oracle paths in tests at V=1024 scale
    hi = jax.lax.Precision.HIGH
    acts = (-0.5 * jnp.dot(weight * x * x, fold(a2), precision=hi)
            + jnp.dot(weight * x, fold(a1), precision=hi)
            - jnp.dot(weight, fold(c0), precision=hi))
    acts = acts.reshape(B, R, L, I)

    for d in range(D - 1, -1, -1):
        left = acts[:, :, 0::2, :, None]                      # (B,R,P,c,1)
        right = acts[:, :, 1::2, None, :]                     # (B,R,P,1,c)
        prod = (left + right).reshape(
            acts.shape[0], R, acts.shape[2] // 2, -1)         # (B,R,P,c²)
        logw = jax.nn.log_softmax(params[f"sum_logits_{d}"], axis=-1)
        m = jax.lax.stop_gradient(jnp.max(prod, axis=-1, keepdims=True))
        mixed = jnp.einsum("brpc,rpsc->brps", jnp.exp(prod - m),
                           jnp.exp(logw),
                           precision=jax.lax.Precision.HIGHEST)
        acts = jnp.log(jnp.maximum(mixed, 1e-38)) + m         # (B,R,P,S)

    top = acts.reshape(acts.shape[0], R * S)
    root_logw = jax.nn.log_softmax(params["root_logits"])
    return jax.scipy.special.logsumexp(top + root_logw[None], axis=-1)


# --------------------------------------------------------------------------
# numpy oracle (tests only)
# --------------------------------------------------------------------------

def spn_log_prob_numpy(spec: SpnSpec, params, x: np.ndarray,
                       weight: Optional[np.ndarray] = None) -> np.ndarray:
    """Naive recursive evaluation over the region tree.  Independent of the
    tensorized path: walks regions via the permutation chunks, uses explicit
    loops and scipy logsumexp.  Slow; for golden tests.
    """
    from scipy.special import log_softmax, logsumexp

    p = {k: np.asarray(v) for k, v in params.items()}
    R, I, S, D = spec.num_reps, spec.num_leaves, spec.num_sums, spec.depth
    B, V = x.shape
    w = np.ones_like(x) if weight is None else np.asarray(weight)
    std = spec.min_std + (spec.max_std - spec.min_std) / (
        1.0 + np.exp(-p["leaf_raw_std"]))
    mu = p["leaf_mu"]

    def leaf_ll(r, var_ids):
        """(B, I): factorized Gaussian log-lik over the given variables."""
        out = np.zeros((B, I))
        for v in var_ids:
            zz = (x[:, v, None] - mu[r, v][None]) / std[r, v][None]
            lv = -0.5 * (zz**2 + _LOG2PI) - np.log(std[r, v])[None]
            out += lv * w[:, v, None]
        return out

    def eval_region(r, d, k):
        """(B, C) log-likelihoods of region k at depth d in repetition r."""
        if d == spec.depth:
            a, b = _region_slices(V, spec.depth)[k]
            return leaf_ll(r, spec.perms[r, a:b])
        left = eval_region(r, d + 1, 2 * k)
        right = eval_region(r, d + 1, 2 * k + 1)
        prod = (left[:, :, None] + right[:, None, :]).reshape(B, -1)
        logw = log_softmax(p[f"sum_logits_{d}"][r, k], axis=-1)  # (S, c²)
        return logsumexp(prod[:, None, :] + logw[None], axis=-1)  # (B, S)

    tops = np.concatenate([eval_region(r, 0, 0) for r in range(R)], axis=1)
    root_logw = log_softmax(p["root_logits"])
    return logsumexp(tops + root_logw[None], axis=-1)
