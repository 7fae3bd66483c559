"""STOVE: structured object-aware video prediction as a sequential VAE.

Mirrors the reference's `Stove` module [ref: model/video_prediction/stove.py;
SURVEY.md §2.1], glueing SuPAIR recognition and the graph-net dynamics into a
state-space model with the closed-form product-of-Gaussians posterior:

    q(p_t | ·) ∝ N(p; μ_sup, σ_sup) · N(p; μ_dyn, σ_dyn)

**TPU-first factorization.** The reference runs one python loop over t that
interleaves SuPAIR, dynamics, and the SPN likelihood [ref: stove.py forward;
SURVEY §3.2].  Here the same math is reorganized into three phases so the
expensive work is batch-parallel and only the tiny recursion is sequential:

  1. *Encode* (parallel over B·T): the encoder CNN proposes q_sup for every
     frame at once.
  2. *Recurse* (one `lax.scan` over t): dynamics step, slot alignment,
     product-of-Gaussians, reparameterized sampling, transition/posterior
     log-densities — a few (B, O, ·) MLPs and elementwise algebra per step.
  3. *Score* (parallel over B·T): the SuPAIR SPN likelihood of every frame at
     its *sampled* box, in one giant MXU-dense batch.

Object slots: the encoder emits objects in arbitrary order; the posterior
product anchors each slot to its dynamics track.  Alignment between the
encoder's order and the dynamics' order is an exact min-cost permutation
(enumerated statically — O! = 6 at O = 3) on position means, with the
selection under `stop_gradient` (Hungarian matching is used only in
*evaluation* against ground truth, as in the reference).
"""

from __future__ import annotations

import functools
import itertools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stove_tpu.config import Config
from stove_tpu.models import dynamics as dyn_lib
from stove_tpu.models import supair as supair_lib
from stove_tpu.models.dynamics import LAT, POS, SIZE, VEL
from stove_tpu.ops import gaussians


class StoveSpecs(NamedTuple):
    supair: supair_lib.SupairSpecs


def make_specs(key: jax.Array, cfg: Config) -> StoveSpecs:
    return StoveSpecs(supair_lib.make_specs(key, cfg))


def init_params(key: jax.Array, cfg: Config, specs: StoveSpecs) -> Dict:
    k_sup, k_dyn = jax.random.split(key)
    return {
        "supair": supair_lib.init_params(k_sup, cfg, specs.supair),
        "dynamics": dyn_lib.init_params(k_dyn, cfg),
    }


# --------------------------------------------------------------------------
# slot alignment (exact min-cost permutation, statically enumerated)
# --------------------------------------------------------------------------

def _exact_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Min-cost assignment by enumerating all O! permutations.

    cost (B, O, O): cost[b, i, j] of matching ref slot i to new slot j.
    Returns sel (B, O) with sel[b, i] = chosen j.  Exact; O ≤ 4 keeps the
    enumeration ≤ 24 rows (trace-time static).
    """
    B, O, _ = cost.shape
    perms = np.asarray(list(itertools.permutations(range(O))))    # (P!, O)
    # one-hot permutation tensor (P!, O, O): total cost of each permutation
    # is a single (B, O²) @ (O², P!) contraction — the repeat/gather
    # formulation cost ~1 ms/step in the training scan (round-2 scan probe)
    onehot = np.zeros((perms.shape[0], O, O), np.float32)
    np.put_along_axis(onehot, perms[:, :, None], 1.0, axis=2)
    percost = jnp.einsum("bij,pij->bp", cost, jnp.asarray(onehot))
    return jnp.asarray(perms)[jnp.argmin(percost, axis=-1)]       # (B, O)


def _greedy_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Greedy (auction-style) assignment: repeatedly take the globally
    cheapest unmatched (ref, new) pair.

    O(O) unrolled rounds of a (B, O·O) argmin — scales to large O where O!
    enumeration explodes (720 perms at O=6).  Near-exact in practice here:
    slots move ≤ one ball-radius per frame, so the cost matrix is strongly
    diagonal-dominant after the first frames.
    """
    B, O, _ = cost.shape
    BIG = jnp.asarray(1e9, cost.dtype)
    sel = jnp.zeros((B, O), jnp.int32)
    c = cost
    for _ in range(O):                                            # static
        idx = jnp.argmin(c.reshape(B, O * O), axis=-1)            # (B,)
        i, j = idx // O, idx % O
        hit_i = jax.nn.one_hot(i, O, dtype=bool)                  # (B, O)
        hit_j = jax.nn.one_hot(j, O, dtype=bool)
        sel = jnp.where(hit_i, j[:, None], sel)
        c = jnp.where(hit_i[:, :, None] | hit_j[:, None, :], BIG, c)
    return sel


def align_slots(ref_pos: jnp.ndarray, new_pos: jnp.ndarray,
                *arrays: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Permute the O-slots of `arrays` so new_pos best matches ref_pos.

    ref_pos, new_pos: (B, O, 2).  Exact enumerated assignment for O ≤ 4,
    greedy assignment above (O! blows up; greedy is near-exact for
    frame-to-frame tracking).  The argmin is discrete (no gradient); values
    keep their gradients.
    """
    B, O, _ = ref_pos.shape
    cost = jnp.sum(
        (ref_pos[:, :, None, :] - new_pos[:, None, :, :]) ** 2, -1)  # (B,O,O)
    sel = _exact_assignment(cost) if O <= 4 else _greedy_assignment(cost)
    out = tuple(
        jnp.take_along_axis(a, sel.reshape(B, O, *([1] * (a.ndim - 2))),
                            axis=1)
        for a in arrays)
    return out if len(out) > 1 else out[0]


# --------------------------------------------------------------------------
# inference + ELBO
# --------------------------------------------------------------------------

class InferOut(NamedTuple):
    z: jnp.ndarray            # (B, T, O, 6+cl) posterior samples
    z_mean: jnp.ndarray       # (B, T, O, 6+cl) posterior means (eval/planning)
    pos_mean: jnp.ndarray     # (B, T, O, 2) posterior position means
    kl: jnp.ndarray           # (B,) Σ_{t≥2} [log p(z_t|z_{t−1}) − log q]
    init_logq: jnp.ndarray    # (B,) log q of the t∈{0,1} SuPAIR samples
    init_logp: jnp.ndarray    # (B,) init prior terms (scales, latents)
    rewards: jnp.ndarray      # (B, T) r̂ (zeros for t < 2)


def infer(params: Dict, cfg: Config, specs: StoveSpecs, frames: jnp.ndarray,
          actions: Optional[jnp.ndarray], key: jax.Array) -> InferOut:
    """Run the three-phase posterior over a (B, T, H, W) window."""
    B, T = frames.shape[:2]
    O, cl = cfg.num_obj, cfg.cl

    # ---- phase 1: encode every frame at once -----------------------------
    with jax.named_scope("stove_encode"):
        mean_flat, std_flat = supair_lib.encode(
            params["supair"], cfg, frames.reshape(B * T, *frames.shape[2:]))
    sup_mean = mean_flat.reshape(B, T, O, 4)
    sup_std = std_flat.reshape(B, T, O, 4)

    key, k0, k1, kl0 = jax.random.split(key, 4)

    # ---- t = 0, 1: SuPAIR-only init (SURVEY §2.1) ------------------------
    z0_where = gaussians.sample(k0, sup_mean[:, 0], sup_std[:, 0])
    m1, s1 = align_slots(sup_mean[:, 0, :, 2:4], sup_mean[:, 1, :, 2:4],
                         sup_mean[:, 1], sup_std[:, 1])
    z1_where = gaussians.sample(k1, m1, s1)
    v1 = z1_where[..., 2:4] - z0_where[..., 2:4]
    lat1 = jax.random.normal(kl0, (B, O, cl), frames.dtype)
    z1 = jnp.concatenate([z1_where[..., 0:2], z1_where[..., 2:4], v1, lat1],
                         axis=-1)
    v0 = v1  # velocity undefined at t=0; mirror t=1 (only used for stacking)
    z0 = jnp.concatenate([z0_where[..., 0:2], z0_where[..., 2:4], v0,
                          lat1], axis=-1)

    init_logq = (
        jnp.sum(gaussians.log_prob(z0_where, sup_mean[:, 0], sup_std[:, 0]),
                (-2, -1))
        + jnp.sum(gaussians.log_prob(z1_where, m1, s1), (-2, -1)))
    init_logp = (
        supair_lib.where_prior_logp(cfg, z0_where)
        + supair_lib.where_prior_logp(cfg, z1_where))
    # lat1 sampled from its N(0,1) prior: log p − log q cancels exactly.

    # ---- phase 2: the recursion as one lax.scan --------------------------
    if actions is None:
        actions = jnp.zeros((B, T), jnp.int32)

    # pre-draw the per-step reparameterization noise with the SAME keys the
    # in-scan gaussians.sample used (bit-identical), so the scan body is a
    # deterministic function of (params, obs, ε) — the fused Pallas scan
    # (ops/pallas_scan.py) consumes the same ε and needs no kernel PRNG
    keys = jax.random.split(key, T - 2)
    eps = jnp.moveaxis(
        jax.vmap(lambda k: jax.random.normal(
            k, (B, O, cfg.full_state_dim), frames.dtype))(keys),
        0, 1)                                                  # (B, T-2, O, D)

    zs_r, zm_r, kl, rew_r = scan_posterior(
        params["dynamics"], cfg, z1, m1[..., 2:4], s1[..., 2:4],
        sup_mean[:, 2:], sup_std[:, 2:], actions[:, 1:T - 1], eps)

    z_all = jnp.concatenate([z0[:, None], z1[:, None], zs_r], axis=1)
    # posterior means: t∈{0,1} use encoder means (velocity from mean diffs)
    v1_mean = m1[..., 2:4] - sup_mean[:, 0, :, 2:4]
    z1_mean = jnp.concatenate([m1[..., 0:2], m1[..., 2:4], v1_mean,
                               jnp.zeros_like(lat1)], axis=-1)
    z0_mean = jnp.concatenate([sup_mean[:, 0, :, 0:2],
                               sup_mean[:, 0, :, 2:4], v1_mean,
                               jnp.zeros_like(lat1)], axis=-1)
    z_mean_all = jnp.concatenate(
        [z0_mean[:, None], z1_mean[:, None], zm_r], axis=1)
    pos_mean = jnp.concatenate(
        [sup_mean[:, 0:1, :, 2:4], m1[:, None, :, 2:4], zm_r[..., POS]],
        axis=1)
    rewards = jnp.concatenate(
        [jnp.zeros((B, 2), frames.dtype), rew_r.astype(frames.dtype)],
        axis=1)
    return InferOut(z_all, z_mean_all, pos_mean, kl, init_logq, init_logp,
                    rewards)


def _scan_xla(dyn_params: Dict, cfg: Config, z1, carry_m, carry_s,
              sup_mean, sup_std, actions, eps):
    """The phase-2 posterior recursion as one lax.scan (the reference
    semantics; single source of truth — the fused Pallas scan is tested
    against this).  sup_mean/sup_std (B, T2, O, 4) for t = 2..T−1;
    actions (B, T2) = a_{t−1}; eps (B, T2, O, D) pre-drawn normals.
    Returns (z (B,T2,O,D), z_mean (B,T2,O,D), kl (B,), rewards (B,T2)).
    """
    T2 = sup_mean.shape[1]
    xs = {
        "sup_mean": jnp.moveaxis(sup_mean, 1, 0),             # (T2, B, O, 4)
        "sup_std": jnp.moveaxis(sup_std, 1, 0),
        "action": jnp.moveaxis(actions, 1, 0),
        "eps": jnp.moveaxis(eps, 1, 0),
    }

    def step(carry, x):
        z_prev, prev_sup_m, prev_sup_s = carry
        dyn = dyn_lib.apply(dyn_params, cfg, z_prev, x["action"])
        d_mean, d_std = dyn.mean, dyn.std

        sm, ss = align_slots(d_mean[..., POS], x["sup_mean"][..., 2:4],
                             x["sup_mean"], x["sup_std"])

        # product-of-Gaussians posteriors (position, velocity, size)
        q_pos_m, q_pos_s = gaussians.product(
            sm[..., 2:4], ss[..., 2:4], d_mean[..., POS], d_std[..., POS])
        if cfg.velocity_posterior:
            if cfg.velocity_obs == "filtered":
                # velocity evidence from the difference of FILTERED position
                # means (this step's posterior minus the carried previous
                # posterior).  prev_sup_m/s carry the previous step's q(p)
                # mean/std in this mode.  See the config comment for the
                # measured end-to-end verdict (mse@8-neutral).
                v_obs = q_pos_m - prev_sup_m
                v_obs_s = jnp.sqrt(q_pos_s ** 2 + prev_sup_s ** 2)
            elif cfg.velocity_obs_full_std:
                # image-side velocity evidence from encoder position means at
                # t and t−1; both frames' stds propagate into the observation
                # std (SURVEY §2.1 "velocities inferred from position
                # differences"; fixes the understated variance flagged in
                # round 1)
                v_obs = sm[..., 2:4] - prev_sup_m
                v_obs_s = jnp.sqrt(ss[..., 2:4] ** 2 + prev_sup_s ** 2)
            else:
                # round-1 construction: difference against the t−1 sample,
                # t-frame encoder std only
                v_obs = sm[..., 2:4] - z_prev[..., POS]
                v_obs_s = ss[..., 2:4]
            q_vel_m, q_vel_s = gaussians.product(
                v_obs, v_obs_s, d_mean[..., VEL], d_std[..., VEL])
        else:
            q_vel_m, q_vel_s = d_mean[..., VEL], d_std[..., VEL]
        q_size_m, q_size_s = gaussians.product(
            sm[..., 0:2], ss[..., 0:2], d_mean[..., SIZE], d_std[..., SIZE])
        q_lat_m, q_lat_s = d_mean[..., LAT], d_std[..., LAT]

        q_mean = jnp.concatenate([q_size_m, q_pos_m, q_vel_m, q_lat_m], -1)
        q_std = jnp.concatenate([q_size_s, q_pos_s, q_vel_s, q_lat_s], -1)

        z_t = q_mean + q_std * x["eps"]

        log_p = jnp.sum(gaussians.log_prob(z_t, d_mean, d_std), (-2, -1))
        log_q = jnp.sum(gaussians.log_prob(z_t, q_mean, q_std), (-2, -1))
        out = {
            "z": z_t,
            "z_mean": q_mean,
            "kl": log_p - log_q,
            "reward": dyn.reward,
        }
        if cfg.velocity_obs == "filtered":
            carry_m, carry_s = q_pos_m, q_pos_s
        else:
            carry_m, carry_s = sm[..., 2:4], ss[..., 2:4]
        return (z_t, carry_m, carry_s), out

    with jax.named_scope("stove_scan"):
        _, scanned = jax.lax.scan(
            step, (z1, carry_m, carry_s), xs,
            # lax.scan needs unroll >= 1 even when T == 2 (empty xs)
            unroll=max(1, min(cfg.scan_unroll, T2)))
    return (jnp.moveaxis(scanned["z"], 0, 1),
            jnp.moveaxis(scanned["z_mean"], 0, 1),
            jnp.sum(scanned["kl"], axis=0),
            jnp.moveaxis(scanned["reward"], 0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _scan_pallas(dyn_params: Dict, cfg: Config, z1, carry_m, carry_s,
                 sup_mean, sup_std, actions, eps):
    """Fused-forward posterior scan: Pallas kernel forward (whole window
    VMEM-resident, ops/pallas_scan.py), XLA-dense `_scan_xla` backward
    (same pre-drawn ε, mathematically identical)."""
    from stove_tpu.ops import pallas_rollout as pr
    from stove_tpu.ops import pallas_scan as ps

    prepared = pr.prepare_params(dyn_params, cfg, jnp.bfloat16)
    return ps.scan_fused(prepared, cfg, z1, carry_m, carry_s, sup_mean,
                         sup_std, actions, eps)


def _scan_pallas_fwd(dyn_params, cfg, z1, carry_m, carry_s, sup_mean,
                     sup_std, actions, eps):
    out = _scan_pallas(dyn_params, cfg, z1, carry_m, carry_s, sup_mean,
                       sup_std, actions, eps)
    return out, (dyn_params, z1, carry_m, carry_s, sup_mean, sup_std,
                 actions, eps)


def _scan_pallas_bwd(cfg, res, grads):
    dyn_params, z1, carry_m, carry_s, sup_mean, sup_std, actions, eps = res
    _, vjp = jax.vjp(
        lambda p, a, b, c, d, e, f, g: _scan_xla(p, cfg, a, b, c, d, e,
                                                 f, g),
        dyn_params, z1, carry_m, carry_s, sup_mean, sup_std, actions, eps)
    return vjp(grads)


_scan_pallas.defvjp(_scan_pallas_fwd, _scan_pallas_bwd)


def scan_posterior(dyn_params: Dict, cfg: Config, z1, carry_m, carry_s,
                   sup_mean, sup_std, actions, eps):
    """Dispatch the phase-2 recursion to the configured implementation."""
    if (cfg.scan_impl == "pallas" and sup_mean.shape[1] > 0
            and supair_lib._pallas_available()):
        return _scan_pallas(dyn_params, cfg, z1, carry_m, carry_s,
                            sup_mean, sup_std, actions, eps)
    return _scan_xla(dyn_params, cfg, z1, carry_m, carry_s, sup_mean,
                     sup_std, actions, eps)


class ElboOut(NamedTuple):
    loss: jnp.ndarray
    elbo: jnp.ndarray
    log_lik: jnp.ndarray
    kl: jnp.ndarray
    reward_loss: jnp.ndarray
    overshoot_loss: jnp.ndarray
    overshoot_reward_loss: jnp.ndarray
    open_sigma_nll: jnp.ndarray
    inferred: InferOut


def _balanced_bce(pred: jnp.ndarray, target: jnp.ndarray,
                  balanced: bool, label_smooth: float = 0.0,
                  pos_rate: float = 0.0) -> jnp.ndarray:
    """Binary cross-entropy; optionally inverse-frequency class-weighted
    (collisions are rare, so an unweighted head collapses to the base rate)
    and label-smoothed (keeps the head's probabilities graded — see
    Config.reward_label_smooth).  Class weights use the HARD labels.

    pos_rate > 0: use that corpus-level P(target=1) for the weights (the
    Trainer measures it once from the training corpus); 0 falls back to the
    per-batch mean, which is a high-variance estimate at realistic
    collision rates and adds gradient noise on the head that bottlenecks
    planning (VERDICT r2 weak #5)."""
    eps = 1e-6
    soft = target * (1.0 - label_smooth) + 0.5 * label_smooth
    bce = -(soft * jnp.log(pred + eps)
            + (1 - soft) * jnp.log(1 - pred + eps))
    if balanced:
        pr = (jnp.clip(pos_rate, 0.05, 0.95) if pos_rate > 0
              else jnp.clip(jnp.mean(target), 0.05, 0.95))
        w = jnp.where(target > 0.5, 0.5 / pr, 0.5 / (1.0 - pr))
        bce = bce * w
    return jnp.mean(bce)


def overshoot_losses(params: Dict, cfg: Config, inf: InferOut,
                     actions: Optional[jnp.ndarray],
                     rewards: Optional[jnp.ndarray],
                     key: Optional[jax.Array] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Latent overshooting: k-step open-loop predictions must match the
    posterior means k steps ahead (PlaNet-style; additive over the
    reference, gated by cfg.overshoot_k).

    From every posterior sample z_t (t ≤ T−K) the dynamics rolls forward K
    steps on its mean; predicted positions are penalized against the
    stop-gradded posterior position means at t+k.  All (batch × start-time)
    pairs are folded into one batch, so the cost is K dynamics calls.

    When the reward head is on, the SAME open-loop rollout also supervises
    reward prediction: r̂ at open-loop step k must match the env reward of
    transition (t+k−1) → (t+k).  This matches the planner's usage — MCTS
    consumes rewards along open-loop rollouts, where the head trained only
    on one-step posterior states is out of distribution (round-1 planning
    gap; VERDICT item 1).
    """
    K = cfg.overshoot_k
    B, T = inf.z.shape[:2]
    S = T - K  # number of start indices
    zero = jnp.zeros((), inf.z.dtype)
    if K <= 0:
        if cfg.open_loop_sigma:
            # the sigma-open NLL lives inside this machinery: with K=0 the
            # 'open' head would stay at init (mid-range bounded std of
            # random features) while rollout(sample=True) consumes it —
            # silently mis-calibrated sampled rollouts (round-3 advisor).
            raise ValueError(
                "open_loop_sigma=True requires overshoot_k >= 1: the "
                "sigma-open NLL is computed inside the overshoot loss, so "
                "with overshoot_k=0 the open-loop std head never trains.")
        return zero, zero, zero
    if S <= 0:
        # K >= window leaves zero valid (t, t+k) pairs: the overshoot,
        # open-loop-reward AND sigma losses would all silently become 0.0
        # (this bit a real run: K=12 at window=12 trained a no-overshoot
        # model that looked configured for deep supervision).  Fail loudly.
        raise ValueError(
            f"overshoot_k={K} requires window > K (window={T}): no valid "
            "open-loop start indices — the overshoot losses would silently "
            "vanish. Lower overshoot_k or raise window.")
    if actions is None:
        actions = jnp.zeros((B, T), jnp.int32)

    # fold (B, S) into one batch of rollout starts
    z = inf.z[:, :S].reshape(B * S, *inf.z.shape[2:])
    targets = jax.lax.stop_gradient(inf.pos_mean)              # (B, T, O, 2)
    # posterior-mean targets for the open-loop process-noise std: pos+vel
    # (sizes carried; latents have no image-side evidence, so their target
    # equals the dynamics' own prediction and the NLL drives their open std
    # to the floor — correctly encoding "no grounded latent process noise")
    mean_targets = jax.lax.stop_gradient(inf.z_mean)           # (B, T, O, D)

    supervise_reward = (cfg.action_conditioned and cfg.reward_head
                        and rewards is not None
                        and cfg.reward_overshoot_weight > 0)
    total_pos, total_rew, sigma_nll = zero, zero, zero

    if cfg.open_loop_sigma and T >= 3:
        # Multi-horizon open-loop NLL for the process-noise std: roll the
        # dynamics on MEANS from the posterior mean at t and score the
        # posterior MEAN at t+k under N(pred_k, sqrt(Σ_{j≤k} σ_open,j²))
        # for every k in cfg.open_loop_sigma_horizons.  Mean-to-mean, so
        # σ_open captures model/process noise WITHOUT posterior-sample
        # jitter; the accumulated variance is exactly what a sampled
        # rollout injects over k steps, so fitting it at k ∈ {1,4,8}
        # calibrates σ at the horizons sampled rollouts are judged at —
        # the 1-step-only fit (horizons=(1,), the round-3 behavior) bakes
        # 1-step bias + target noise into σ and over-injects 1.9–3.2×
        # (RESULTS.md gravity table; VERDICT r4 task 4).  Start at t=1
        # (t=0 velocity is mirrored from t=1).  The chain and predicted
        # means are stop-gradded: this term calibrates σ_open only.
        horizons = tuple(k for k in sorted(set(cfg.open_loop_sigma_horizons))
                         if 1 <= k <= T - 2) or (1,)
        kmax = horizons[-1]
        Sm = T - 1 - kmax
        zm = mean_targets[:, 1:1 + Sm].reshape(B * Sm,
                                               *mean_targets.shape[2:])
        z_roll = zm
        var_acc = jnp.zeros_like(zm[..., 2:])
        terms = []
        for k in range(1, kmax + 1):                           # unrolled
            # state at t+k−1; the action at index t+k−1 drives t+k−1 → t+k
            act_m = jax.lax.dynamic_slice_in_dim(
                actions, k, Sm, axis=1).reshape(B * Sm)
            dyn_m = dyn_lib.apply(params["dynamics"], cfg, z_roll, act_m)
            var_acc = var_acc + dyn_m.std_open[..., 2:] ** 2
            if k in horizons:
                tgt = mean_targets[:, 1 + k:1 + k + Sm].reshape(
                    B * Sm, *mean_targets.shape[2:])
                nll = -gaussians.log_prob(
                    tgt[..., 2:],
                    jax.lax.stop_gradient(dyn_m.mean[..., 2:]),
                    jnp.sqrt(var_acc))
                terms.append(jnp.mean(jnp.sum(nll, axis=(-2, -1))))
            z_roll = jax.lax.stop_gradient(dyn_m.mean)
        sigma_nll = sum(terms) / len(terms)

    for k in range(1, K + 1):                                  # unrolled
        # action taken at step t+k−1 drives transition into t+k
        act_k = jax.lax.dynamic_slice_in_dim(actions, k - 1, S, axis=1)
        dyn = dyn_lib.apply(params["dynamics"], cfg, z,
                            act_k.reshape(B * S))
        if cfg.overshoot_sample and key is not None:
            # noise-robust (scheduled-sampling-style) overshooting: roll the
            # open loop on SAMPLED transitions so the dynamics learns to
            # stay on track under its own transition noise — the regime
            # sampled long-horizon rollouts operate in (gravity energy
            # faithfulness, VERDICT item 2).  stop_gradient on σ: the
            # position loss must shape the mean dynamics, not collapse the
            # learned noise scale (σ is trained by the ELBO/NLL terms).
            key, k_s = jax.random.split(key)
            # roll under the FILTER std (round-2's validated noise-
            # robustness recipe) — not std_open, which calibrates toward
            # the (small) true process noise and would neuter this
            # perturbation as it trains
            z = gaussians.sample(k_s, dyn.mean,
                                 jax.lax.stop_gradient(dyn.std))
        else:
            z = dyn.mean
        pred_pos = z[..., POS].reshape(B, S, cfg.num_obj, 2)
        tgt = jax.lax.dynamic_slice_in_dim(targets, k, S, axis=1)
        total_pos = total_pos + jnp.mean(jnp.sum((pred_pos - tgt) ** 2, -1))
        if supervise_reward:
            # env reward of transition (t+k−1) → (t+k) is recorded at index
            # t+k−1 (pre-step layout, see envs/data.py)
            r_tgt = jax.lax.dynamic_slice_in_dim(rewards, k - 1, S, axis=1)
            total_rew = total_rew + _balanced_bce(
                dyn.reward.reshape(B, S), r_tgt, cfg.reward_balanced_loss,
                cfg.reward_label_smooth, cfg.reward_pos_rate)
    return total_pos / K, total_rew / K, sigma_nll


def elbo(params: Dict, cfg: Config, specs: StoveSpecs, frames: jnp.ndarray,
         actions: Optional[jnp.ndarray], rewards: Optional[jnp.ndarray],
         key: jax.Array) -> ElboOut:
    """Negative training loss for a window: −ELBO/T (+ reward loss)."""
    B, T = frames.shape[:2]
    key, k_os = jax.random.split(key)
    inf = infer(params, cfg, specs, frames, actions, key)

    # ---- phase 3: likelihood of every frame at its sampled box -----------
    boxes = jnp.concatenate(
        [inf.z[..., SIZE], inf.z[..., POS]], axis=-1)          # (B, T, O, 4)
    with jax.named_scope("stove_likelihood"):
        ll = supair_lib.likelihood(
            params["supair"], cfg, specs.supair,
            frames.reshape(B * T, *frames.shape[2:]),
            boxes.reshape(B * T, cfg.num_obj, 4))
    log_lik = jnp.sum(ll.reshape(B, T), axis=1)                # (B,)

    elbo_b = log_lik + inf.kl + inf.init_logp - inf.init_logq
    elbo_mean = jnp.mean(elbo_b) / T

    if cfg.action_conditioned and rewards is not None:
        # r̂ at scan step t predicts the env reward of transition t−1 → t
        reward_loss = _balanced_bce(inf.rewards[:, 2:], rewards[:, 1:T - 1],
                                    cfg.reward_balanced_loss,
                                    cfg.reward_label_smooth,
                                    cfg.reward_pos_rate)
    else:
        reward_loss = jnp.zeros((), frames.dtype)

    if cfg.overshoot_k > 0:
        ov, ov_rew, ov_nll = overshoot_losses(params, cfg, inf, actions,
                                              rewards, k_os)
    else:
        ov = jnp.zeros((), frames.dtype)
        ov_rew = jnp.zeros((), frames.dtype)
        ov_nll = jnp.zeros((), frames.dtype)

    loss = (-elbo_mean + reward_loss + cfg.overshoot_weight * ov
            + cfg.reward_overshoot_weight * ov_rew
            + cfg.open_loop_sigma_weight * ov_nll)
    return ElboOut(loss, elbo_mean, jnp.mean(log_lik) / T,
                   jnp.mean(inf.kl) / T, reward_loss, ov, ov_rew, ov_nll,
                   inf)


# --------------------------------------------------------------------------
# rollout (prediction / planning)
# --------------------------------------------------------------------------

def rollout(params: Dict, cfg: Config, z0: jnp.ndarray,
            actions: Optional[jnp.ndarray], horizon: int, key: jax.Array,
            sample: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterate the transition prior from z0 for `horizon` steps.

    z0: (B, O, 6+cl); actions: (B, horizon) int32 or None.
    Returns (states (B, horizon, O, 6+cl), rewards (B, horizon)).
    One jitted `lax.scan`; this is the throughput benchmark path and the
    MCTS simulator (SURVEY §3.3, §3.4).
    """
    B = z0.shape[0]
    if actions is None:
        actions = jnp.zeros((B, horizon), jnp.int32)
    xs = {
        "action": jnp.moveaxis(actions, 1, 0),
        "key": jax.random.split(key, horizon),
    }

    def step(z, x):
        dyn = dyn_lib.apply(params["dynamics"], cfg, z, x["action"])
        # sampled rollouts inject the OPEN-LOOP process-noise std when the
        # second head is trained (std_open aliases std otherwise) — the
        # filter std covers posterior jitter and pumps ~2x energy into
        # long sampled rollouts (VERDICT r2 missing #4)
        z_next = (gaussians.sample(x["key"], dyn.mean,
                                   dyn.std_open * cfg.rollout_sigma_temp)
                  if sample else dyn.mean)
        return z_next, {"z": z_next, "reward": dyn.reward}

    _, out = jax.lax.scan(step, z0, xs)
    return jnp.moveaxis(out["z"], 0, 1), jnp.moveaxis(out["reward"], 0, 1)
