"""Evaluation: conditioned rollout position error + reward accuracy.

Reference protocol [ref: train.py eval/test; SURVEY.md §3.3]: condition the
posterior on `window` frames, roll the latent dynamics forward, match
predicted objects to ground truth **once at the handoff** (the reference uses
Hungarian matching; we use the exact enumerated assignment, identical result),
report position MSE per rollout step — the paper's headline figure (Fig. 3).

Positions are compared in the [0, 1]-normalized image frame (paper units).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stove_tpu.envs.data import Episode, normalize_frames
from stove_tpu.models.bundle import StoveModel
from stove_tpu.models.dynamics import POS
from stove_tpu.ops import matching


def _model_pos_to_01(pos: jnp.ndarray) -> jnp.ndarray:
    """Model/ST [−1, 1] coords → [0, 1] image-normalized coords."""
    return (pos + 1.0) * 0.5


def rollout_metrics(model: StoveModel, params, ep: Episode, key: jax.Array,
                    t_cond: Optional[int] = None,
                    t_pred: Optional[int] = None,
                    batch: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """The paper's eval: per-step position MSE over a prediction rollout."""
    cfg = model.cfg
    t_cond = t_cond or cfg.window
    t_pred = t_pred or cfg.eval_rollout_steps
    if t_cond < 2:
        # the handoff-velocity diagnostic indexes states[:, t_cond-2]; a
        # smaller t_cond would silently wrap to the last frame
        raise ValueError(f"rollout_metrics needs t_cond >= 2, got {t_cond}")
    B = min(batch or cfg.eval_batch, ep.frames.shape[0])
    frames = normalize_frames(ep.frames[:B, :t_cond])
    actions = ep.actions[:B]

    k_inf, k_roll = jax.random.split(key)
    inf = model.infer(params, frames, actions[:, :t_cond], k_inf)
    z_last = inf.z_mean[:, -1]  # mean state: less handoff noise than a sample
    roll_actions = actions[:, t_cond - 1: t_cond - 1 + t_pred]
    states, rewards = model.rollout(params, z_last, roll_actions, k_roll,
                                    horizon=t_pred, sample=False)
    pred = _model_pos_to_01(states[..., POS])                  # (B, T, O, 2)
    last_inferred = _model_pos_to_01(inf.pos_mean[:, -1])      # (B, O, 2)

    # ground truth in [0,1] units for t = t_cond .. t_cond + t_pred − 1
    true = ep.states[:B, t_cond: t_cond + t_pred, :, :2] / cfg.arena_size
    true_handoff = ep.states[:B, t_cond - 1, :, :2] / cfg.arena_size

    # match once at the handoff frame, then keep slots fixed
    perm = matching.match_positions(last_inferred, true_handoff)  # (B, O)
    pred_matched = jax.vmap(lambda p, s: p[:, s])(pred, perm)

    se = jnp.sum((pred_matched - true) ** 2, axis=-1)          # (B, T, O)
    mse_per_step = jnp.mean(se, axis=(0, 2))                   # (T,)
    # handoff velocity error: the low-variance diagnostic for the velocity
    # posterior (rollout mse@8 is chaos-dominated and spans ±2× with the
    # seed at small budgets; this rms averages cleanly over B·O·2)
    true_vel = (ep.states[:B, t_cond - 1, :, :2]
                - ep.states[:B, t_cond - 2, :, :2]) / cfg.arena_size
    pred_vel = matching.apply_permutation(
        inf.z_mean[:, -1, :, 4:6] * 0.5, perm)  # model [-1,1] → [0,1] units
    out = {
        "mse_per_step": mse_per_step,
        "mse_mean": jnp.mean(mse_per_step),
        "mse_final": mse_per_step[-1],
        "detect_mse": jnp.mean(jnp.sum(
            (matching.apply_permutation(last_inferred, perm)
             - true_handoff) ** 2, -1)),
        "handoff_vel_rms": jnp.sqrt(jnp.mean((pred_vel - true_vel) ** 2)),
    }
    if cfg.action_conditioned:
        true_r = ep.rewards[:B, t_cond - 1: t_cond - 1 + t_pred]
        out["reward_mae"] = jnp.mean(jnp.abs(rewards - true_r))
        # discrimination quality of the open-loop reward predictions — the
        # quantity MCTS actually consumes (round-1 planning bottleneck).
        # AUC > 0.5: head separates collision from free steps.
        out["reward_auc"] = binary_auc(rewards.reshape(-1),
                                       true_r.reshape(-1))
        # per-depth AUC localizes where open-loop reward predictions rot
        # with rollout depth — the planner's branch values integrate these
        # (error-attribution for the planning gap, VERDICT r2 #1)
        out["reward_auc_per_step"] = jnp.stack(
            [binary_auc(rewards[:, k], true_r[:, k])
             for k in range(t_pred)])
    return out


def binary_auc(score: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """ROC-AUC via the Mann-Whitney rank statistic (label 1 = positive).

    Returns NaN when one class is absent.  Ties get midranks.
    """
    n = score.shape[0]
    order = jnp.argsort(score)
    sorted_scores = score[order]
    # midranks for ties: average 1-based rank within each equal-score run
    run_start = jnp.searchsorted(sorted_scores, sorted_scores, side="left")
    run_end = jnp.searchsorted(sorted_scores, sorted_scores, side="right")
    mid = 0.5 * (run_start + 1 + run_end).astype(jnp.float32)
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(mid)
    pos = label > 0.5
    n_pos = jnp.sum(pos)
    n_neg = n - n_pos
    sum_pos_ranks = jnp.sum(jnp.where(pos, ranks, 0.0))
    auc = (sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def baseline_metrics(cfg, ep: Episode, t_cond: Optional[int] = None,
                     t_pred: Optional[int] = None,
                     batch: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Trivial rollout baselines from ground-truth handoff state.

    The paper's accuracy claim is *relative* (STOVE ≈ an order of magnitude
    below linear/VRNN/SQAIR baselines at 8 steps, SURVEY §6 row 2); these
    ground the reported MSEs:

    * `linear`: constant-velocity extrapolation from the true positions at
      the last two conditioning frames (the paper's "linear" baseline).
    * `frozen`: repeat the last true position (no-dynamics floor).

    Both use ground truth at handoff, so they bound what a perfect detector
    with a trivial predictor could do.
    """
    t_cond = t_cond or cfg.window
    t_pred = t_pred or cfg.eval_rollout_steps
    B = min(batch or cfg.eval_batch, ep.frames.shape[0])
    true = ep.states[:B, t_cond: t_cond + t_pred, :, :2] / cfg.arena_size
    p_last = ep.states[:B, t_cond - 1, :, :2] / cfg.arena_size  # (B, O, 2)
    v_last = (ep.states[:B, t_cond - 1, :, :2]
              - ep.states[:B, t_cond - 2, :, :2]) / cfg.arena_size
    steps = jnp.arange(1, t_pred + 1, dtype=jnp.float32)
    linear = p_last[:, None] + steps[None, :, None, None] * v_last[:, None]
    frozen = jnp.broadcast_to(p_last[:, None], true.shape)
    out = {}
    for name, pred in (("linear", linear), ("frozen", frozen)):
        se = jnp.sum((pred - true) ** 2, axis=-1)
        out[f"{name}_mse_per_step"] = jnp.mean(se, axis=(0, 2))
        out[f"{name}_mse_final"] = out[f"{name}_mse_per_step"][-1]
    return out


def longhorizon_metrics(model: StoveModel, params, ep: Episode,
                        key: jax.Array, t_cond: Optional[int] = None,
                        t_pred: int = 50, batch: int = 32,
                        sample: bool = False) -> Dict[str, jnp.ndarray]:
    """Long-horizon rollout stability (BASELINE.md row 3: gravity rollouts
    must stay physically plausible far beyond 8 steps).

    Reports the fraction of predicted positions that stay inside the frame,
    and the ratio of predicted to true mean per-step displacement (≈1 means
    speeds neither explode nor collapse over the horizon).  `sample=True`
    evaluates the stochastic rollout protocol (transition noise injected
    per step) instead of the mean rollout.
    """
    cfg = model.cfg
    t_cond = t_cond or cfg.window
    B = min(batch, ep.frames.shape[0])
    t_pred = min(t_pred, ep.frames.shape[1] - t_cond)
    frames = normalize_frames(ep.frames[:B, :t_cond])
    k_inf, k_roll = jax.random.split(key)
    inf = model.infer(params, frames, ep.actions[:B, :t_cond], k_inf)
    states, _ = model.rollout(
        params, inf.z_mean[:, -1],
        ep.actions[:B, t_cond - 1:t_cond - 1 + t_pred], k_roll,
        horizon=t_pred, sample=sample)
    pred = _model_pos_to_01(states[..., POS])                  # (B, T, O, 2)
    margin = cfg.ball_radius / cfg.arena_size
    in_frame = jnp.mean(
        ((pred >= -margin) & (pred <= 1.0 + margin)).astype(jnp.float32))
    pred_disp = jnp.mean(jnp.linalg.norm(
        jnp.diff(pred, axis=1), axis=-1))
    true = ep.states[:B, t_cond:t_cond + t_pred, :, :2] / cfg.arena_size
    true_disp = jnp.mean(jnp.linalg.norm(jnp.diff(true, axis=1), axis=-1))
    return {
        "horizon": jnp.asarray(t_pred),
        "frac_in_frame": in_frame,
        "speed_ratio": pred_disp / (true_disp + 1e-8),
    }
