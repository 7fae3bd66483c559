"""StoveModel: the public model handle (mirrors the reference's `Stove`).

Bundles (cfg, specs) and exposes **stable jitted callables** built once, so
every caller (trainer, evaluator, planner, benchmarks) shares compilation
caches.  The reference exposes `Stove.forward` / `Stove.rollout`
[ref: model/video_prediction/stove.py]; the equivalents here are `elbo`,
`infer`, and `rollout` — pure functions of (params, data, key).

Horizon/batch changes re-trace (static shapes are an XLA requirement); the
MCTS planner therefore pads its frontier to fixed bucket sizes (see
planning/mcts.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax

from stove_tpu.config import Config
from stove_tpu.models import stove as stove_lib
from stove_tpu.models import supair as supair_lib


class StoveModel:
    def __init__(self, cfg: Config, key: Optional[jax.Array] = None):
        self.cfg = cfg
        if key is None:
            key = jax.random.key(cfg.seed)
        self.specs = stove_lib.make_specs(key, cfg)

        cfg_ = cfg
        specs_ = self.specs

        @jax.jit
        def _elbo(params, frames, actions, rewards, key):
            return stove_lib.elbo(params, cfg_, specs_, frames, actions,
                                  rewards, key)

        @jax.jit
        def _infer(params, frames, actions, key):
            return stove_lib.infer(params, cfg_, specs_, frames, actions, key)

        @partial(jax.jit, static_argnames=("horizon", "sample"))
        def _rollout(params, z0, actions, key, horizon, sample=False):
            return stove_lib.rollout(params, cfg_, z0, actions, horizon, key,
                                     sample)

        @jax.jit
        def _supair_elbo(params, frames, key):
            return supair_lib.elbo(params["supair"], cfg_, specs_.supair,
                                   frames, key)

        # per-episode inference for lockstep planning: vmap over an episode
        # axis with one key per episode (B stays the per-episode batch, so
        # results are identical to separate infer calls)
        self.infer_each = jax.jit(jax.vmap(
            lambda params, frames, actions, key: stove_lib.infer(
                params, cfg_, specs_, frames, actions, key),
            in_axes=(None, 0, 0, 0)))

        self.elbo = _elbo
        self.infer = _infer
        self.rollout = _rollout
        self.supair_elbo = _supair_elbo
        # un-jitted rollout for callers composing their own jitted graphs
        self.rollout_raw = lambda params, z0, actions, key, horizon, sample=False: \
            stove_lib.rollout(params, cfg_, z0, actions, horizon, key, sample)

    def init_params(self, key: Optional[jax.Array] = None) -> Dict:
        if key is None:
            key = jax.random.key(self.cfg.seed + 1)
        return stove_lib.init_params(key, self.cfg, self.specs)
