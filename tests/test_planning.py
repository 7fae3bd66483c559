"""MCTS planning tests: oracle planner beats random on the avoidance task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stove_tpu.config import Config
from stove_tpu.planning import runner
from stove_tpu.planning.mcts import MCTS
from stove_tpu.planning.simulators import TrueSimulator


def _cfg(**kw):
    base = dict(task="avoidance", action_conditioned=True, num_obj=3,
                mcts_simulations=27, mcts_horizon=4, mcts_episode_len=12)
    base.update(kw)
    return Config().debug_shrunk().with_overrides(**base)


class TestMCTS:
    def test_visit_counts_sum(self):
        cfg = _cfg()
        sim = TrueSimulator(cfg)
        planner = MCTS(sim, cfg)
        from stove_tpu.envs import physics
        state = physics.init_state(cfg, jax.random.key(0))
        action, counts = planner.run(state, jax.random.key(1))
        assert 0 <= action < cfg.num_actions
        assert counts.sum() >= cfg.mcts_simulations

    def test_oracle_beats_random(self):
        """MCTS on the true env must clearly beat the random policy
        (BASELINE.md planning row)."""
        cfg = _cfg(mcts_simulations=27, mcts_horizon=5, mcts_episode_len=10)
        key = jax.random.key(2)
        oracle_scores, random_scores = [], []
        for i in range(2):
            key, k1, k2 = jax.random.split(key, 3)
            oracle_scores.append(runner.run_episode_oracle(cfg, k1))
            random_scores.append(runner.run_episode_random(cfg, k2))
        assert np.mean(oracle_scores) >= np.mean(random_scores)

    def test_model_planner_runs_from_pixels(self):
        """Learned-model planner executes end-to-end (untrained params)."""
        from stove_tpu.models.bundle import StoveModel

        cfg = _cfg(mcts_simulations=9, mcts_horizon=2, mcts_episode_len=2)
        model = StoveModel(cfg)
        params = model.init_params()
        score = runner.run_episode_model(cfg, model, params,
                                         jax.random.key(3))
        assert 0.0 <= score <= 2.0
