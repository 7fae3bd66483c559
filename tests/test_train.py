"""Trainer / checkpoint / matching / evaluation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stove_tpu.config import Config
from stove_tpu.ops import matching
from stove_tpu.train import checkpoint as ckpt_lib


class TestMatching:
    def test_bruteforce_matches_scipy(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            cost = rng.rand(4, 4)
            ours = np.asarray(matching.assignment_bruteforce(jnp.asarray(cost)))
            scipy_cols = matching.assignment(cost)
            # same total cost (assignments may tie)
            c1 = cost[np.arange(4), ours].sum()
            c2 = cost[np.arange(4), scipy_cols].sum()
            np.testing.assert_allclose(c1, c2, atol=1e-9)

    def test_match_positions_recovers_permutation(self):
        true = jnp.array([[[0.1, 0.1], [0.5, 0.5], [0.9, 0.1]]])
        perm = jnp.array([2, 0, 1])
        pred = true[:, perm] + 0.01
        got = matching.match_positions(pred, true)
        # pred[got[i]] should be near true[i]
        re = matching.apply_permutation(pred, got)
        np.testing.assert_allclose(re, true, atol=0.02)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
                "b": [jnp.zeros((4,)), {"c": jnp.ones((2, 2))}]}
        ckpt_lib.save(str(tmp_path), 5, tree)
        step, back = ckpt_lib.restore(str(tmp_path), tree)
        assert step == 5
        np.testing.assert_array_equal(back["a"], tree["a"])
        np.testing.assert_array_equal(back["b"][1]["c"], tree["b"][1]["c"])

    def test_keep_prunes(self, tmp_path):
        tree = {"x": jnp.zeros((2,))}
        for s in range(6):
            ckpt_lib.save(str(tmp_path), s, tree, keep=2)
        import glob
        assert len(glob.glob(str(tmp_path / "ckpt_*.npz"))) == 2
        assert ckpt_lib.latest_step(str(tmp_path)) == 5

    def test_shape_mismatch_raises(self, tmp_path):
        ckpt_lib.save(str(tmp_path), 0, {"x": jnp.zeros((2,))})
        with pytest.raises(ValueError):
            ckpt_lib.restore(str(tmp_path), {"x": jnp.zeros((3,))})

    def test_config_roundtrip(self, tmp_path):
        cfg = Config().with_overrides(num_obj=5, task="gravity")
        ckpt_lib.save_config(str(tmp_path), cfg)
        back = ckpt_lib.load_config(str(tmp_path))
        assert back.num_obj == 5 and back.task == "gravity"
        assert back == cfg


@pytest.mark.slow
class TestTrainerIntegration:
    def test_two_epoch_smoke(self, tmp_path):
        from stove_tpu.train.trainer import Trainer

        cfg = Config().debug_shrunk().with_overrides(
            data_dir=str(tmp_path / "data"), run_dir=str(tmp_path / "runs"),
            num_epochs=2, steps_per_epoch=2, eval_every=2, ckpt_every=2,
            supair_only_epochs=1)
        t = Trainer(cfg)
        res = t.train()
        assert np.isfinite(res["loss"])
        assert "mse_mean" in res
        # metrics.jsonl written
        assert os.path.exists(os.path.join(t.run_dir, "metrics.jsonl"))
        # resume
        cfg2 = cfg.with_overrides(restore=t.run_dir, num_epochs=3)
        t2 = Trainer(cfg2)
        assert t2.start_epoch == 2
        r2 = t2.train()
        assert np.isfinite(r2["loss"])


class TestDeterminism:
    def test_same_seed_same_loss(self, tmp_path):
        """Full training determinism: same seed → identical metrics."""
        from stove_tpu.train.trainer import Trainer

        cfg = Config().debug_shrunk().with_overrides(
            data_dir=str(tmp_path / "d"), run_dir=str(tmp_path / "r"),
            num_epochs=1, steps_per_epoch=2, eval_every=5, ckpt_every=5,
            supair_only_epochs=0, nolog=True)
        m1 = Trainer(cfg).train_epoch(0)
        m2 = Trainer(cfg).train_epoch(0)
        assert m1["loss"] == m2["loss"]
