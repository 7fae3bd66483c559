"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4: the TPU
equivalent of testing multi-node without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from stove_tpu.config import Config
from stove_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return mesh_lib.make_mesh()


class TestMesh:
    def test_autofill_shape(self, mesh8):
        assert mesh8.devices.shape == (8,)
        assert mesh8.axis_names == ("data",)

    def test_config_shape(self):
        cfg = Config().with_overrides(mesh_shape=(4,), mesh_axes=("data",))
        m = mesh_lib.make_mesh(cfg)
        assert m.devices.shape == (4,)

    def test_shard_and_replicate(self, mesh8):
        x = jnp.arange(16.0).reshape(16, 1)
        xs = mesh_lib.shard_batch(mesh8, x)
        assert xs.sharding.spec == P("data")
        p = mesh_lib.replicate(mesh8, {"w": jnp.ones((3, 3))})
        assert p["w"].sharding.spec == P()

    def test_pad_to_multiple(self):
        x = jnp.ones((5, 2))
        padded, n = mesh_lib.pad_to_multiple(x, 8)
        assert padded.shape == (8, 2) and n == 5


class TestShardedTraining:
    @pytest.mark.slow
    def test_sharded_grad_matches_single_device(self, mesh8):
        """Data-parallel grads via sharded jit == single-device grads."""
        from stove_tpu.models import stove as stove_lib

        cfg = Config().debug_shrunk()
        specs = stove_lib.make_specs(jax.random.key(0), cfg)
        params = stove_lib.init_params(jax.random.key(1), cfg, specs)
        frames = jax.random.uniform(jax.random.key(2),
                                    (8, cfg.window, 32, 32))

        def loss(p, f):
            return stove_lib.elbo(p, cfg, specs, f, None, None,
                                  jax.random.key(3)).loss

        g_single = jax.jit(jax.grad(loss))(params, frames)

        fs = mesh_lib.shard_batch(mesh8, frames)
        ps = mesh_lib.replicate(mesh8, params)
        g_sharded = jax.jit(jax.grad(loss))(ps, fs)

        for a, b in zip(jax.tree_util.tree_leaves(g_single),
                        jax.tree_util.tree_leaves(g_sharded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert jnp.isfinite(out)


@pytest.mark.slow
class TestDataParallelTrainer:
    def test_trainer_uses_mesh(self, tmp_path):
        """Trainer on the 8-device mesh: one fused epoch runs, metrics
        finite, params stay replicated."""
        from stove_tpu.train.trainer import Trainer

        cfg = Config().debug_shrunk().with_overrides(
            data_dir=str(tmp_path / "d"), run_dir=str(tmp_path / "r"),
            batch_size=8, num_epochs=1, steps_per_epoch=2, eval_every=5,
            ckpt_every=5, supair_only_epochs=0)
        t = Trainer(cfg)
        assert t._dp and t.mesh.devices.size == 8
        m = t.train_epoch(0)
        assert np.isfinite(m["loss"])
        leaf = jax.tree_util.tree_leaves(t.state.params)[0]
        assert leaf.sharding.spec == P()  # still replicated after update

    def test_two_epoch_metrics_match_single_device(self, tmp_path):
        """2 fused epochs on the 8-device mesh reproduce the 1-device mesh
        run's metrics — sharding changes layout, not math (SURVEY §4:
        multi-node equivalence without a cluster)."""
        from stove_tpu.train.trainer import Trainer

        common = dict(
            data_dir=str(tmp_path / "d"), run_dir=str(tmp_path / "r"),
            batch_size=8, num_epochs=2, steps_per_epoch=2, eval_every=99,
            ckpt_every=99, supair_only_epochs=0, nolog=True)
        cfg8 = Config().debug_shrunk().with_overrides(**common)
        cfg1 = cfg8.with_overrides(mesh_shape=(1,))

        t8 = Trainer(cfg8)
        assert t8.mesh.devices.size == 8
        m8 = [t8.train_epoch(e) for e in range(2)]
        t1 = Trainer(cfg1)
        assert t1.mesh.devices.size == 1
        m1 = [t1.train_epoch(e) for e in range(2)]
        for a, b in zip(m8, m1):
            for k in a:
                np.testing.assert_allclose(
                    a[k], b[k], rtol=5e-3, atol=1e-5,
                    err_msg=f"metric {k} diverges between 8- and 1-device "
                            f"meshes")

    def test_second_mesh_axis_unused(self, tmp_path):
        """SURVEY §5.8: a second mesh axis must be addable without touching
        call sites.  A (4, 2) ('data', 'model') mesh with 'model' unused
        trains with metrics matching the 1-D 8-device mesh."""
        from stove_tpu.train.trainer import Trainer

        common = dict(
            data_dir=str(tmp_path / "d"), run_dir=str(tmp_path / "r"),
            batch_size=8, num_epochs=2, steps_per_epoch=2, eval_every=99,
            ckpt_every=99, supair_only_epochs=0, nolog=True)
        cfg2d = Config().debug_shrunk().with_overrides(
            mesh_shape=(4, 2), mesh_axes=("data", "model"), **common)
        cfg1d = cfg2d.with_overrides(mesh_shape=(8,), mesh_axes=("data",))

        t2d = Trainer(cfg2d)
        assert t2d.mesh.devices.shape == (4, 2)
        assert t2d.mesh.axis_names == ("data", "model")
        m2d = [t2d.train_epoch(e) for e in range(2)]
        t1d = Trainer(cfg1d)
        m1d = [t1d.train_epoch(e) for e in range(2)]
        for a, b in zip(m2d, m1d):
            for k in a:
                np.testing.assert_allclose(
                    a[k], b[k], rtol=5e-3, atol=1e-5,
                    err_msg=f"metric {k} diverges between (4,2) and (8,) "
                            f"meshes")

    def test_restore_preserves_replication(self, tmp_path):
        """Resume under DP must re-replicate the restored state."""
        from stove_tpu.train.trainer import Trainer

        cfg = Config().debug_shrunk().with_overrides(
            data_dir=str(tmp_path / "d"), run_dir=str(tmp_path / "r"),
            batch_size=8, num_epochs=1, steps_per_epoch=1, eval_every=9,
            ckpt_every=1, supair_only_epochs=0)
        t = Trainer(cfg)
        t.train()
        t2 = Trainer(cfg.with_overrides(restore=t.run_dir, num_epochs=2))
        leaf = jax.tree_util.tree_leaves(t2.state.params)[0]
        assert leaf.sharding.spec == P()
        assert len(leaf.sharding.device_set) == t2.mesh.devices.size
