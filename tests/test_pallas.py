"""Fused Pallas SPN kernel: equivalence with the dense XLA path.

Runs in interpret mode on the CPU mesh (the Mosaic compiler path is
exercised on real TPU hardware; the remote axon tunnel in this container
cannot execute pallas kernels — see supair._pallas_available).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stove_tpu.models import spn
from stove_tpu.ops import pallas_spn


@pytest.fixture(scope="module")
def setup():
    spec = spn.make_spec(jax.random.key(7), 100, 2, 5, 4, 3,
                         min_std=0.1, max_std=0.9)
    params = spn.init_params(jax.random.key(3), spec)
    x = jax.random.uniform(jax.random.key(5), (20, 100))
    w = (jax.random.uniform(jax.random.key(6), (20, 100)) > 0.3
         ).astype(jnp.float32)
    return spec, params, x, w


class TestFusedSpn:
    def test_forward_matches_dense(self, setup):
        spec, params, x, w = setup
        ref = spn.spn_log_prob(spec, params, x, w)
        fused = pallas_spn.spn_log_prob_fused(spec, params, x, w,
                                              tile=8, interpret=True)
        np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)

    def test_forward_no_weight(self, setup):
        spec, params, x, _ = setup
        ref = spn.spn_log_prob(spec, params, x)
        fused = pallas_spn.spn_log_prob_fused(spec, params, x, None,
                                              tile=8, interpret=True)
        np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)

    def test_ragged_batch_padding(self, setup):
        """B not a multiple of the tile must still be exact."""
        spec, params, x, w = setup
        ref = spn.spn_log_prob(spec, params, x[:13], w[:13])
        fused = pallas_spn.spn_log_prob_fused(spec, params, x[:13], w[:13],
                                              tile=8, interpret=True)
        np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)

    def test_gradient_matches_dense(self, setup):
        spec, params, x, w = setup

        def dense(p):
            return jnp.sum(spn.spn_log_prob(spec, p, x, w))

        def fused(p):
            return jnp.sum(pallas_spn.spn_log_prob_fused(
                spec, p, x, w, 8, True))

        g1 = jax.grad(dense)(params)
        g2 = jax.grad(fused)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_depth_one_and_three(self):
        """Structure generalizes across depths (layer unrolling)."""
        for depth, V in ((1, 16), (3, 64)):
            spec = spn.make_spec(jax.random.key(depth), V, depth, 3, 2, 2,
                                 min_std=0.1, max_std=0.9)
            params = spn.init_params(jax.random.key(depth + 10), spec)
            x = jax.random.uniform(jax.random.key(depth + 20), (9, V))
            ref = spn.spn_log_prob(spec, params, x)
            fused = pallas_spn.spn_log_prob_fused(spec, params, x, None,
                                                  tile=4, interpret=True)
            np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)


class TestFusedLikelihood:
    """Whole-likelihood kernel (glimpse + overlap + SPNs fused per batch
    tile) vs the dense supair.likelihood path — interpret mode (VERDICT
    r4 task 3)."""

    @pytest.fixture(scope="class")
    def like_setup(self):
        from stove_tpu.config import Config
        from stove_tpu.models import supair as supair_lib

        cfg = Config().debug_shrunk().with_overrides(num_obj=3)
        specs = supair_lib.make_specs(jax.random.key(0), cfg)
        params = supair_lib.init_params(jax.random.key(1), cfg, specs)
        B = 7                      # deliberately not a tile multiple
        frames = jax.random.uniform(jax.random.key(2),
                                    (B, cfg.img_size, cfg.img_size))
        # overlapping, in-frame boxes
        sxy = 0.2 + 0.2 * jax.random.uniform(jax.random.key(3),
                                             (B, cfg.num_obj, 2))
        txy = 0.8 * (jax.random.uniform(jax.random.key(4),
                                        (B, cfg.num_obj, 2)) * 2 - 1)
        boxes = jnp.concatenate([sxy, txy], axis=-1)
        return cfg, specs, params, frames, boxes

    def test_forward_matches_dense(self, like_setup):
        from stove_tpu.models import supair as supair_lib
        from stove_tpu.ops.pallas_likelihood import likelihood_fused

        cfg, specs, params, frames, boxes = like_setup
        ref = supair_lib.likelihood(params, cfg, specs,
                                    frames, boxes)
        got = likelihood_fused(cfg, specs, params,
                               frames, boxes, tile=4, interpret=True)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)

    def test_no_overlap_correction_path(self, like_setup):
        from stove_tpu.models import supair as supair_lib
        from stove_tpu.ops.pallas_likelihood import likelihood_fused

        cfg, specs, params, frames, boxes = like_setup
        cfg = cfg.with_overrides(overlap_correction=False)
        ref = supair_lib.likelihood(params, cfg, specs,
                                    frames, boxes)
        got = likelihood_fused(cfg, specs, params,
                               frames, boxes, tile=4, interpret=True)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)

    def test_gradients_match_dense(self, like_setup):
        from stove_tpu.models import supair as supair_lib
        from stove_tpu.ops.pallas_likelihood import likelihood_fused

        cfg, specs, params, frames, boxes = like_setup

        def dense(p, b):
            return jnp.sum(supair_lib.likelihood(p, cfg, specs,
                                                 frames, b))

        def fused(p, b):
            return jnp.sum(likelihood_fused(cfg, specs, p, frames,
                                            b, 4, True))

        g1p, g1b = jax.grad(dense, argnums=(0, 1))(params, boxes)
        g2p, g2b = jax.grad(fused, argnums=(0, 1))(params, boxes)
        np.testing.assert_allclose(np.asarray(g2b), np.asarray(g1b),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1p),
                        jax.tree_util.tree_leaves(g2p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestFusedScan:
    """Whole-window posterior-scan kernel vs the XLA lax.scan (interpret
    mode; same pre-drawn ε so the comparison is exact up to matmul
    precision — VERDICT r4 task 3 follow-on)."""

    def _setup(self, **cfg_kw):
        from stove_tpu.config import Config
        from stove_tpu.models import stove as stove_lib

        cfg = Config().with_overrides(**cfg_kw)
        specs = stove_lib.make_specs(jax.random.key(0), cfg)
        params = stove_lib.init_params(jax.random.key(1), cfg, specs)
        w = params["dynamics"]["out"][-1]["w"]
        params["dynamics"]["out"][-1]["w"] = 0.05 * jax.random.normal(
            jax.random.key(5), w.shape)
        B, T2, O, D = 8, 4, cfg.num_obj, cfg.full_state_dim
        ks = jax.random.split(jax.random.key(2), 8)
        z1 = 0.1 * jax.random.normal(ks[0], (B, O, D))
        cm = 0.1 * jax.random.normal(ks[1], (B, O, 2))
        cs = 0.1 + 0.1 * jax.random.uniform(ks[2], (B, O, 2))
        sm = 0.3 * jax.random.normal(ks[3], (B, T2, O, 4))
        ss = 0.05 + 0.1 * jax.random.uniform(ks[4], (B, T2, O, 4))
        acts = jax.random.randint(ks[5], (B, T2), 0, cfg.num_actions)
        eps = jax.random.normal(ks[6], (B, T2, O, D))
        return cfg, params, (z1, cm, cs, sm, ss, acts, eps)

    def _compare(self, cfg, params, args, atol=2e-4):
        from stove_tpu.models import stove as stove_lib
        from stove_tpu.ops import pallas_rollout as pr
        from stove_tpu.ops import pallas_scan as ps

        with jax.default_matmul_precision("float32"):
            ref = stove_lib._scan_xla(params["dynamics"], cfg, *args)
            ref = jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                         ref)
        prepared = pr.prepare_params(params["dynamics"], cfg, jnp.float32)
        got = ps.scan_fused(prepared, cfg, *args, block=8,
                            dtype=jnp.float32, interpret=True)
        for name, a, b in zip(("z", "z_mean", "kl", "rewards"), got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=atol, err_msg=name)

    def test_matches_xla_default_config(self):
        cfg, params, args = self._setup()
        self._compare(cfg, params, args)

    def test_matches_xla_action_reward(self):
        cfg, params, args = self._setup(task="avoidance",
                                        action_conditioned=True,
                                        reward_head=True)
        self._compare(cfg, params, args)

    def test_matches_xla_filtered_velocity(self):
        cfg, params, args = self._setup(velocity_obs="filtered")
        self._compare(cfg, params, args)

    def test_matches_xla_four_objects(self):
        """O=4: the statically enumerated alignment grows to 24
        permutations (the 4-ball generalization row)."""
        cfg, params, args = self._setup(num_obj=4)
        self._compare(cfg, params, args)

    def test_infer_dispatch_matches(self):
        """cfg.scan_impl='pallas' must reproduce the XLA infer end-to-end
        (same keys → same ε; forced through the non-TPU gate)."""
        import os

        from stove_tpu.models import stove as stove_lib

        cfg, params, _ = self._setup()
        specs = stove_lib.make_specs(jax.random.key(0), cfg)
        params = stove_lib.init_params(jax.random.key(1), cfg, specs)
        frames = jax.random.uniform(jax.random.key(3),
                                    (2, 6, cfg.img_size, cfg.img_size))
        ref = stove_lib.infer(params, cfg, specs, frames, None,
                              jax.random.key(4))
        # interpret-mode dispatch: patch scan_fused to interpret=True and
        # force the availability gate
        from stove_tpu.models import supair as supair_lib
        from stove_tpu.ops import pallas_scan as ps
        orig_fused, orig_avail = ps.scan_fused, supair_lib._pallas_available
        try:
            supair_lib._pallas_available = lambda: True
            ps.scan_fused = lambda *a, **k: orig_fused(
                *a, **{**k, "interpret": True, "dtype": jnp.float32})
            cfg_p = cfg.with_overrides(scan_impl="pallas")
            got = stove_lib.infer(params, cfg_p, specs, frames, None,
                                  jax.random.key(4))
        finally:
            ps.scan_fused = orig_fused
            supair_lib._pallas_available = orig_avail
        # weights go through _scan_pallas's bf16 prepare even with the
        # f32 kernel patched in, so this is a bf16-weights-vs-f32 check:
        # the sigmoid reward head amplifies that to ~2e-3 (the tight
        # f32 parity is pinned by the direct _compare tests above)
        tol = {"rewards": 5e-3}
        for name in ("z", "z_mean", "pos_mean", "kl", "rewards"):
            t = tol.get(name, 5e-4)
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                rtol=t, atol=t, err_msg=name)


class TestPallasRollout:
    """Fused whole-horizon rollout kernel (interpret mode; mean path —
    the sampled path needs the TPU PRNG and is probed on silicon by
    scripts/pallas_rollout_probe.py)."""

    def test_mean_rollout_matches_xla(self):
        import jax.numpy as jnp

        from stove_tpu.config import Config
        from stove_tpu.models import stove as stove_lib
        from stove_tpu.ops import pallas_rollout as pr

        cfg = Config()
        specs = stove_lib.make_specs(jax.random.key(0), cfg)
        params = stove_lib.init_params(jax.random.key(1), cfg, specs)
        w = params["dynamics"]["out"][-1]["w"]
        params["dynamics"]["out"][-1]["w"] = 0.05 * jax.random.normal(
            jax.random.key(5), w.shape)
        err = pr.self_check(params["dynamics"], cfg, jax.random.key(2),
                            batch=16, horizon=5, dtype=jnp.float32,
                            interpret=True)
        assert err < 1e-4, err

    def test_open_sigma_variant_compiles(self):
        import jax.numpy as jnp

        from stove_tpu.config import Config
        from stove_tpu.models import stove as stove_lib
        from stove_tpu.ops import pallas_rollout as pr

        cfg = Config().with_overrides(open_loop_sigma=True)
        specs = stove_lib.make_specs(jax.random.key(0), cfg)
        params = stove_lib.init_params(jax.random.key(1), cfg, specs)
        err = pr.self_check(params["dynamics"], cfg, jax.random.key(2),
                            batch=16, horizon=3, dtype=jnp.float32,
                            interpret=True)
        assert err < 1e-4, err

    def test_box_muller_moments_with_signed_bits(self):
        """_bits_to_normals must handle SIGNED int32 bits correctly.

        Regression for the round-3 advisor high finding: an arithmetic
        `>> 8` on the kernel PRNG's signed int32 output produced 'normals'
        with std 3.83 and 26% of draws beyond 5σ.  Drive the (pure-jnp)
        transform with full-range signed threefry bits and check moments.
        """
        import numpy as np

        from stove_tpu.ops.pallas_rollout import _bits_to_normals

        k1, k2 = jax.random.split(jax.random.key(11))
        shape = (512, 512)
        b1 = jax.random.randint(k1, shape, -(2 ** 31), 2 ** 31 - 1,
                                dtype=jnp.int32)
        b2 = jax.random.randint(k2, shape, -(2 ** 31), 2 ** 31 - 1,
                                dtype=jnp.int32)
        x = np.asarray(_bits_to_normals(b1, b2)).ravel()
        n = x.size
        assert abs(x.mean()) < 5.0 / np.sqrt(n), x.mean()
        assert abs(x.std() - 1.0) < 0.01, x.std()
        # P(|N|>5) ≈ 5.7e-7: with n=262144 expect ~0.15 such draws
        assert (np.abs(x) > 5.0).mean() < 1e-4, (np.abs(x) > 5.0).mean()
        # the old bug collapsed negative draws onto a u1=1e-12 atom at
        # |x| = sqrt(-2 log 1e-12) ≈ 7.43 — assert the atom is gone
        assert (np.abs(x) > 6.5).sum() == 0

    def test_box_muller_pair_moments_and_independence(self):
        """Both Box-Muller branches must be standard normals and the
        cos/sin pair uncorrelated (the round-5 noise-path optimization
        consumes BOTH branches per uniform pair — a defect in either
        branch would inject biased process noise into every sampled
        pallas rollout)."""
        import numpy as np

        from stove_tpu.ops.pallas_rollout import _bits_to_normal_pairs

        k1, k2 = jax.random.split(jax.random.key(13))
        shape = (512, 512)
        b1 = jax.random.randint(k1, shape, -(2 ** 31), 2 ** 31 - 1,
                                dtype=jnp.int32)
        b2 = jax.random.randint(k2, shape, -(2 ** 31), 2 ** 31 - 1,
                                dtype=jnp.int32)
        z1, z2 = _bits_to_normal_pairs(b1, b2)
        z1 = np.asarray(z1).ravel()
        z2 = np.asarray(z2).ravel()
        n = z1.size
        for z in (z1, z2):
            assert abs(z.mean()) < 5.0 / np.sqrt(n), z.mean()
            assert abs(z.std() - 1.0) < 0.01, z.std()
            assert (np.abs(z) > 5.0).mean() < 1e-4
            assert (np.abs(z) > 6.5).sum() == 0
        # the two branches of a Box-Muller pair are exactly independent
        corr = float(np.corrcoef(z1, z2)[0, 1])
        assert abs(corr) < 5.0 / np.sqrt(n), corr

    def test_normals_shape_odd_rows(self, monkeypatch):
        """_normals must honor odd leading dims (it draws ceil(rows/2)
        pairs and drops the surplus row).  `pltpu.prng_random_bits` has
        no CPU lowering, so stub it with threefry bits and check the
        shape/slicing logic directly."""
        import numpy as np

        from stove_tpu.ops import pallas_rollout as pr

        keys = iter(jax.random.split(jax.random.key(17), 8))
        monkeypatch.setattr(
            pr.pltpu, "prng_random_bits",
            lambda shape: jax.random.randint(
                next(keys), shape, -(2 ** 31), 2 ** 31 - 1,
                dtype=jnp.int32))
        for rows in (11, 22, 1):
            x = np.asarray(pr._normals((rows, 128)))
            assert x.shape == (rows, 128)
            assert np.isfinite(x).all()
            assert x.std() > 0.5

    def test_action_reward_rollout_matches_xla(self):
        import jax.numpy as jnp

        from stove_tpu.config import Config
        from stove_tpu.models import stove as stove_lib
        from stove_tpu.ops import pallas_rollout as pr

        cfg = Config().with_overrides(task="avoidance",
                                      action_conditioned=True,
                                      reward_head=True)
        specs = stove_lib.make_specs(jax.random.key(0), cfg)
        params = stove_lib.init_params(jax.random.key(1), cfg, specs)
        w = params["dynamics"]["out"][-1]["w"]
        params["dynamics"]["out"][-1]["w"] = 0.01 * jax.random.normal(
            jax.random.key(5), w.shape)
        B, H = 16, 6
        z0 = 0.1 * jax.random.normal(
            jax.random.key(2), (B, cfg.num_obj, cfg.full_state_dim))
        acts = jax.random.randint(jax.random.key(3), (B, H), 0,
                                  cfg.num_actions)
        ref_s, ref_r = stove_lib.rollout(params, cfg, z0, acts, H,
                                         jax.random.key(4), sample=False)
        prep = pr.prepare_params(params["dynamics"], cfg, jnp.float32)
        got_s, got_r = pr.rollout_act(prep, cfg, z0, acts, H, 0,
                                      sample=False, block=16,
                                      dtype=jnp.float32, interpret=True)
        assert float(jnp.max(jnp.abs(got_s - ref_s))) < 1e-4
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 1e-5


class TestPallasGateUnderTrace:
    """The probe-based availability gate (supair._pallas_available) is
    consulted from inside model functions, i.e. almost always while the
    caller is being jit-traced.  Under omnistaging every op staged during
    tracing yields tracers, so the probe must escape the trace
    (ensure_compile_time_eval) — the un-escaped probe raised
    ConcretizationTypeError, cached False, and silently turned every
    "pallas" config into a dense fallback (2026-08-18 phase bench:
    likelihood_pallas_maxerr == 0.0 exactly)."""

    def test_probe_inside_jit_matches_outside(self):
        from stove_tpu.models import supair as sup

        outside = sup._probe_pallas()

        probed = {}

        def f(x):
            # consulted mid-trace, like supair.likelihood does
            probed["inside"] = sup._probe_pallas()
            return x + 1.0

        y = jax.jit(f)(jnp.zeros(()))
        assert float(y) == 1.0
        assert isinstance(probed["inside"], bool)
        assert probed["inside"] == outside

    def test_gate_inside_jit_does_not_poison_cache(self):
        from stove_tpu.models import supair as sup

        sup._pallas_available.cache_clear()
        try:
            inside = {}

            def f(x):
                inside["gate"] = sup._pallas_available()
                return x * 2.0

            jax.jit(f)(jnp.ones(()))
            # first consult happened mid-trace; the cached decision must
            # equal a fresh outside-trace probe, not a trace artifact
            assert inside["gate"] == sup._probe_pallas()
        finally:
            sup._pallas_available.cache_clear()
