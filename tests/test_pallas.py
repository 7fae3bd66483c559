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
