"""Golden-value tests pinning the RAT-SPN to a naive recursive oracle and to
calculus (normalization, exact marginalization) — SURVEY.md §7 risk item #1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stove_tpu.models import spn


def _small_spec(num_vars=12, depth=2, num_sums=3, num_leaves=2, num_reps=2):
    return spn.make_spec(jax.random.key(7), num_vars, depth, num_sums,
                         num_leaves, num_reps, min_std=0.1, max_std=0.8)


@pytest.fixture(scope="module")
def setup():
    spec = _small_spec()
    params = spn.init_params(jax.random.key(3), spec)
    x = jax.random.uniform(jax.random.key(5), (6, spec.num_vars))
    return spec, params, x


class TestStructure:
    def test_scopes_partition_variables(self):
        spec = _small_spec()
        # per repetition, leaf scopes partition the variable set exactly
        total = spec.scopes.sum(axis=1)              # (R, V)
        np.testing.assert_array_equal(total, np.ones_like(total))

    def test_scopes_differ_between_reps(self):
        spec = _small_spec()
        assert not np.array_equal(spec.perms[0], spec.perms[1])


class TestAgainstOracle:
    def test_matches_numpy_oracle(self, setup):
        spec, params, x = setup
        fast = spn.spn_log_prob(spec, params, x)
        slow = spn.spn_log_prob_numpy(spec, params, np.asarray(x))
        np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-5)

    def test_matches_oracle_with_marginalization(self, setup):
        spec, params, x = setup
        w = (jax.random.uniform(jax.random.key(9), x.shape) > 0.3).astype(
            jnp.float32)
        fast = spn.spn_log_prob(spec, params, x, w)
        slow = spn.spn_log_prob_numpy(spec, params, np.asarray(x),
                                      np.asarray(w))
        np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-5)

    def test_matmul_leaf_path_matches_dense(self, setup):
        """The 3-matmul leaf restructure must equal the dense path (up to
        f32 summation order) — with and without fractional weights, at a
        realistic size (bg SPN: V=1024)."""
        spec, params, x = setup
        w = jax.random.uniform(jax.random.key(11), x.shape)
        for ww in (None, w):
            a = spn.spn_log_prob(spec, params, x, ww)
            b = spn.spn_log_prob_matmul(spec, params, x, ww)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
        big = spn.make_spec(jax.random.key(8), 1024, 3, 6, 6, 2,
                            min_std=0.08, max_std=1.0)
        bp = spn.init_params(jax.random.key(4), big)
        xb = jax.random.uniform(jax.random.key(6), (4, 1024))
        wb = jax.random.uniform(jax.random.key(7), (4, 1024))
        a = spn.spn_log_prob(big, bp, xb, wb)
        b = spn.spn_log_prob_matmul(big, bp, xb, wb)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3)

    def test_matmul_path_grads_match_dense(self, setup):
        spec, params, x = setup
        g1 = jax.grad(lambda p: jnp.sum(spn.spn_log_prob(spec, p, x)))(params)
        g2 = jax.grad(lambda p: jnp.sum(
            spn.spn_log_prob_matmul(spec, p, x)))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


class TestCalculus:
    def test_full_marginalization_is_zero(self, setup):
        """Integrating out every variable must give log ∫ p = log 1 = 0."""
        spec, params, x = setup
        w = jnp.zeros_like(x)
        out = spn.spn_log_prob(spec, params, x, w)
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_single_var_marginalization_matches_quadrature(self, setup):
        """Marginalizing one variable == numerically integrating it out."""
        spec, params, x = setup
        v = 4
        w = jnp.ones_like(x).at[:, v].set(0.0)
        marg = spn.spn_log_prob(spec, params, x, w)
        # quadrature over x_v on a wide fine grid
        grid = jnp.linspace(-4.0, 5.0, 1500)
        dx = float(grid[1] - grid[0])

        def at_val(val):
            xs = x.at[:, v].set(val)
            return spn.spn_log_prob(spec, params, xs)

        lls = jax.vmap(at_val)(grid)                     # (G, B)
        quad = jax.scipy.special.logsumexp(lls, axis=0) + jnp.log(dx)
        np.testing.assert_allclose(marg, quad, rtol=1e-4, atol=1e-3)

    def test_normalized_density(self):
        """For V=2 the SPN must integrate to 1 over the plane."""
        spec = _small_spec(num_vars=2, depth=1, num_sums=2, num_leaves=2,
                           num_reps=2)
        params = spn.init_params(jax.random.key(0), spec)
        grid = jnp.linspace(-4.0, 5.0, 400)
        dx = float(grid[1] - grid[0])
        xx, yy = jnp.meshgrid(grid, grid)
        pts = jnp.stack([xx.ravel(), yy.ravel()], -1)
        ll = spn.spn_log_prob(spec, params, pts)
        total = jax.scipy.special.logsumexp(ll) + 2 * jnp.log(dx)
        np.testing.assert_allclose(float(total), 0.0, atol=1e-3)


class TestJit:
    def test_jit_and_grad(self, setup):
        spec, params, x = setup

        @jax.jit
        def loss(p, x):
            return -jnp.mean(spn.spn_log_prob(spec, p, x))

        g = jax.grad(loss)(params, x)
        for k, v in g.items():
            assert jnp.all(jnp.isfinite(v)), k
        # a gradient step must decrease NLL
        l0 = loss(params, x)
        p2 = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g, params, g)
        assert loss(p2, x) < l0

    def test_batch_shape(self, setup):
        spec, params, x = setup
        out = spn.spn_log_prob(spec, params, x)
        assert out.shape == (x.shape[0],)
