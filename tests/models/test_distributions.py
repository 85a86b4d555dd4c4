"""Tests for the conditional distribution heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.modules.distributions import (
    BernoulliDense,
    CategoricalDense,
    DiagonalGaussianDense,
    DiagonalGaussianMixtureDense,
    DiscretizedLogisticDense,
    DiscretizedLogisticMixtureDense,
    IsotropicGaussianDense,
    get_likelihood_head,
)
from blvm_tpu.ops import discretized_logistic_mixture_ll, gaussian_ll


class TestDiagonalGaussian:
    def test_shapes_and_sd_calibration(self):
        head = DiagonalGaussianDense(y_dim=4, initial_sd=0.5)
        x = jnp.zeros((3, 8))
        variables = head.init(jax.random.PRNGKey(0), x)
        # zero the kernel/bias so pre-activation is exactly 0 → sd == initial_sd
        variables = jax.tree_util.tree_map(jnp.zeros_like, variables)
        mu, sd = head.apply(variables, x)
        assert mu.shape == sd.shape == (3, 4)
        np.testing.assert_allclose(sd, 0.5, rtol=1e-5)

    def test_log_prob_matches_ops(self):
        head = DiagonalGaussianDense(y_dim=2)
        mu = jnp.array([[0.0, 1.0]])
        sd = jnp.array([[1.0, 0.5]])
        y = jnp.array([[0.3, 0.7]])
        got = head.log_prob(y, (mu, sd), reduce_dim=-1)
        np.testing.assert_allclose(got, gaussian_ll(y, mu, sd, epsilon=0), rtol=1e-6)

    def test_rsample_and_mode(self):
        head = DiagonalGaussianDense(y_dim=2)
        mu = jnp.ones((1000, 2)) * 3.0
        sd = jnp.ones((1000, 2)) * 0.1
        z = head.rsample(jax.random.PRNGKey(1), (mu, sd))
        np.testing.assert_allclose(z.mean(), 3.0, atol=0.02)
        np.testing.assert_array_equal(head.mode((mu, sd)), mu)


class TestIsotropicGaussian:
    def test_scalar_sd_broadcast(self):
        head = IsotropicGaussianDense(y_dim=4)
        x = jnp.zeros((2, 6))
        variables = head.init(jax.random.PRNGKey(0), x)
        mu, sd = head.apply(variables, x)
        assert mu.shape == (2, 4) and sd.shape == (2, 1)


class TestMixtureHeads:
    def test_gmm_shapes(self):
        head = DiagonalGaussianMixtureDense(y_dim=3, num_mix=5)
        x = jnp.zeros((2, 7, 16))
        variables = head.init(jax.random.PRNGKey(0), x)
        logits, mu, sd = head.apply(variables, x)
        assert logits.shape == (2, 7, 5)
        assert mu.shape == sd.shape == (2, 7, 3, 5)
        lp = head.log_prob(jnp.zeros((2, 7, 3)), (logits, mu, sd))
        assert lp.shape == (2, 7)

    def test_dmol_shapes_and_log_prob(self):
        head = DiscretizedLogisticMixtureDense(y_dim=1, num_mix=10)
        x = jnp.zeros((2, 7, 30))
        variables = head.init(jax.random.PRNGKey(0), x)
        params = head.apply(variables, x)
        assert params[0].shape == (2, 7, 10)
        assert params[1].shape == (2, 7, 1, 10)
        y = jnp.zeros((2, 7, 1))
        lp = head.log_prob(y, params)
        assert lp.shape == (2, 7)
        np.testing.assert_allclose(
            lp, discretized_logistic_mixture_ll(y, params[0], params[1], params[2]), rtol=1e-6
        )

    def test_dmol_mode_is_top_component_loc(self):
        head = DiscretizedLogisticMixtureDense(y_dim=2, num_mix=3)
        logits = jnp.array([[0.0, 5.0, 0.0]])
        locs = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3)
        mode = head.mode((logits, locs, jnp.zeros_like(locs)))
        np.testing.assert_array_equal(mode, [[1.0, 4.0]])  # component index 1

    def test_dmol_log_scale_clamped(self):
        head = DiscretizedLogisticMixtureDense(y_dim=1, num_mix=2, log_epsilon=-7.0)
        x = jnp.full((1, 10), -100.0)
        variables = head.init(jax.random.PRNGKey(0), x)
        _, _, log_scales = head.apply(variables, x)
        assert float(log_scales.min()) >= -7.0


class TestSimpleHeads:
    def test_categorical(self):
        head = CategoricalDense(y_dim=10)
        x = jnp.zeros((4, 8))
        variables = head.init(jax.random.PRNGKey(0), x)
        logits = head.apply(variables, x)
        assert logits.shape == (4, 10)
        assert head.mode(logits).shape == (4,)
        assert head.sample(jax.random.PRNGKey(1), logits).shape == (4,)

    def test_bernoulli_mode(self):
        head = BernoulliDense(y_dim=3)
        logits = jnp.array([[-1.0, 0.5, 2.0]])
        np.testing.assert_array_equal(head.mode(logits), [[0.0, 1.0, 1.0]])


class TestHeadFactory:
    @pytest.mark.parametrize("name", ["DMoL", "GMM", "Gaussian", "bernoulli"])
    def test_factory(self, name):
        head = get_likelihood_head(name, y_dim=2)
        assert head is not None

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_likelihood_head("nope", y_dim=1)
