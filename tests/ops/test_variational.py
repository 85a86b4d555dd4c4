"""Tests for KL divergences, free nats, and reparameterized samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blvm_tpu.ops import (
    discount_free_nats,
    kl_divergence_gaussian,
    kl_divergence_gaussian_mc,
    precision_weighted_gaussian,
    rsample_discretized_logistic,
    rsample_discretized_logistic_mixture,
    rsample_gaussian,
    rsample_gaussian_mixture,
    rsample_gumbel_softmax,
    rsample_logistic,
)


class TestKLGaussian:
    def test_identical_distributions_zero(self):
        mu = np.array([0.3, -1.2])
        sd = np.array([0.5, 2.0])
        np.testing.assert_allclose(kl_divergence_gaussian(mu, sd, mu, sd), 0.0, atol=1e-7)

    def test_matches_closed_form(self):
        # KL(N(1, 2) || N(0, 1)) = log(1/2) + (4 + 1)/2 - 1/2 = -log 2 + 2
        got = kl_divergence_gaussian(1.0, 2.0, 0.0, 1.0)
        np.testing.assert_allclose(got, -np.log(2.0) + 2.0, rtol=1e-6)

    def test_mc_estimate_converges_to_analytic(self):
        key = jax.random.PRNGKey(0)
        mu_q, sd_q, mu_p, sd_p = 0.5, 0.8, 0.0, 1.2
        z = mu_q + sd_q * jax.random.normal(key, (200_000,))
        mc = jnp.mean(kl_divergence_gaussian_mc(mu_q, sd_q, mu_p, sd_p, z))
        analytic = kl_divergence_gaussian(mu_q, sd_q, mu_p, sd_p)
        np.testing.assert_allclose(mc, analytic, rtol=2e-2)


class TestFreeNats:
    def test_none_or_zero_is_identity(self):
        kld = jnp.array([[0.1, 5.0]])
        assert discount_free_nats(kld, None) is kld
        assert discount_free_nats(kld, 0) is kld

    def test_elementwise_floor(self):
        kld = jnp.array([0.1, 5.0, 1.9])
        got = discount_free_nats(kld, free_nats=2.0)
        np.testing.assert_allclose(got, [2.0, 5.0, 2.0])

    def test_shared_dims_splits_budget(self):
        kld = jnp.zeros((2, 10))
        got = discount_free_nats(kld, free_nats=5.0, shared_dims=-1)
        np.testing.assert_allclose(got, 0.5 * np.ones((2, 10)))

    def test_shared_dims_tuple(self):
        kld = jnp.zeros((2, 4, 5))
        got = discount_free_nats(kld, free_nats=10.0, shared_dims=(-2, -1))
        np.testing.assert_allclose(got, 0.5 * np.ones((2, 4, 5)))


class TestPrecisionWeighted:
    def test_equal_gaussians(self):
        mu, sd = precision_weighted_gaussian(1.0, 2.0, 1.0, 2.0)
        np.testing.assert_allclose(mu, 1.0)
        np.testing.assert_allclose(sd, 2.0 / np.sqrt(2.0), rtol=1e-6)

    def test_infinite_precision_dominates(self):
        mu, sd = precision_weighted_gaussian(0.0, 1e-4, 10.0, 1e4)
        np.testing.assert_allclose(mu, 0.0, atol=1e-6)


class TestSamplers:
    def test_gaussian_moments(self):
        key = jax.random.PRNGKey(1)
        z = rsample_gaussian(key, jnp.full((100_000,), 2.0), jnp.full((100_000,), 0.5))
        np.testing.assert_allclose(jnp.mean(z), 2.0, atol=0.02)
        np.testing.assert_allclose(jnp.std(z), 0.5, atol=0.02)

    def test_gaussian_reparameterized_gradient(self):
        def f(mu):
            return jnp.mean(rsample_gaussian(jax.random.PRNGKey(0), mu, jnp.ones_like(mu)))

        g = jax.grad(f)(jnp.zeros(16))
        np.testing.assert_allclose(g, np.full(16, 1 / 16), rtol=1e-5)

    def test_logistic_moments(self):
        key = jax.random.PRNGKey(2)
        # logistic(mu, s): mean mu, var s^2 pi^2 / 3
        s = 0.3
        z = rsample_logistic(key, jnp.full((200_000,), 1.0), jnp.full((200_000,), np.log(s)))
        np.testing.assert_allclose(jnp.mean(z), 1.0, atol=0.02)
        np.testing.assert_allclose(jnp.std(z), s * np.pi / np.sqrt(3), atol=0.02)

    def test_discretized_logistic_clamped(self):
        key = jax.random.PRNGKey(3)
        z = rsample_discretized_logistic(key, jnp.zeros(10_000), jnp.full(10_000, 2.0))
        assert float(jnp.max(z)) <= 1.0 and float(jnp.min(z)) >= -1.0

    def test_gaussian_mixture_picks_dominant_component(self):
        key = jax.random.PRNGKey(4)
        B, D, M = 20_000, 1, 2
        logits = jnp.tile(jnp.array([[10.0, -10.0]]), (B, 1))
        mu = jnp.tile(jnp.array([[[5.0, -5.0]]]), (B, 1, 1))
        sd = jnp.full((B, D, M), 0.1)
        z = rsample_gaussian_mixture(key, logits, mu, sd)
        assert z.shape == (B, D)
        np.testing.assert_allclose(jnp.mean(z), 5.0, atol=0.05)

    def test_dmol_sampler_shape_and_range(self):
        key = jax.random.PRNGKey(5)
        B, D, M = 1000, 4, 3
        z = rsample_discretized_logistic_mixture(
            key, jnp.zeros((B, M)), jnp.zeros((B, D, M)), jnp.full((B, D, M), -2.0)
        )
        assert z.shape == (B, D)
        assert float(jnp.max(z)) <= 1.0 and float(jnp.min(z)) >= -1.0

    def test_gumbel_softmax_soft_sums_to_one(self):
        key = jax.random.PRNGKey(6)
        y = rsample_gumbel_softmax(key, jnp.zeros((32, 5)), tau=1.0, hard=False)
        np.testing.assert_allclose(jnp.sum(y, -1), np.ones(32), rtol=1e-5)

    def test_gumbel_softmax_hard_is_onehot_with_soft_grad(self):
        key = jax.random.PRNGKey(7)

        def f(logits):
            return jnp.sum(rsample_gumbel_softmax(key, logits, hard=True) ** 2)

        logits = jnp.zeros((8, 5))
        y = rsample_gumbel_softmax(key, logits, hard=True)
        np.testing.assert_allclose(jnp.sum(y, -1), np.ones(8), rtol=1e-6)
        assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}
        g = jax.grad(f)(logits)
        assert np.any(np.asarray(g) != 0.0)  # straight-through gradient flows
