"""Tests for importance-weighted bound estimation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.evaluation.bounds import importance_weighted_bound, model_iw_bound
from blvm_tpu.models.vrnn import VRNNAudio


class TestIWBoundMath:
    def test_constant_weights_equal_bound(self):
        # if all weights equal w, bound = log w regardless of K
        logw = jnp.log(jnp.full((3,), 0.25))
        got = importance_weighted_bound(lambda k: logw, jax.random.PRNGKey(0), num_samples=8)
        np.testing.assert_allclose(got, np.log(0.25), rtol=1e-6)

    def test_known_gaussian_marginal(self):
        """IW estimate converges to a tractable log marginal.

        Model: z ~ N(0,1), x | z ~ N(z, 1) → p(x) = N(x; 0, 2).
        Proposal q(z|x) = N(0, 1) (the prior): log w = log p(x|z).
        """
        x = 0.7
        key = jax.random.PRNGKey(0)

        def log_weight(k):
            z = jax.random.normal(k, (512,))  # 512 chains in parallel
            return -0.5 * (x - z) ** 2 - 0.5 * np.log(2 * np.pi)

        bound = importance_weighted_bound(log_weight, key, num_samples=2000)
        # average the per-chain bounds (each is a K=2000 estimate)
        est = float(jnp.mean(bound))
        true = -0.5 * x**2 / 2 - 0.5 * np.log(2 * np.pi * 2)
        np.testing.assert_allclose(est, true, atol=2e-2)


class TestModelIWBound:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=16, latent_size=4)
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        return model, variables["params"], x, x_sl

    def test_iw_bound_at_least_elbo(self, model_and_params):
        """E[IWAE_K] >= E[ELBO]; compare averaged estimates."""
        model, params, x, x_sl = model_and_params

        elbos = []
        for i in range(12):
            _, mets, _ = model.apply({"params": params}, x, x_sl, rngs={"sample": jax.random.PRNGKey(100 + i)})
            elbos.append(np.asarray(mets["log_prob"]) - np.asarray(mets["mc_kl"]))
        elbo_est = np.mean(elbos, axis=0)

        bound = model_iw_bound(model, params, x, x_sl, jax.random.PRNGKey(7), num_samples=12)
        assert np.all(np.asarray(bound) >= elbo_est - 5.0)  # slack for MC noise

    def test_k1_is_a_sampled_elbo(self, model_and_params):
        model, params, x, x_sl = model_and_params
        b1 = model_iw_bound(model, params, x, x_sl, jax.random.PRNGKey(3), num_samples=1)
        assert np.all(np.isfinite(np.asarray(b1)))

    def test_bound_increases_with_k_on_average(self, model_and_params):
        model, params, x, x_sl = model_and_params
        b1 = np.mean([
            float(np.mean(np.asarray(model_iw_bound(model, params, x, x_sl, jax.random.PRNGKey(i), num_samples=1))))
            for i in range(8)
        ])
        b16 = float(np.mean(np.asarray(model_iw_bound(model, params, x, x_sl, jax.random.PRNGKey(0), num_samples=16))))
        assert b16 >= b1 - 2.0  # monotone in expectation (slack for noise)
