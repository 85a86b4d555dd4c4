"""Golden-value tests for the likelihood math (the bits/frame parity surface).

Every likelihood is cross-checked against an independent float64 numpy
re-derivation, including the three DMoL edge cases (lowest bin, highest bin,
vanishing cdf mass).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blvm_tpu.ops import (
    bernoulli_ll,
    categorical_ll,
    discretized_logistic_ll,
    discretized_logistic_mixture_ll,
    gaussian_ll,
    gaussian_mixture_ll,
)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_softplus(x):
    return np.logaddexp(0.0, x)


def np_log_softmax(x, axis=-1):
    x = x - np.max(x, axis=axis, keepdims=True)
    return x - np.log(np.sum(np.exp(x), axis=axis, keepdims=True))


def np_dmol_elementwise(y, loc, log_scale, num_bins):
    """Independent float64 derivation of discretized logistic log-mass."""
    centered = y - loc
    inv_s = np.exp(-log_scale)
    half = 1.0 / (num_bins - 1)
    plus_in = inv_s * (centered + half)
    minus_in = inv_s * (centered - half)
    cdf_delta = np_sigmoid(plus_in) - np_sigmoid(minus_in)

    log_cdf_plus = plus_in - np_softplus(plus_in)
    log_one_minus_cdf_minus = -np_softplus(minus_in)
    mid_in = inv_s * centered
    log_pdf_mid = mid_in - log_scale - 2.0 * np_softplus(mid_in)
    mid_safe = np.where(
        cdf_delta > 1e-5, np.log(np.clip(cdf_delta, 1e-10, None)), log_pdf_mid - math.log(num_bins / 2)
    )
    out = np.where(y < 2.0 / num_bins - 1.0, log_cdf_plus, mid_safe)
    out = np.where(y > 1.0 - 2.0 / num_bins, log_one_minus_cdf_minus, out)
    return out


class TestGaussianLL:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        y = rng.normal(size=(4, 7)).astype(np.float64)
        mu = rng.normal(size=(4, 7))
        sd = rng.uniform(0.1, 2.0, size=(4, 7))
        expected = -((y - mu) ** 2) / (2 * sd**2) - np.log(sd) - 0.5 * np.log(2 * np.pi)
        got = gaussian_ll(y, mu, sd, reduce_dim=None)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_reduce_dim_sums(self):
        y = np.zeros((2, 3))
        got = gaussian_ll(y, y, np.ones_like(y), reduce_dim=-1)
        assert got.shape == (2,)
        np.testing.assert_allclose(got, 3 * (-0.5 * np.log(2 * np.pi)), rtol=1e-6)

    def test_reduce_dim_squeezes_singleton(self):
        y = np.zeros((2, 1))
        got = gaussian_ll(y, y, np.ones_like(y), reduce_dim=-1)
        assert got.shape == (2,)

    def test_epsilon_clamp_has_no_gradient_effect(self):
        # sd below epsilon: value uses clamped sd but gradient flows as if unclamped
        def f(sd):
            return gaussian_ll(jnp.array(0.5), jnp.array(0.0), sd, epsilon=1e-2, reduce_dim=None)

        val = f(jnp.array(1e-4))
        clamped = gaussian_ll(0.5, 0.0, 1e-2, epsilon=None, reduce_dim=None)
        np.testing.assert_allclose(val, clamped, rtol=1e-6)
        g = jax.grad(f)(jnp.array(1e-4))
        assert np.isfinite(g)


class TestGaussianMixtureLL:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        B, D, M = 5, 3, 4
        y = rng.normal(size=(B, D))
        logits = rng.normal(size=(B, M))
        mu = rng.normal(size=(B, D, M))
        sd = rng.uniform(0.2, 1.5, size=(B, D, M))

        comp_ll = -((y[..., None] - mu) ** 2) / (2 * sd**2) - np.log(sd) - 0.5 * np.log(2 * np.pi)
        comp_ll = comp_ll.sum(axis=1)  # reduce D per component
        log_w = np_log_softmax(logits)
        expected = np.max(comp_ll + log_w, axis=-1) + np.log(
            np.sum(np.exp(comp_ll + log_w - np.max(comp_ll + log_w, axis=-1, keepdims=True)), axis=-1)
        )
        got = gaussian_mixture_ll(y, logits, mu, sd)
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_single_component_equals_gaussian(self):
        rng = np.random.default_rng(2)
        y = rng.normal(size=(4, 3))
        mu = rng.normal(size=(4, 3, 1))
        sd = rng.uniform(0.3, 1.0, size=(4, 3, 1))
        got = gaussian_mixture_ll(y, np.zeros((4, 1)), mu, sd)
        expected = gaussian_ll(y, mu[..., 0], sd[..., 0], reduce_dim=-1)
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestCategoricalLL:
    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(2, 5, 10))
        y = rng.integers(0, 10, size=(2, 5))
        log_probs = np_log_softmax(logits)
        expected = np.take_along_axis(log_probs, y[..., None], axis=-1)[..., 0].sum(-1)
        got = categorical_ll(y, logits)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_uniform_logits(self):
        got = categorical_ll(np.array([0, 3]), np.zeros((2, 4)), reduce_dim=None)
        np.testing.assert_allclose(got, np.log(0.25) * np.ones(2), rtol=1e-6)


class TestBernoulliLL:
    def test_matches_numpy(self):
        rng = np.random.default_rng(4)
        logits = rng.normal(size=(3, 6))
        y = rng.integers(0, 2, size=(3, 6)).astype(np.float64)
        p = np_sigmoid(logits)
        expected = (y * np.log(p) + (1 - y) * np.log1p(-p)).sum(-1)
        got = bernoulli_ll(y, logits)
        np.testing.assert_allclose(got, expected, rtol=1e-4)


class TestDiscretizedLogisticLL:
    @pytest.mark.parametrize("num_bins", [256, 2**16])
    def test_matches_numpy_all_regions(self, num_bins):
        # cover lowest-bin, highest-bin, normal and tiny-mass regions
        y = np.array([-1.0, -0.999, 0.0, 0.5, 0.999, 1.0])
        loc = np.array([0.0, 0.0, 0.1, 0.5, 0.0, 0.0])
        log_scale = np.array([-2.0, -2.0, -3.0, -15.0, -2.0, -2.0])  # -15 → tiny cdf_delta
        expected = np_dmol_elementwise(y, loc, log_scale, num_bins)
        got = discretized_logistic_ll(y, loc, log_scale, num_bins=num_bins, reduce_dim=None)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_total_mass_sums_to_one(self):
        # sum of exp(log_prob) over all bin centers ≈ 1
        num_bins = 256
        centers = np.linspace(-1, 1, num_bins)
        lp = discretized_logistic_ll(
            centers, np.full(num_bins, 0.1), np.full(num_bins, -2.0), num_bins=num_bins, reduce_dim=None
        )
        np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(), 1.0, atol=1e-3)

    def test_gradients_finite(self):
        def f(loc):
            return jnp.sum(discretized_logistic_ll(jnp.array([-1.0, 0.0, 1.0]), loc, jnp.full(3, -2.0)))

        g = jax.grad(f)(jnp.array([0.0, 0.0, 0.0]))
        assert np.all(np.isfinite(g))


class TestDiscretizedLogisticMixtureLL:
    def test_matches_numpy(self):
        rng = np.random.default_rng(5)
        B, D, M = 4, 6, 3
        y = rng.uniform(-1, 1, size=(B, D))
        logit_probs = rng.normal(size=(B, M))
        locs = rng.uniform(-0.5, 0.5, size=(B, D, M))
        log_scales = rng.uniform(-4, -1, size=(B, D, M))

        per_comp = np_dmol_elementwise(y[..., None], locs, log_scales, 256).sum(axis=1)
        weighted = per_comp + np_log_softmax(logit_probs)
        m = np.max(weighted, axis=-1, keepdims=True)
        expected = (m + np.log(np.sum(np.exp(weighted - m), axis=-1, keepdims=True)))[..., 0]
        got = discretized_logistic_mixture_ll(y, logit_probs, locs, log_scales)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_single_component_equals_single(self):
        rng = np.random.default_rng(6)
        y = rng.uniform(-1, 1, size=(4, 5))
        locs = rng.uniform(-0.5, 0.5, size=(4, 5, 1))
        log_scales = rng.uniform(-4, -1, size=(4, 5, 1))
        got = discretized_logistic_mixture_ll(y, np.zeros((4, 1)), locs, log_scales)
        expected = discretized_logistic_ll(y, locs[..., 0], log_scales[..., 0], reduce_dim=-1)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
