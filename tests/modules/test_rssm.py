"""Standalone RSSMCell tests (the Clockwork-VAE per-level core): state
shapes, posterior variants, mode vs sample, and prior-only generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.modules.rssm import RSSMCell


def make_cell(**kwargs):
    defaults = dict(z_dim=4, h_dim=8, c_dim=0, e_dim=6)
    defaults.update(kwargs)
    return RSSMCell(**defaults)


def init_cell(cell, B=3):
    enc = jnp.zeros((B, 6))
    state = (jnp.zeros((B, 4)), jnp.zeros((B, 8)))
    ctx = jnp.zeros((B, 0))
    variables = cell.init(jax.random.PRNGKey(0), enc, state, ctx, jax.random.PRNGKey(1))
    return variables, enc, state, ctx


class TestRSSMCell:
    def test_posterior_step_shapes(self):
        cell = make_cell()
        variables, enc, state, ctx = init_cell(cell)
        (z, h), dists = cell.apply(variables, enc, state, ctx, jax.random.PRNGKey(2))
        assert z.shape == (3, 4) and h.shape == (3, 8)
        for k in ("enc_mu", "enc_sd", "prior_mu", "prior_sd"):
            assert dists[k].shape == (3, 4)
        assert np.all(np.asarray(dists["enc_sd"]) > 0)
        assert np.all(np.asarray(dists["prior_sd"]) > 0)

    def test_use_mode_is_deterministic_mean(self):
        cell = make_cell()
        variables, enc, state, ctx = init_cell(cell)
        enc = jnp.asarray(np.random.default_rng(0).normal(size=enc.shape), jnp.float32)
        (z1, _), d1 = cell.apply(variables, enc, state, ctx, jax.random.PRNGKey(2), use_mode=True)
        (z2, _), _ = cell.apply(variables, enc, state, ctx, jax.random.PRNGKey(3), use_mode=True)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))  # key-independent
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(d1["enc_mu"]))

    def test_sampling_depends_on_key(self):
        cell = make_cell()
        variables, enc, state, ctx = init_cell(cell)
        (z1, _), _ = cell.apply(variables, enc, state, ctx, jax.random.PRNGKey(2))
        (z2, _), _ = cell.apply(variables, enc, state, ctx, jax.random.PRNGKey(3))
        assert not np.allclose(np.asarray(z1), np.asarray(z2))

    def test_residual_posterior_adds_prior_mean(self):
        """With shared params, residual posterior mean = plain posterior mean
        + prior mean (reference rssm.py residual branch)."""
        plain = make_cell()
        res = make_cell(residual_posterior=True)
        variables, enc, state, ctx = init_cell(plain)
        enc = jnp.asarray(np.random.default_rng(1).normal(size=enc.shape), jnp.float32)
        _, d_plain = plain.apply(variables, enc, state, ctx, jax.random.PRNGKey(2), use_mode=True)
        _, d_res = res.apply(variables, enc, state, ctx, jax.random.PRNGKey(2), use_mode=True)
        np.testing.assert_allclose(
            np.asarray(d_res["enc_mu"]),
            np.asarray(d_plain["enc_mu"]) + np.asarray(d_plain["prior_mu"]),
            rtol=1e-5,
        )

    def test_precision_posterior_interpolates(self):
        """Precision-weighted mean lies between posterior and prior means,
        and its sd is below both (variances combine harmonically)."""
        plain = make_cell()
        prec = make_cell(precision_posterior=True)
        variables, enc, state, ctx = init_cell(plain)
        enc = jnp.asarray(np.random.default_rng(2).normal(size=enc.shape), jnp.float32)
        _, dp = plain.apply(variables, enc, state, ctx, jax.random.PRNGKey(2), use_mode=True)
        _, dw = prec.apply(variables, enc, state, ctx, jax.random.PRNGKey(2), use_mode=True)
        lo = np.minimum(np.asarray(dp["enc_mu"]), np.asarray(dp["prior_mu"]))
        hi = np.maximum(np.asarray(dp["enc_mu"]), np.asarray(dp["prior_mu"]))
        mu = np.asarray(dw["enc_mu"])
        assert np.all(mu >= lo - 1e-6) and np.all(mu <= hi + 1e-6)
        assert np.all(np.asarray(dw["enc_sd"]) <= np.asarray(dp["enc_sd"]) + 1e-6)
        assert np.all(np.asarray(dw["enc_sd"]) <= np.asarray(dp["prior_sd"]) + 1e-6)

    def test_generate_ignores_encoder(self):
        cell = make_cell()
        variables, enc, state, ctx = init_cell(cell)
        (z, h), dists = cell.apply(
            variables, state, ctx, jax.random.PRNGKey(2), use_mode=True, method=RSSMCell.generate
        )
        assert z.shape == (3, 4) and h.shape == (3, 8)
        assert "enc_mu" not in dists
        np.testing.assert_array_equal(np.asarray(z), np.asarray(dists["prior_mu"]))

    def test_initial_state_and_context_helpers(self):
        cell = make_cell()
        z0, h0 = cell.initial_state(5)
        assert z0.shape == (5, 4) and h0.shape == (5, 8)
        assert cell.empty_context(5).shape == (5, 0)

    def test_context_changes_transition(self):
        cell = make_cell(c_dim=3)
        B = 2
        enc = jnp.zeros((B, 6))
        state = (jnp.zeros((B, 4)), jnp.zeros((B, 8)))
        ctx0 = jnp.zeros((B, 3))
        variables = cell.init(jax.random.PRNGKey(0), enc, state, ctx0, jax.random.PRNGKey(1))
        (_, h_a), _ = cell.apply(variables, enc, state, ctx0, jax.random.PRNGKey(2), use_mode=True)
        (_, h_b), _ = cell.apply(variables, enc, state, ctx0 + 1.0, jax.random.PRNGKey(2), use_mode=True)
        assert not np.allclose(np.asarray(h_a), np.asarray(h_b))
