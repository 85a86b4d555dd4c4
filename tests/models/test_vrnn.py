"""VRNNAudio tests: ELBO contract, KL positivity, beta/free-nats effects,
bucketing invariances, generation, and training convergence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models.vrnn import VRNNAudio


@pytest.fixture(scope="module")
def model():
    return VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8)


@pytest.fixture(scope="module")
def params(model):
    x = jnp.zeros((2, 64))
    x_sl = jnp.array([64, 48])
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
    return variables["params"]


def run(model, params, x, x_sl, key=0, **kw):
    return model.apply({"params": params}, x, x_sl, rngs={"sample": jax.random.PRNGKey(key)}, **kw)


class TestForward:
    def test_contract(self, model, params):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        loss, mets, out = run(model, params, x, x_sl)
        assert np.isfinite(loss)
        assert mets["elbo"].shape == (2,)
        assert out.z.shape == (2, 4, 8)  # (B, T/S, z)
        assert out.h_n.shape == (2, 48)  # r_dim = 2*h
        metrics = model.build_metrics(jax.device_get(mets))
        assert [m.name for m in metrics] == ["loss", "elbo", "rec", "kl", "kl (bpt)", "bpd", "beta", "free_nats"]

    def test_elbo_decomposition(self, model, params):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 64])
        _, mets, _ = run(model, params, x, x_sl)
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]), np.asarray(mets["log_prob"]) - np.asarray(mets["kl"]), rtol=1e-5
        )
        assert np.all(np.asarray(mets["kl"]) >= 0)

    def test_beta_zero_reduces_to_nll(self, model, params):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 64])
        loss_b0, mets, _ = run(model, params, x, x_sl, beta=0.0)
        np.testing.assert_allclose(
            float(loss_b0), -np.asarray(mets["log_prob"]).sum() / float(np.asarray(x_sl).sum()), rtol=1e-5
        )

    def test_free_nats_floor_increases_kl_term(self, model, params):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 64])
        loss_fn0, _, _ = run(model, params, x, x_sl, free_nats=0.0)
        loss_fn8, _, _ = run(model, params, x, x_sl, free_nats=8.0)
        assert float(loss_fn8) >= float(loss_fn0) - 1e-5

    def test_bucket_time_padding_invariant(self, model, params):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        _, mets, _ = run(model, params, x, x_sl)
        # pad T by two full stacks (bucketing)
        _, mets_pad, _ = run(model, params, jnp.pad(x, ((0, 0), (0, 32))), x_sl)
        np.testing.assert_allclose(np.asarray(mets["elbo"]), np.asarray(mets_pad["elbo"]), atol=1e-3)

    def test_zero_length_row_invariant(self, model, params):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        _, mets, _ = run(model, params, x, x_sl)
        x_aug = jnp.concatenate([x, jnp.zeros((1, 64))], axis=0)
        _, mets_aug, _ = run(model, params, x_aug, jnp.array([64, 48, 0]))
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]).sum(), np.asarray(mets_aug["elbo"]).sum(), rtol=1e-4
        )

    def test_state_carry_shape(self, model, params):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 64])
        _, _, out = run(model, params, x, x_sl)
        # feed h_n back as h0 (chunked eval state carry)
        loss2, _, _ = run(model, params, x, x_sl, h0=out.h_n)
        assert np.isfinite(loss2)


class TestLikelihoods:
    @pytest.mark.parametrize("lik", ["GMM", "Gaussian"])
    def test_alternative_likelihoods(self, lik):
        model = VRNNAudio(likelihood=lik, input_size=16, hidden_size=16, latent_size=4)
        x = jnp.asarray(np.random.default_rng(7).normal(0, 0.3, (2, 48)), jnp.float32)
        x_sl = jnp.array([48, 32])
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        loss, mets, _ = model.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
        assert np.isfinite(loss)


class TestGenerate:
    def test_generate_with_custom_r_dim(self):
        """Regression (VERDICT round-1 #9): generate's initial state must use
        the model's r_dim rule, not a hardcoded 2*hidden_size."""
        model = VRNNAudio(likelihood="DMoL", input_size=8, hidden_size=16, latent_size=4, r_dim=24)
        x = jnp.zeros((2, 32))
        x_sl = jnp.array([32, 32])
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        _, _, out = model.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
        assert out.h_n.shape == (2, 24)
        (x_out, _), _ = model.apply(
            variables, n_samples=2, max_timesteps=3, rngs={"sample": jax.random.PRNGKey(3)},
            method=VRNNAudio.generate,
        )
        assert x_out.shape == (2, 3 * 8, 1)
        assert np.all(np.isfinite(np.asarray(x_out)))

    def test_generate_shapes(self, model, params):
        (x_out, x_sl), _ = model.apply(
            {"params": params},
            n_samples=2,
            max_timesteps=5,
            rngs={"sample": jax.random.PRNGKey(0)},
            method=VRNNAudio.generate,
        )
        assert x_out.shape == (2, 5 * 16, 1)
        assert float(jnp.max(jnp.abs(x_out))) <= 1.0


class TestTraining:
    def test_loss_decreases(self):
        model = VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=16, latent_size=4)
        rng = np.random.default_rng(8)
        base = np.sin(np.linspace(0, 12, 128)) * 0.4
        x = jnp.asarray(np.stack([base + rng.normal(scale=0.01, size=128) for _ in range(4)]), jnp.float32)
        x_sl = jnp.full((4,), 128, jnp.int32)

        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        import optax

        tx = optax.adam(3e-3)
        params = variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                loss, _, _ = model.apply({"params": p}, x, x_sl, rngs={"sample": key})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        key = jax.random.PRNGKey(2)
        losses = []
        for i in range(25):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
