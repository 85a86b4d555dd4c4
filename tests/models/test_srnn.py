"""SRNNAudio tests: contract, smoothing path, invariances, generation, training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models.srnn import SRNNAudio


@pytest.fixture(scope="module", params=[True, False], ids=["smoothing", "filtering"])
def model(request):
    return SRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, smoothing=request.param)


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
        assert out.z.shape == (2, 4, 8)
        assert out.d_n.shape == (2, 48)
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]), np.asarray(mets["log_prob"]) - np.asarray(mets["kl"]), rtol=1e-4
        )
        assert np.all(np.asarray(mets["kl"]) >= 0)

    def test_bucket_time_padding_invariant(self, model, params):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        _, mets, _ = run(model, params, x, x_sl)
        _, mets_pad, _ = run(model, params, jnp.pad(x, ((0, 0), (0, 32))), x_sl)
        np.testing.assert_allclose(np.asarray(mets["elbo"]), np.asarray(mets_pad["elbo"]), atol=1e-3)

    def test_zero_length_row_invariant(self, model, params):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        _, mets, _ = run(model, params, x, x_sl)
        x_aug = jnp.concatenate([x, jnp.zeros((1, 64))], axis=0)
        _, mets_aug, _ = run(model, params, x_aug, jnp.array([64, 48, 0]))
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]).sum(), np.asarray(mets_aug["elbo"]).sum(), rtol=1e-4
        )

    def test_state_carry(self, model, params):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 64])
        _, _, out = run(model, params, x, x_sl)
        loss2, _, _ = run(model, params, x, x_sl, d_0=out.d_n, z_0=out.z_n)
        assert np.isfinite(loss2)

    def test_split_sequence(self, model, params):
        x = np.random.default_rng(4).uniform(-1, 1, (2, 100)).astype(np.float32)
        x_sl = np.array([100, 60])
        chunks, lens = model.split_sequence(x, x_sl, length=40)
        assert all(c.shape[1] % 16 == 0 for c in chunks)
        total = np.sum(np.stack(lens), axis=0)
        np.testing.assert_array_equal(total, x_sl)


class TestGenerate:
    def test_shapes(self, model, params):
        (x_out, x_sl), _ = model.apply(
            {"params": params},
            n_samples=2,
            max_timesteps=4,
            rngs={"sample": jax.random.PRNGKey(0)},
            method=SRNNAudio.generate,
        )
        assert x_out.shape == (2, 4 * 16, 1)


class TestTraining:
    def test_loss_decreases(self):
        model = SRNNAudio(likelihood="DMoL", input_size=16, hidden_size=16, latent_size=4)
        rng = np.random.default_rng(5)
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
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(2)
        losses = []
        for _ in range(25):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
