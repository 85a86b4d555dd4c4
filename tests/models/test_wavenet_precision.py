"""WaveNet bf16 / remat options: loss stays close to f32, grads finite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models import WaveNet


def setup_model(**kwargs):
    model = WaveNet(n_layers=4, n_stacks=2, res_channels=16, num_mix=2, **kwargs)
    T = 64
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, T)), jnp.float32)
    x_sl = jnp.array([T, T])
    return model, x, x_sl


class TestMixedPrecision:
    def test_bf16_loss_close_to_f32(self):
        model32, x, x_sl = setup_model()
        variables = model32.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        loss32, _, _ = model32.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})

        model16 = WaveNet(n_layers=4, n_stacks=2, res_channels=16, num_mix=2, bf16=True)
        loss16, _, _ = model16.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})

        np.testing.assert_allclose(float(loss16), float(loss32), rtol=2e-2)

    def test_bf16_gradients_finite_and_f32(self):
        model, x, x_sl = setup_model(bf16=True)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def loss_fn(p):
            loss, _, _ = model.apply({"params": p["params"]}, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
            return loss

        grads = jax.grad(loss_fn)(variables)
        for g in jax.tree_util.tree_leaves(grads):
            assert g.dtype == jnp.float32  # master grads in f32
            assert np.all(np.isfinite(np.asarray(g)))


class TestRemat:
    def test_remat_matches_plain(self):
        model, x, x_sl = setup_model()
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        loss_plain, _, _ = model.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})

        model_r = WaveNet(n_layers=4, n_stacks=2, res_channels=16, num_mix=2, remat=True)
        loss_remat, _, _ = model_r.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(float(loss_remat), float(loss_plain), rtol=1e-6)

        # gradients identical too (remat only changes memory/flops tradeoff)
        def loss_fn(model, p):
            loss, _, _ = model.apply(p, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
            return loss

        g1 = jax.grad(lambda p: loss_fn(model, p))(variables)
        g2 = jax.grad(lambda p: loss_fn(model_r, p))(variables)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
