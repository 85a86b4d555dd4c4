"""Data-parallel equivalence for more model families: gradients on an 8-device
mesh must match single-device gradients (XLA-inserted psum correctness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.parallel import make_mesh, shard_batch


def grads_close(g1, g8, atol=2e-5):
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestWaveNetDP:
    def test_grad_equivalence(self):
        from blvm_tpu.models import WaveNet

        model = WaveNet(n_layers=3, n_stacks=1, res_channels=16, num_mix=2)
        B, T = 8, 64
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def loss(p, batch):
            l, _, _ = model.apply(p, batch["x"], batch["x_sl"], rngs={"sample": jax.random.PRNGKey(2)})
            return l

        grad_fn = jax.jit(jax.grad(loss))
        make_mesh(1)
        g1 = grad_fn(variables, {"x": x, "x_sl": x_sl})
        mesh = make_mesh(8)
        g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl}, mesh))
        grads_close(g1, g8)


class TestCTCProbeDP:
    def test_grad_equivalence(self):
        from blvm_tpu.data.token_map import TokenMap
        from blvm_tpu.models.lstm_asr import SimpleLSTMASR

        token_map = TokenMap(list("abc "), add_blank=True)
        model = SimpleLSTMASR.from_token_map(token_map, input_size=8, hidden_size=8)
        rng = np.random.default_rng(1)
        B = 8
        x = jnp.asarray(rng.normal(size=(B, 12, 8)), jnp.float32)
        x_sl = jnp.full((B,), 12, jnp.int32)
        y = jnp.asarray(rng.integers(1, 5, size=(B, 3)), jnp.int32)
        y_sl = jnp.full((B,), 3, jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x, x_sl, y, y_sl)

        def loss(p, batch):
            l, _, _ = model.apply(p, batch["x"], batch["x_sl"], batch["y"], batch["y_sl"])
            return l

        grad_fn = jax.jit(jax.grad(loss))
        make_mesh(1)
        g1 = grad_fn(variables, {"x": x, "x_sl": x_sl, "y": y, "y_sl": y_sl})
        mesh = make_mesh(8)
        g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl, "y": y, "y_sl": y_sl}, mesh))
        grads_close(g1, g8)


class TestVRNNDP:
    def test_grad_equivalence(self):
        from blvm_tpu.models import VRNNAudio

        model = VRNNAudio(likelihood="DMoL", input_size=8, hidden_size=8, latent_size=2)
        B, T = 8, 32
        x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def loss(p, batch):
            l, _, _ = model.apply(p, batch["x"], batch["x_sl"], rngs={"sample": jax.random.PRNGKey(2)})
            return l

        grad_fn = jax.jit(jax.grad(loss))
        make_mesh(1)
        g1 = grad_fn(variables, {"x": x, "x_sl": x_sl})
        mesh = make_mesh(8)
        g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl}, mesh))
        grads_close(g1, g8)


class TestSRNNDP:
    def test_grad_equivalence(self):
        from blvm_tpu.models import SRNNAudio

        model = SRNNAudio(likelihood="DMoL", input_size=8, hidden_size=8, latent_size=2, num_mix=2)
        B, T = 8, 32
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def loss(p, batch):
            l, _, _ = model.apply(p, batch["x"], batch["x_sl"], rngs={"sample": jax.random.PRNGKey(2)})
            return l

        grad_fn = jax.jit(jax.grad(loss))
        make_mesh(1)
        g1 = grad_fn(variables, {"x": x, "x_sl": x_sl})
        mesh = make_mesh(8)
        g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl}, mesh))
        grads_close(g1, g8)


class TestSTCNDP:
    def test_grad_equivalence(self):
        from blvm_tpu.models import STCN

        model = STCN(n_layers=2, latent_size=(8, 4), res_channels=8)
        B, T = 8, 32
        x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def loss(p, batch):
            l, _, _ = model.apply(p, batch["x"], batch["x_sl"], rngs={"sample": jax.random.PRNGKey(2)})
            return l

        grad_fn = jax.jit(jax.grad(loss))
        make_mesh(1)
        g1 = grad_fn(variables, {"x": x, "x_sl": x_sl})
        mesh = make_mesh(8)
        g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl}, mesh))
        grads_close(g1, g8)


class TestCWVAEDP:
    def test_grad_equivalence(self):
        from blvm_tpu.models import CWVAEAudio

        model = CWVAEAudio(
            z_size=4, h_size=8, strides=(4, 2), num_level_layers=2, stride_per_layer=2,
            likelihood="DMoL", num_mix=2,
        )
        B, T = 8, 64
        x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def loss(p, batch):
            l, _, _ = model.apply(p, batch["x"], batch["x_sl"], rngs={"sample": jax.random.PRNGKey(2)})
            return l

        grad_fn = jax.jit(jax.grad(loss))
        make_mesh(1)
        g1 = grad_fn(variables, {"x": x, "x_sl": x_sl})
        mesh = make_mesh(8)
        g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl}, mesh))
        grads_close(g1, g8)
