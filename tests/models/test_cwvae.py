"""Clockwork-VAE tests: coder geometry, hierarchy shapes, ELBO, state carry,
generation and training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models.clockwork_vae import CWVAEAudio, ConvCoder1d


def make_model(**kwargs):
    defaults = dict(z_size=8, h_size=16, strides=(4, 2), num_level_layers=2, stride_per_layer=2)
    defaults.update(kwargs)
    return CWVAEAudio(**defaults)


def init_and_apply(model, x, x_sl, **kwargs):
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
    out = model.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)}, **kwargs)
    return variables, out


class TestConvCoderGeometry:
    def test_level_strides_factorization(self):
        per_level, rfs, overall_rfs = ConvCoder1d.level_geometry(
            (64, 16, 16), kernel_size=5, stride_per_block=4, num_blocks=3
        )
        assert [s for s, d in per_level[0]] == [4, 4, 4]
        assert [s for s, d in per_level[1]] == [4, 4, 1]
        assert overall_rfs[-1] > rfs[0]

    def test_encoder_output_lengths(self):
        coder = ConvCoder1d(strides=(4, 2), channels=8, kernel_size=5, num_blocks=2, stride_per_block=2, channels_in=1)
        x = jnp.zeros((1, 64, 1))
        from blvm_tpu.ops.padding import get_same_padding

        # with same padding per level, lengths should be T / cumprod(strides)
        import math

        rfs = coder.receptive_fields
        pads = []
        lengths = [64]
        for l, s in enumerate((4, 2)):
            pads.append(get_same_padding(lengths[-1], kernel_size=rfs[l], stride=s))
            lengths.append(math.ceil(lengths[-1] / s))
        variables = coder.init(jax.random.PRNGKey(0), x, pad_right=pads)
        encodings = coder.apply(variables, x, pad_right=pads)
        assert encodings[0].shape[1] == 16
        assert encodings[1].shape[1] == 8

    def test_decoder_inverts_lengths(self):
        enc = ConvCoder1d(strides=(4,), channels=8, kernel_size=5, num_blocks=2, stride_per_block=2, channels_in=1)
        dec = ConvCoder1d(
            strides=(4,), channels=8, kernel_size=5, num_blocks=2, stride_per_block=2, channels_in=8,
            channels_out=8, transposed=True,
        )
        from blvm_tpu.ops.padding import get_same_padding

        T = 32
        pad = get_same_padding(T, kernel_size=enc.receptive_fields[0], stride=4)
        x = jnp.zeros((1, T, 1))
        ev = enc.init(jax.random.PRNGKey(0), x, pad_right=[pad])
        encodings = enc.apply(ev, x, pad_right=[pad])
        assert encodings[0].shape[1] == T // 4

        dv = dec.init(jax.random.PRNGKey(1), encodings[0], pad_right=[pad])
        decodings = dec.apply(dv, encodings[0], pad_right=[pad])
        assert decodings[0].shape[1] == T


class TestForward:
    def test_contract(self):
        model = make_model()
        T = 64
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, 48])
        _, (loss, mets, out) = init_and_apply(model, x, x_sl)
        assert np.isfinite(loss)
        assert len(out.z) == 2
        assert out.z[0].shape[1] == T // 4  # level 0 at stride 4
        assert out.z[1].shape[1] == T // 8  # level 1 at stride 4*2
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]), np.asarray(mets["log_prob"]) - np.asarray(mets["kld"]), rtol=1e-4
        )
        assert len(out.state_n) == 2
        assert out.state_n[0][0].shape == (2, 8)  # (B, z)
        assert out.state_n[0][1].shape == (2, 16)  # (B, h)

    def test_metric_names(self):
        model = make_model()
        T = 64
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, T)), jnp.float32)
        _, (loss, mets, _) = init_and_apply(model, x, jnp.array([T, T]))
        metrics = model.cwvae_build_metrics(jax.device_get(mets))
        names = [m.name for m in metrics]
        assert "elbo (bpt)" in names and "kl_0 (bpt)" in names and "elbo ema (bpt)" in names

    def test_state_carry_forward(self):
        model = make_model()
        T = 64
        x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T])
        variables, (loss, _, out) = init_and_apply(model, x, x_sl)
        loss2, _, _ = model.apply(
            variables, x, x_sl, state0=out.state_n, rngs={"sample": jax.random.PRNGKey(3)}
        )
        assert np.isfinite(loss2)

    def test_with_resets(self):
        """Resets on parent ticks change the computation but keep it finite;
        parameters are shared between the two settings."""
        model = make_model()
        model_r = make_model(with_resets=True)
        T = 64
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T])
        variables, (loss, _, _) = init_and_apply(model, x, x_sl)
        loss_r, _, _ = model_r.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
        assert np.isfinite(loss_r)
        assert abs(float(loss_r) - float(loss)) > 1e-7  # resets actually engage

    def test_split_sequence_geometry(self):
        model = make_model()
        x = np.zeros((1, 256), np.float32)
        x_sl = np.array([256])
        chunks, lens = model.split_sequence(x, x_sl, length=64)
        assert len(chunks) >= 2
        # chunks overlap by rf - stride, so per-chunk lengths overcount vs x_sl
        # (reference semantics); each chunk length is bounded by its static size
        for c, l in zip(chunks, lens):
            assert np.all(l <= c.shape[1])
        # the final active chunk must reach the end of the sequence
        assert np.any(lens[-1] > 0)

    def test_bf16_coders_share_params_and_match_f32(self):
        """bf16 conv coders (RSSM scans and likelihood stay f32) must accept
        the f32 param tree and stay numerically close."""
        model = make_model()
        x = jnp.asarray(np.random.default_rng(8).uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 48])
        variables, (loss32, _, _) = init_and_apply(model, x, x_sl)
        loss16, _, _ = make_model(bf16=True).apply(
            variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)}
        )
        assert np.isfinite(float(loss16))
        assert abs(float(loss16) - float(loss32)) < 0.05

    def test_forward_split_chain_with_state_carry(self):
        """Chunked eval: forward_split over split_sequence chunks, threading the
        per-level (z, h) states.

        The reference's own CWVAE forward_split CRASHES on this path
        (IndexError in its state extraction, clockwork_vae.py:288 — its
        same-padding call at :226 swaps stride/receptive-field so x_sl is never
        reduced and the per-example stop index overruns the level length).
        This is a documented fix, not a parity target.
        """
        model = make_model()
        B, T = 2, 192
        rng = np.random.default_rng(9)
        x = np.asarray(rng.uniform(-1, 1, (B, T)), np.float32)
        x_sl = np.array([192, 150])
        x[1, 150:] = 0.0

        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, jnp.asarray(x), jnp.asarray(x_sl)
        )

        chunks, lens = model.split_sequence(x, x_sl, length=80)
        assert len(chunks) >= 2
        state0 = None
        for i, (xs, xs_sl) in enumerate(zip(chunks, lens)):
            loss, _, out = model.apply(
                variables,
                jnp.asarray(xs),
                jnp.asarray(xs_sl),
                is_last_split=(i == len(chunks) - 1),
                state0=state0,
                rngs={"sample": jax.random.PRNGKey(2 + i)},
                method=CWVAEAudio.forward_split,
            )
            state0 = out.state_n
            assert np.isfinite(float(loss)), f"chunk {i}"
        for l, (z_n, h_n) in enumerate(state0):
            assert z_n.shape[0] == B and h_n.shape[0] == B


class TestGenerate:
    def test_shapes(self):
        model = make_model()
        x = jnp.zeros((1, 64))
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.array([64]))
        (x_out, x_sl), _ = model.apply(
            variables, n_samples=2, max_timesteps=32, rngs={"sample": jax.random.PRNGKey(2)},
            method=CWVAEAudio.generate,
        )
        assert x_out.shape[0] == 2
        assert x_out.shape[1] == 32


class TestTraining:
    def test_loss_decreases(self):
        model = make_model(z_size=4, h_size=8)
        rng = np.random.default_rng(4)
        base = np.sin(np.linspace(0, 12, 64)) * 0.4
        x = jnp.asarray(np.stack([base + rng.normal(scale=0.01, size=64) for _ in range(4)]), jnp.float32)
        x_sl = jnp.full((4,), 64, jnp.int32)

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
        for _ in range(20):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
