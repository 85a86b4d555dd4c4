"""STCN tests: hierarchy shapes, top-down vs bottom-up, ELBO decomposition,
metric set, invariances and training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models.stcn import STCN


def make_model(**kwargs):
    defaults = dict(n_layers=2, latent_size=(16, 8), res_channels=16)
    defaults.update(kwargs)
    return STCN(**defaults)


def init_and_apply(model, x, x_sl, **kwargs):
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
    out = model.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)}, **kwargs)
    return variables, out


class TestForward:
    def test_contract_and_hierarchy(self):
        model = make_model()
        T = 48
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, 32])
        _, (loss, mets, out) = init_and_apply(model, x, x_sl)
        assert np.isfinite(loss)
        assert len(out.z) == 2  # one z per latent level
        assert out.z[0].shape == (2, T, 16)
        assert out.z[1].shape == (2, T, 8)
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]), np.asarray(mets["log_prob"]) - np.asarray(mets["kld"]), rtol=1e-4
        )
        # per-layer KLs sum to total
        np.testing.assert_allclose(
            np.asarray(mets["kld"]), sum(np.asarray(k) for k in mets["klds"]), rtol=1e-5
        )

    def test_metric_names(self):
        model = make_model()
        T = 48
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T])
        _, (loss, mets, out) = init_and_apply(model, x, x_sl)
        metrics = model.build_metrics(jax.device_get(mets))
        names = [m.name for m in metrics]
        assert "elbo (bpx)" in names and "kl_0 (bpz)" in names and "kl_1 (bpx)" in names

    def test_bottom_up_mc_kl(self):
        model = make_model(top_down=False, precision_posterior=False)
        T = 48
        x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T])
        _, (loss, mets, _) = init_and_apply(model, x, x_sl)
        assert np.isfinite(loss)

    def test_non_dense_decode(self):
        model = make_model(dense=False)
        T = 48
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, T)), jnp.float32)
        _, (loss, _, _) = init_and_apply(model, x, jnp.array([T, T]))
        assert np.isfinite(loss)

    def test_zero_length_row_invariant(self):
        model = make_model()
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 48)), jnp.float32)
        x_sl = jnp.array([48, 40])
        variables, (loss, mets, _) = init_and_apply(model, x, x_sl)
        x_aug = jnp.concatenate([x, jnp.zeros((1, 48))], axis=0)
        _, mets_aug, _ = model.apply(variables, x_aug, jnp.array([48, 40, 0]), rngs={"sample": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(
            np.asarray(mets["log_prob"]).sum(), np.asarray(mets_aug["log_prob"]).sum(), rtol=1e-4
        )

    def test_frame_stacking(self):
        model = make_model(n_stack_frames=4)
        T = 96
        x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (2, T)), jnp.float32)
        _, (loss, mets, out) = init_and_apply(model, x, jnp.array([T, 64]))
        assert np.isfinite(loss)
        assert out.reconstructions.shape[1] == T

    def test_no_pad_receptive_field(self):
        model = make_model()
        T = 64
        x = jnp.asarray(np.random.default_rng(6).uniform(-1, 1, (2, T)), jnp.float32)
        _, (loss, _, out) = init_and_apply(model, x, jnp.array([T, T]), pad_receptive_field=False)
        rf = 2 * (1 + 2) + 1  # dilations (1,2)*2 → RF 7 +1 causal = 8
        assert out.y.shape[1] == T - 8
        assert np.isfinite(loss)


class TestSplitEval:
    def test_chunked_forward_covers_every_frame_once(self):
        """Chunked eval (capability beyond the reference, which raises
        NotImplementedError — stcn.py:328): rf-overlap chunks, first chunk
        rf-padded. The adjusted per-chunk lengths must partition Σ x_sl —
        every waveform frame scored exactly once."""
        model = make_model()
        rf = model.receptive_field
        B = 2
        lengths = (3 * rf + 20, 2 * rf + 5)
        T = max(lengths)
        rng = np.random.default_rng(12)
        x = np.asarray(rng.uniform(-1, 1, (B, T)), np.float32)
        x[1, lengths[1]:] = 0.0
        x_sl = np.asarray(lengths, np.int32)

        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, jnp.asarray(x), jnp.asarray(x_sl)
        )
        chunks, lens = model.split_sequence(x[..., None], x_sl, length=rf + 24)
        assert len(chunks) >= 2

        total_scored = 0
        for i, (xs, sl) in enumerate(zip(chunks, lens)):
            loss, mets, _ = model.apply(
                variables,
                jnp.asarray(np.asarray(xs)),
                jnp.asarray(np.asarray(sl), jnp.int32),
                i_split=i,
                rngs={"sample": jax.random.PRNGKey(3 + i)},
                method=STCN.forward_split,
            )
            assert np.isfinite(float(loss)), f"chunk {i}"
            total_scored += int(np.asarray(mets["x_sl"]).sum())
        assert total_scored == int(x_sl.sum())

    def test_extend_mode_chunks_cover_every_frame_once(self):
        """Segment length below the receptive field forces extend-mode
        chunking (overlap >= length). Regression: extend-mode chunk lengths
        previously reported ``length`` for chunks that physically hold
        ``length + overlap`` frames, so middle chunks scored 0 frames after
        the model's rf subtraction (the reference's own extend path has the
        same defect — operations.py:188)."""
        model = make_model()
        rf = model.receptive_field
        B = 2
        lengths = (3 * rf + 2, 2 * rf + 1)
        T = max(lengths)
        rng = np.random.default_rng(13)
        x = np.asarray(rng.uniform(-1, 1, (B, T)), np.float32)
        x[1, lengths[1]:] = 0.0
        x_sl = np.asarray(lengths, np.int32)

        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, jnp.asarray(x), jnp.asarray(x_sl)
        )
        chunks, lens = model.split_sequence(x[..., None], x_sl, length=rf // 2)
        assert len(chunks) >= 3
        assert chunks[0].shape[1] < chunks[1].shape[1]  # chunk 0 is data-only

        total_scored = 0
        for i, (xs, sl) in enumerate(zip(chunks, lens)):
            loss, mets, _ = model.apply(
                variables,
                jnp.asarray(np.asarray(xs)),
                jnp.asarray(np.asarray(sl), jnp.int32),
                i_split=i,
                rngs={"sample": jax.random.PRNGKey(3 + i)},
                method=STCN.forward_split,
            )
            assert np.isfinite(float(loss)), f"chunk {i}"
            total_scored += int(np.asarray(mets["x_sl"]).sum())
        assert total_scored == int(x_sl.sum())


class TestTraining:
    def test_loss_decreases(self):
        model = make_model(n_layers=2, latent_size=(8,), res_channels=8)
        rng = np.random.default_rng(7)
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
        for _ in range(25):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestGenerate:
    """Ancestral generation — capability added over the reference (whose
    STCN.generate raises NotImplementedError, stcn.py:435-442)."""

    def test_shapes_and_finiteness(self):
        model = make_model()
        T = 48
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.full((2,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        (gen, gen_sl), _ = jax.jit(
            lambda params, key: model.apply(
                {"params": params}, n_samples=3, max_timesteps=17,
                rngs={"sample": key}, method=STCN.generate,
            )
        )(variables["params"], jax.random.PRNGKey(3))
        assert gen.shape == (3, 17)
        assert np.all(np.isfinite(np.asarray(gen)))
        assert np.all(np.asarray(gen_sl) == 17)

    def test_mode_deterministic_given_priming(self):
        """use_mode_observations still samples z from the prior but decodes
        the mode — same key, same priming => identical output."""
        model = make_model()
        T = 48
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, T)), jnp.float32)
        x_sl = jnp.full((1,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        def gen(key):
            (out, _), _ = model.apply(
                {"params": variables["params"]}, n_samples=2, max_timesteps=9,
                use_mode_observations=True, x=x,
                rngs={"sample": key}, method=STCN.generate,
            )
            return np.asarray(out)

        a, b = gen(jax.random.PRNGKey(5)), gen(jax.random.PRNGKey(5))
        np.testing.assert_array_equal(a, b)

    def test_frame_stacked_generate(self):
        model = make_model(n_stack_frames=4)
        T = 64
        x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.full((2,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        (gen, gen_sl), _ = model.apply(
            {"params": variables["params"]}, n_samples=2, max_timesteps=16,
            rngs={"sample": jax.random.PRNGKey(3)}, method=STCN.generate,
        )
        assert gen.shape == (2, 16)  # 4 columns x 4 stacked frames
        assert np.all(np.isfinite(np.asarray(gen)))

    def test_window_column_aligns_with_forward(self):
        """The generation-time conditioning column (rf-window encoder forward,
        skip_size=1) must equal the training forward's d_p column at the same
        position — for t both below and above the receptive field. This pins
        the window/padding alignment, the part a windowed rescan can silently
        get wrong."""
        model = make_model()
        rf = model.receptive_field
        n = len(model.latent_size)
        T = rf + 16
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, T, 1)), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x[:, :, 0], jnp.full((2,), T, jnp.int32),
        )
        params = variables["params"]

        def dp_full(mdl):
            """Training-path d_p columns (mirrors __call__)."""
            xp = jnp.pad(x, ((0, 0), (rf, 0), (0, 0)))
            out = mdl.causal(xp, pad_causal=False)
            skips = mdl.res_stack(out, skip_size=T + 1)
            d = skips[n - 1 :: n][:n]
            return [d_[:, :-1] for d_ in d]  # (B, T, C) each

        def win_col(mdl, window):
            """Generation-path column for one rf-window."""
            out = mdl.causal(window, pad_causal=False)
            skips = mdl.res_stack(out, skip_size=1)
            return skips[n - 1 :: n][:n]  # (B, 1, C) each

        dp = model.apply({"params": params}, method=dp_full)
        for t in (3, rf - 1, rf, rf + 7):
            hist = x[:, max(0, t - rf) : t]
            window = jnp.pad(hist, ((0, 0), (rf - hist.shape[1], 0), (0, 0)))
            cols = model.apply({"params": params}, window, method=win_col)
            for l in range(n):
                np.testing.assert_allclose(
                    np.asarray(cols[l][:, 0]), np.asarray(dp[l][:, t]), atol=1e-5,
                    err_msg=f"t={t} level={l}",
                )


class TestFastGenerate:
    """Circular-buffer fast generation must reproduce the windowed-rescan
    oracle sample for sample (same keys, same contractions per column) — the
    WaveNet fast-path discipline applied to both STCN stacks."""

    @pytest.mark.parametrize("bf16", [False, True])
    def test_fast_matches_windowed(self, bf16):
        model = make_model(bf16=bf16)
        T = 48
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.full((2,), T, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

        histories = [None, x]
        for history in histories:
            outs = {}
            for fast in (False, True):
                (out, _), _ = model.apply(
                    {"params": variables["params"]}, n_samples=2, max_timesteps=25,
                    x=history, fast=fast,
                    rngs={"sample": jax.random.PRNGKey(7)}, method=STCN.generate,
                )
                outs[fast] = np.asarray(out)
            tol = 5e-2 if bf16 else 1e-5  # bf16 gate tanh/sigmoid amplifies ulp differences
            np.testing.assert_allclose(outs[True], outs[False], atol=tol, rtol=0,
                                       err_msg=f"history={'real' if history is not None else 'zeros'}")

    def test_fast_mode_matches_windowed(self):
        model = make_model()
        T = 48
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, T)), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.full((1,), T, jnp.int32)
        )
        outs = {}
        for fast in (False, True):
            (out, _), _ = model.apply(
                {"params": variables["params"]}, n_samples=2, max_timesteps=12,
                use_mode_observations=True, x=x, fast=fast,
                rngs={"sample": jax.random.PRNGKey(5)}, method=STCN.generate,
            )
            outs[fast] = np.asarray(out)
        np.testing.assert_allclose(outs[True], outs[False], atol=1e-5, rtol=0)
