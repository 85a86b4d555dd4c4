"""WaveNet tests: output shapes, receptive field, exact-arithmetic causal conv,
and gradient-based causality (the reference's two genuinely good test ideas —
``tests/models/wavenet/test_wavenet.py:71-102`` — plus generation and loss
invariances)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models.wavenet import CausalConv1d, ResidualStack, WaveNet
from blvm_tpu.models.wavenet.modules import Conv1d


def make_model(**kwargs):
    defaults = dict(n_layers=4, n_stacks=2, res_channels=16, num_mix=2)
    defaults.update(kwargs)
    return WaveNet(**defaults)


def init_and_apply(model, x, x_sl, **kwargs):
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
    out = model.apply(variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)}, **kwargs)
    return variables, out


class TestReceptiveField:
    def test_formula(self):
        # n_layers=4, n_stacks=2, k=2: dilations [1,2,4,8]*2, RF = 1 + 2*15 = 31; +1 causal
        stack = ResidualStack(n_layers=4, n_stacks=2, res_channels=8)
        assert stack.receptive_field == 31

    def test_model_receptive_field(self):
        model = make_model()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64)),
            jnp.array([64]),
        )
        rf = model.bind(variables).receptive_field
        assert rf == 32


class TestCausalConvExact:
    def test_integer_outputs_k2(self):
        """All-ones weights, zero bias, arange input → exact sums (reference
        ``test_causal_conv.py:41-60`` technique)."""
        conv = Conv1d(features=1, kernel_size=2)
        x = jnp.arange(1, 7, dtype=jnp.float32).reshape(1, 6, 1)
        variables = conv.init(jax.random.PRNGKey(0), x)
        variables = {"params": {"kernel": jnp.ones((2, 1, 1)), "bias": jnp.zeros((1,))}}
        out = conv.apply(variables, x)
        np.testing.assert_array_equal(np.asarray(out)[0, :, 0], [3, 5, 7, 9, 11])

    def test_causal_drops_last(self):
        causal = CausalConv1d(features=1, kernel_size=1)
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1)
        variables = {"params": {"Conv1d_0": {"kernel": jnp.ones((1, 1, 1)), "bias": jnp.zeros((1,))}}}
        out = causal.apply(variables, x, pad_causal=True)
        np.testing.assert_array_equal(np.asarray(out)[0, :, 0], [0, 1, 2])


class TestForwardShapes:
    def test_output_shapes_padded(self):
        model = make_model()
        T = 64
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T // 2])
        _, (loss, mets, out) = init_and_apply(model, x, x_sl)
        assert np.isfinite(loss)
        assert mets["log_prob"].shape == (2,)
        assert out.predictions.shape == (2, T, 1)

    def test_no_pad_receptive_field(self):
        model = make_model()
        T = 64
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T])
        _, (loss, mets, out) = init_and_apply(model, x, x_sl, pad_receptive_field=False)
        assert out.y.shape[1] == T - 32  # RF removed from target
        assert np.isfinite(loss)

    def test_input_too_short_raises(self):
        model = make_model()
        x = jnp.zeros((1, 16))
        with pytest.raises(Exception):
            init_and_apply(model, x, jnp.array([16]), pad_receptive_field=False)


class TestCausalityByGradient:
    @pytest.mark.parametrize("pos", [5, 20])
    def test_grad_zero_at_and_after_position(self, pos):
        """∂(log p at position pos)/∂x[t] must be nonzero only for t < pos."""
        model = make_model(n_layers=3, n_stacks=2, res_channels=8)
        T = 40
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (1, T)), jnp.float32)
        x_sl = jnp.array([T])
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x0, x_sl)

        def pos_logprob(x):
            _, _, out = model.apply(
                variables, x, x_sl, rngs={"sample": jax.random.PRNGKey(2)},
            )
            return out.log_prob_twise[0, pos]

        g = np.asarray(jax.grad(pos_logprob)(x0))[0]
        assert np.any(g[:pos] != 0.0), "gradient should flow to strictly-earlier inputs"
        # the prediction at pos must not depend on x[pos:] except through the
        # target itself (stop_gradient'ed) — so grads at/after pos are zero
        np.testing.assert_array_equal(g[pos:], 0.0)


class TestLossInvariances:
    def test_bucket_time_padding_invariant(self):
        model = make_model()
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 50])
        variables, (loss, mets, _) = init_and_apply(model, x, x_sl)

        x_pad = jnp.pad(x, ((0, 0), (0, 32)))
        loss_pad, mets_pad, _ = model.apply(variables, x_pad, x_sl, rngs={"sample": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(np.asarray(mets["log_prob"]), np.asarray(mets_pad["log_prob"]), atol=1e-4)
        np.testing.assert_allclose(loss, loss_pad, rtol=1e-5)

    def test_zero_length_row_invariant(self):
        model = make_model()
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64)), jnp.float32)
        x_sl = jnp.array([64, 50])
        variables, (loss, mets, _) = init_and_apply(model, x, x_sl)

        x_aug = jnp.concatenate([x, jnp.zeros((1, 64))], axis=0)
        x_sl_aug = jnp.array([64, 50, 0])
        _, mets_aug, _ = model.apply(variables, x_aug, x_sl_aug, rngs={"sample": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(
            np.asarray(mets["log_prob"]).sum(), np.asarray(mets_aug["log_prob"]).sum(), rtol=1e-5
        )


class TestFrameStacking:
    def test_stacked_shapes(self):
        model = make_model(n_stack_frames=4)
        T = 128
        x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (2, T)), jnp.float32)
        x_sl = jnp.array([T, T - 20])
        _, (loss, mets, out) = init_and_apply(model, x, x_sl)
        assert np.isfinite(loss)
        assert out.predictions.shape[1] == T


class TestChunkedEval:
    @staticmethod
    def _chunk_and_score(model, x, x_sl, length):
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, jnp.asarray(x), jnp.asarray(x_sl)
        )
        chunks, lens = model.split_sequence(x, x_sl, length=length)  # (B, T) like the drivers
        total = 0
        for i, (xs, sl) in enumerate(zip(chunks, lens)):
            loss, mets, _ = model.apply(
                variables,
                jnp.asarray(np.asarray(xs)),
                jnp.asarray(np.asarray(sl), jnp.int32),
                i_split=i,
                rngs={"sample": jax.random.PRNGKey(3 + i)},
                method=WaveNet.forward_split,
            )
            assert np.isfinite(float(loss)), f"chunk {i}"
            total += int(np.asarray(mets["x_sl"]).sum())
        return len(chunks), total

    def test_frame_stacked_chunks_cover_every_sample_once(self):
        """Regression: the unpadded path subtracted only rf from the
        sample-domain x_sl instead of rf * n_stack_frames, over-counting
        rf*(s-1) samples per non-first chunk."""
        model = make_model(n_stack_frames=4)
        rf_samples = model.receptive_field * 4
        lengths = (3 * rf_samples + 8, 2 * rf_samples + 4)
        T = max(lengths)
        rng = np.random.default_rng(21)
        x = np.asarray(rng.uniform(-1, 1, (2, T)), np.float32)
        x[1, lengths[1]:] = 0.0
        x_sl = np.asarray(lengths, np.int32)
        n_chunks, total = self._chunk_and_score(model, x, x_sl, length=rf_samples + 16)
        assert n_chunks >= 2
        assert total == int(x_sl.sum())

    def test_extend_mode_chunks_cover_every_sample_once(self):
        """length < rf forces extend mode; every sample scored exactly once."""
        model = make_model()
        rf = model.receptive_field
        lengths = (3 * rf + 2, 2 * rf + 1)
        T = max(lengths)
        rng = np.random.default_rng(22)
        x = np.asarray(rng.uniform(-1, 1, (2, T)), np.float32)
        x[1, lengths[1]:] = 0.0
        x_sl = np.asarray(lengths, np.int32)
        n_chunks, total = self._chunk_and_score(model, x, x_sl, length=rf // 2)
        assert n_chunks >= 3
        assert total == int(x_sl.sum())

    @pytest.mark.parametrize("mode_length", ["consume", "extend"])
    def test_chunked_log_prob_equals_full_forward(self, mode_length):
        """Chunked eval must reproduce the full forward's Σ log-prob EXACTLY
        (deterministic likelihood; rf-overlap context is complete in both
        chunking modes)."""
        model = make_model()
        rf = model.receptive_field
        lengths = (3 * rf + 20, 2 * rf + 5)
        T = max(lengths)
        rng = np.random.default_rng(23)
        x = np.asarray(rng.uniform(-1, 1, (2, T)), np.float32)
        x[1, lengths[1]:] = 0.0
        x_sl = np.asarray(lengths, np.int32)

        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, jnp.asarray(x), jnp.asarray(x_sl)
        )
        _, mets_full, _ = model.apply(
            variables, jnp.asarray(x), jnp.asarray(x_sl), rngs={"sample": jax.random.PRNGKey(2)}
        )
        full_lp = float(np.asarray(mets_full["log_prob"]).sum())

        length = rf + 24 if mode_length == "consume" else rf // 2
        chunks, lens = model.split_sequence(x, x_sl, length=length)
        total_lp = 0.0
        for i, (xs, sl) in enumerate(zip(chunks, lens)):
            _, mets, _ = model.apply(
                variables,
                jnp.asarray(np.asarray(xs)),
                jnp.asarray(np.asarray(sl), jnp.int32),
                i_split=i,
                rngs={"sample": jax.random.PRNGKey(3)},
                method=WaveNet.forward_split,
            )
            total_lp += float(np.asarray(mets["log_prob"]).sum())
        np.testing.assert_allclose(total_lp, full_lp, rtol=1e-6, atol=1e-3)


class TestGenerate:
    def test_generate_shapes_and_range(self):
        model = make_model()
        x = jnp.zeros((1, 64))
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.array([64]))
        samples = model.apply(
            variables, n_samples=2, n_frames=20, rngs={"sample": jax.random.PRNGKey(3)}, method=WaveNet.generate
        )
        assert samples.shape == (2, 20)
        assert float(jnp.max(jnp.abs(samples))) <= 1.0

    @pytest.mark.parametrize("bf16", [False, True])
    def test_fast_matches_naive(self, bf16):
        """Fast-WaveNet circular-buffer generation must reproduce the windowed
        scan sample-for-sample (same keys, same contractions per column)."""
        model = make_model(n_layers=3, n_stacks=2, bf16=bf16)
        x = jnp.zeros((1, 64))
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.array([64]))
        # history both zero (default) and a real waveform prefix
        rng = np.random.default_rng(0)
        histories = [None, jnp.asarray(rng.uniform(-1, 1, (2, model.receptive_field, 1)), jnp.float32)]
        for history in histories:
            outs = {}
            for fast in (False, True):
                outs[fast] = model.apply(
                    variables,
                    n_samples=2,
                    n_frames=40,
                    x=history,
                    fast=fast,
                    rngs={"sample": jax.random.PRNGKey(3)},
                    method=WaveNet.generate,
                )
            tol = 5e-2 if bf16 else 1e-5  # bf16 gate tanh/sigmoid amplifies ulp differences
            np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]), atol=tol, rtol=0)

    def test_fast_matches_naive_embedding(self):
        model = make_model(n_layers=3, n_stacks=1, embedding_dim=12, num_bins=17, likelihood="categorical")
        x = jnp.zeros((1, 64), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.array([64]))
        outs = {}
        for fast in (False, True):
            outs[fast] = model.apply(
                variables,
                n_samples=2,
                n_frames=40,
                fast=fast,
                rngs={"sample": jax.random.PRNGKey(3)},
                method=WaveNet.generate,
            )
        # categorical samples are discrete — any numeric drift would flip bins
        np.testing.assert_array_equal(np.asarray(outs[True]), np.asarray(outs[False]))


class TestSkipMask:
    """``ResidualStack(skip_mask=...)`` — dead-skip elimination used by STCN
    (only every n-th skip feeds ``STCN.infer``, ``stcn.py:187``)."""

    def test_masked_blocks_return_none_and_rest_match_exactly(self):
        stack = ResidualStack(n_layers=2, n_stacks=2, res_channels=8)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 8)), jnp.float32)
        v = stack.init(jax.random.PRNGKey(0), x, skip_size=32)
        full = stack.apply(v, x, skip_size=32)
        mask = [False, True, False, True]
        masked = stack.apply(v, x, skip_size=32, skip_mask=mask)
        assert len(masked) == len(full) == 4
        for keep, s_full, s_masked in zip(mask, full, masked):
            if keep:
                # column-sliced dot == slicing the full dot's output, bitwise
                np.testing.assert_array_equal(np.asarray(s_masked), np.asarray(s_full))
            else:
                assert s_masked is None

    def test_param_structure_unchanged(self):
        stack = ResidualStack(n_layers=2, n_stacks=1, res_channels=8)
        x = jnp.zeros((1, 40, 8), jnp.float32)
        v_full = stack.init(jax.random.PRNGKey(0), x, skip_size=16)
        v_masked = stack.init(jax.random.PRNGKey(0), x, skip_size=16, skip_mask=[False, False])
        assert jax.tree_util.tree_structure(v_full) == jax.tree_util.tree_structure(v_masked)
        chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), v_full, v_masked))
        assert chex_equal

    def test_masked_grads_equal_full_grads(self):
        """Loss that ignores the dead skips must produce identical gradients
        with and without the mask (the dead columns had zero grad anyway)."""
        stack = ResidualStack(n_layers=2, n_stacks=1, res_channels=8)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 48, 8)), jnp.float32)
        v = stack.init(jax.random.PRNGKey(0), x, skip_size=16)

        def loss_full(params):
            skips = stack.apply({"params": params}, x, skip_size=16)
            return (skips[1] ** 2).sum()  # uses only block 1's skip

        def loss_masked(params):
            skips = stack.apply({"params": params}, x, skip_size=16, skip_mask=[False, True])
            return (skips[1] ** 2).sum()

        g_full = jax.grad(loss_full)(v["params"])
        g_masked = jax.grad(loss_masked)(v["params"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), g_full, g_masked
        )
