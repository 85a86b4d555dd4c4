"""Tests for the small NN building blocks: dropout variants, LSTMBlock,
gated tanh unit and convenience modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.modules.activations import GatedTanhUnit, gated_tanh_unit
from blvm_tpu.modules.convenience import AddConstant, Permute, View
from blvm_tpu.modules.dropout import TemporalDropout, WordDropout
from blvm_tpu.modules.lstm_block import LSTMBlock


class TestWordDropout:
    def test_whole_timesteps_zeroed_without_scaling(self):
        x = jnp.ones((4, 16, 8)) * 3.0
        mod = WordDropout(rate=0.5)
        y = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
        y = np.asarray(y)
        # every (b, t) row is either fully zero or fully unchanged (no 1/p scaling)
        row_means = y.mean(axis=-1)
        assert set(np.unique(np.round(row_means, 6))) <= {0.0, 3.0}
        assert (row_means == 0.0).any() and (row_means == 3.0).any()

    def test_deterministic_identity(self):
        x = jnp.ones((2, 4, 3))
        y = WordDropout(rate=0.9).apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_zero_rate_identity(self):
        x = jnp.ones((2, 4, 3))
        y = WordDropout(rate=0.0).apply({}, x, deterministic=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


class TestTemporalDropout:
    def test_mask_constant_over_time_and_inverted_scaling(self):
        rate = 0.5
        x = jnp.ones((3, 20, 16))
        mod = TemporalDropout(rate=rate)
        y = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        y = np.asarray(y)
        # each (b, d) feature column is all-zero or all-scaled over time
        for b in range(3):
            for d in range(16):
                col = y[b, :, d]
                assert np.all(col == 0.0) or np.allclose(col, 1.0 / (1.0 - rate))
        assert (y == 0.0).any() and (y > 1.0).any()


class TestLSTMBlock:
    def _x(self, B=2, T=12, D=4):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        x_sl = jnp.array([T, T - 4])
        return x, x_sl

    def test_unidirectional_shape(self):
        x, x_sl = self._x()
        mod = LSTMBlock(hidden_size=6, bidirectional=False, dropout_prob=0.0)
        variables = mod.init(jax.random.PRNGKey(0), x, x_sl)
        y, y_sl = mod.apply(variables, x, x_sl)
        assert y.shape == (2, 12, 6)
        np.testing.assert_array_equal(np.asarray(y_sl), np.asarray(x_sl))

    def test_bidirectional_concat_and_sum(self):
        x, x_sl = self._x()
        cat = LSTMBlock(hidden_size=6, bidirectional=True, dropout_prob=0.0)
        v = cat.init(jax.random.PRNGKey(0), x, x_sl)
        y_cat, _ = cat.apply(v, x, x_sl)
        assert y_cat.shape == (2, 12, 12)

        summed = LSTMBlock(hidden_size=6, bidirectional=True, sum_directions=True, dropout_prob=0.0)
        v = summed.init(jax.random.PRNGKey(0), x, x_sl)
        y_sum, _ = summed.apply(v, x, x_sl)
        assert y_sum.shape == (2, 12, 6)
        # summing the two halves of the concat output equals the summed output
        np.testing.assert_allclose(
            np.asarray(y_cat[..., :6] + y_cat[..., 6:]), np.asarray(y_sum), atol=1e-6
        )

    def test_sum_requires_bidirectional(self):
        x, x_sl = self._x()
        mod = LSTMBlock(hidden_size=4, bidirectional=False, sum_directions=True)
        with pytest.raises(ValueError):
            mod.init(jax.random.PRNGKey(0), x, x_sl)

    def test_return_all_layers(self):
        x, x_sl = self._x()
        mod = LSTMBlock(hidden_size=4, num_layers=3, bidirectional=False, dropout_prob=0.0, return_all=True)
        v = mod.init(jax.random.PRNGKey(0), x, x_sl)
        ys, _ = mod.apply(v, x, x_sl)
        assert isinstance(ys, list) and len(ys) == 3
        assert all(y.shape == (2, 12, 4) for y in ys)

    def test_dropout_train_vs_eval(self):
        x, x_sl = self._x()
        mod = LSTMBlock(hidden_size=8, bidirectional=False, dropout_prob=0.5)
        v = mod.init(jax.random.PRNGKey(0), x, x_sl)
        y_eval, _ = mod.apply(v, x, x_sl, deterministic=True)
        y_train, _ = mod.apply(v, x, x_sl, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
        # temporal dropout: a dropped feature column is zero across all of time
        cols = np.asarray(y_train) == 0.0
        assert cols.all(axis=1).any()

    def test_backward_direction_sees_reversed_content(self):
        """Changing samples beyond x_sl must not change valid bidirectional
        outputs (reversal preserves padding; recurrences are masked)."""
        x, _ = self._x()
        x_sl = jnp.array([8, 8])
        mod = LSTMBlock(hidden_size=4, bidirectional=True, dropout_prob=0.0)
        v = mod.init(jax.random.PRNGKey(0), x, x_sl)
        y1, _ = mod.apply(v, x, x_sl)
        x2 = x.at[:, 8:, :].set(99.0)
        y2, _ = mod.apply(v, x2, x_sl)
        np.testing.assert_allclose(np.asarray(y1[:, :8]), np.asarray(y2[:, :8]), atol=1e-6)


class TestGatedTanhUnit:
    def test_matches_manual(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 8)), jnp.float32)
        y = GatedTanhUnit().apply({}, x)
        a, b = np.split(np.asarray(x), 2, axis=-1)
        np.testing.assert_allclose(np.asarray(y), np.tanh(a) * (1 / (1 + np.exp(-b))), atol=1e-6)

    def test_axis(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 6, 4)), jnp.float32)
        y = gated_tanh_unit(x, axis=1)
        assert y.shape == (2, 3, 4)


class TestConvenience:
    def test_permute(self):
        x = jnp.zeros((2, 3, 5))
        y = Permute(axes=(1, 0)).apply({}, x)
        assert y.shape == (2, 5, 3)

    def test_view(self):
        x = jnp.zeros((2, 3, 4))
        y = View(shape=(12,)).apply({}, x)
        assert y.shape == (2, 12)
        y2 = View(shape=(2, 2), n_batch_dims=2).apply({}, jnp.zeros((2, 3, 4)))
        assert y2.shape == (2, 3, 2, 2)

    def test_add_constant(self):
        y = AddConstant(constant=2.5).apply({}, jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(y), 2.5)


class TestFusedBidirectional:
    """fuse_directions=True (default) must reproduce the two-scan path
    exactly: same parameter tree, same outputs, same gradients."""

    def _x(self, B=3, T=14, D=5):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        x_sl = jnp.array([T, T - 5, 1])
        return x, x_sl

    def test_same_params_and_outputs_as_two_scan_path(self):
        x, x_sl = self._x()
        fused = LSTMBlock(hidden_size=6, num_layers=2, dropout_prob=0.0, fuse_directions=True)
        plain = LSTMBlock(hidden_size=6, num_layers=2, dropout_prob=0.0, fuse_directions=False)
        v_fused = fused.init(jax.random.PRNGKey(0), x, x_sl)
        v_plain = plain.init(jax.random.PRNGKey(0), x, x_sl)
        assert jax.tree_util.tree_structure(v_fused) == jax.tree_util.tree_structure(v_plain)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), v_fused, v_plain
        )
        y_fused, _ = fused.apply(v_fused, x, x_sl)
        y_plain, _ = plain.apply(v_plain, x, x_sl)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain), rtol=1e-6, atol=1e-6)

    def test_same_gradients(self):
        x, x_sl = self._x()
        fused = LSTMBlock(hidden_size=4, dropout_prob=0.0, fuse_directions=True)
        plain = LSTMBlock(hidden_size=4, dropout_prob=0.0, fuse_directions=False)
        v = fused.init(jax.random.PRNGKey(1), x, x_sl)

        def loss(mod):
            def f(params):
                y, _ = mod.apply({"params": params}, x, x_sl)
                return (y**2).sum()

            return f

        g_fused = jax.grad(loss(fused))(v["params"])
        g_plain = jax.grad(loss(plain))(v["params"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            g_fused,
            g_plain,
        )

    def test_padding_rows_zeroed_and_sum_mode(self):
        x, x_sl = self._x()
        mod = LSTMBlock(hidden_size=4, sum_directions=True, dropout_prob=0.0)
        v = mod.init(jax.random.PRNGKey(2), x, x_sl)
        y, _ = mod.apply(v, x, x_sl)
        y = np.asarray(y)
        assert y.shape == (3, 14, 4)
        # outputs beyond each row's length are exactly zero (both directions)
        for b, sl in enumerate(np.asarray(x_sl)):
            assert np.all(y[b, sl:] == 0.0)
            assert np.any(y[b, :sl] != 0.0)
