"""Tests for sequence ops: masks, stacking, reversal, chunking, Welford."""

import jax.numpy as jnp
import numpy as np
import pytest

from blvm_tpu.ops import (
    reverse_sequences,
    sequence_mask,
    split_sequence,
    stack_tensor,
    unstack_tensor,
    update_running_variance,
)
from blvm_tpu.ops.sequence import split_sequence_static


class TestSequenceMask:
    def test_basic(self):
        mask = sequence_mask(np.array([1, 3, 0]), max_len=4)
        expected = np.array([[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0]], dtype=bool)
        np.testing.assert_array_equal(mask, expected)

    def test_stride(self):
        mask = sequence_mask(np.array([4, 5]), max_len=3, stride=2)
        expected = np.array([[1, 1, 0], [1, 1, 1]], dtype=bool)
        np.testing.assert_array_equal(mask, expected)

    def test_max_len_inferred(self):
        mask = sequence_mask(np.array([2, 4]))
        assert mask.shape == (2, 4)

    def test_dtype(self):
        mask = sequence_mask(np.array([1]), max_len=2, dtype=jnp.float32)
        assert mask.dtype == jnp.float32


class TestStackTensor:
    def test_exact_multiple(self):
        x = jnp.arange(12).reshape(2, 6)
        stacked, padding = stack_tensor(x, 3)
        assert padding == 0
        assert stacked.shape == (2, 2, 3)
        np.testing.assert_array_equal(stacked[0, 0], [0, 1, 2])
        np.testing.assert_array_equal(stacked[1, 1], [9, 10, 11])

    def test_with_padding(self):
        x = jnp.arange(5)
        stacked, padding = stack_tensor(x, 3)
        assert padding == 1
        assert stacked.shape == (2, 3)
        np.testing.assert_array_equal(stacked[1], [3, 4, 0])

    def test_roundtrip(self):
        x = jnp.arange(14).reshape(2, 7).astype(jnp.float32)
        stacked, padding = stack_tensor(x, 4, axis=-1)
        back = unstack_tensor(stacked, 4, padding, axis=-1)
        np.testing.assert_array_equal(back, x)

    def test_middle_axis(self):
        x = jnp.arange(24).reshape(2, 6, 2)
        stacked, padding = stack_tensor(x, 3, axis=1)
        assert padding == 0
        assert stacked.shape == (2, 2, 2, 3)
        back = unstack_tensor(stacked, 3, padding, axis=1)
        np.testing.assert_array_equal(back, x)


class TestReverseSequences:
    def test_preserves_padding(self):
        x = np.array([[1, 2, 3, 0, 0], [1, 2, 3, 4, 5]], dtype=np.float32)
        x_sl = np.array([3, 5])
        got = reverse_sequences(x, x_sl)
        expected = np.array([[3, 2, 1, 0, 0], [5, 4, 3, 2, 1]], dtype=np.float32)
        np.testing.assert_array_equal(got, expected)

    def test_feature_dims(self):
        x = np.arange(12).reshape(1, 3, 4).astype(np.float32)
        got = reverse_sequences(x, np.array([3]))
        np.testing.assert_array_equal(got[0, 0], x[0, 2])
        np.testing.assert_array_equal(got[0, 2], x[0, 0])

    def test_double_reverse_is_identity(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 9, 2)).astype(np.float32)
        x_sl = np.array([9, 4, 7])
        # zero the padding so identity holds exactly
        for i, sl in enumerate(x_sl):
            x[i, sl:] = 0
        got = reverse_sequences(reverse_sequences(x, x_sl), x_sl)
        np.testing.assert_array_equal(got, x)


class TestSplitSequence:
    def test_consume_mode_geometry(self):
        x = np.arange(20).reshape(1, 20)
        chunks, lens = split_sequence(x, np.array([20]), length=8, overlap=3, mode="consume")
        # starts: 0, 5, 10, 15 — each chunk length 8
        assert all(c.shape[1] == 8 for c in chunks)
        np.testing.assert_array_equal(chunks[0][0], np.arange(0, 8))
        np.testing.assert_array_equal(chunks[1][0, :3], np.arange(5, 8))  # overlap region

    def test_extend_mode_geometry(self):
        x = np.arange(20).reshape(1, 20)
        chunks, lens = split_sequence(x, np.array([20]), length=8, overlap=3, mode="extend")
        assert chunks[0].shape[1] == 8  # first chunk start clamped to 0
        assert chunks[1].shape[1] == 11

    def test_lengths_cover_sequence(self):
        x = np.zeros((3, 25))
        x_sl = np.array([25, 10, 17])
        chunks, lens = split_sequence(x, x_sl, length=8, mode="consume")
        total = np.sum(np.stack(lens), axis=0)
        np.testing.assert_array_equal(total, x_sl)

    def test_consume_rejects_large_overlap(self):
        with pytest.raises(ValueError):
            split_sequence(np.zeros((1, 10)), np.array([10]), length=4, overlap=4)

    def test_static_matches_host(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 23)).astype(np.float32)
        x_sl = np.array([23, 11])
        chunks, lens = split_sequence(x, x_sl, length=6)
        s_chunks, s_lens = split_sequence_static(jnp.asarray(x), jnp.asarray(x_sl), length=6)
        for i, (c, l) in enumerate(zip(chunks, lens)):
            np.testing.assert_allclose(s_chunks[i], c)
            np.testing.assert_array_equal(s_lens[i], l)

    def test_extend_mode_new_frames_partition(self):
        """Extend mode (overlap >= length): once each chunk's overlap-sized
        context is subtracted (the pad_receptive_field=False convention), the
        per-chunk NEW frames partition Σ x_sl exactly. Chunk 0 is data-only
        (no context to subtract); later chunks are left-padded to uniform
        length + overlap with the pad counted in their lengths."""
        x = np.arange(2 * 40, dtype=np.float32).reshape(2, 40)
        x_sl = np.array([40, 23])
        length, overlap = 6, 14
        chunks, lens = split_sequence(x, x_sl, length=length, overlap=overlap, mode="extend")
        assert chunks[0].shape[1] == length
        assert all(c.shape[1] == length + overlap for c in chunks[1:])
        new_frames = np.sum(np.stack([np.maximum(l - (overlap if i else 0), 0) for i, l in enumerate(lens)]), axis=0)
        np.testing.assert_array_equal(new_frames, x_sl)

    def test_static_extend_uniform_contract(self):
        """Static form: ALL chunks (incl. the first) are left-padded to the
        uniform length + overlap and every chunk length includes its context,
        so a scan body subtracting overlap scores each frame exactly once."""
        x = np.arange(2 * 40, dtype=np.float32).reshape(2, 40)
        x_sl = np.array([40, 23])
        length, overlap = 6, 14
        s_chunks, s_lens = split_sequence_static(
            jnp.asarray(x), jnp.asarray(x_sl), length=length, overlap=overlap, mode="extend"
        )
        assert s_chunks.shape[2] == length + overlap
        new_frames = np.sum(np.maximum(np.asarray(s_lens) - overlap, 0), axis=0)
        np.testing.assert_array_equal(new_frames, x_sl)


class TestWelford:
    def test_matches_numpy_var(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=1000)
        b = rng.normal(loc=2.0, size=500)
        var, mean, weight, M2 = update_running_variance(
            a.mean(), a.size, np.sum((a - a.mean()) ** 2), b.mean(), b.size, np.sum((b - b.mean()) ** 2)
        )
        full = np.concatenate([a, b])
        np.testing.assert_allclose(mean, full.mean(), rtol=1e-10)
        np.testing.assert_allclose(var, full.var(ddof=1), rtol=1e-10)
