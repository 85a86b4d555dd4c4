"""Tests for batchers (incl. shape bucketing) and length-bucketed samplers."""

import numpy as np
import pytest

from blvm_tpu.data import (
    BucketSpec,
    DynamicTensorBatcher,
    LengthEvalSampler,
    LengthTrainSampler,
    ListBatcher,
    TensorBatcher,
    TextBatcher,
)
from blvm_tpu.data.samplers import parse_max_len


class TestTextBatcher:
    def test_pads_to_max(self):
        batch, sl = TextBatcher()([[1, 2, 3], [4]])
        np.testing.assert_array_equal(batch, [[1, 2, 3], [4, 0, 0]])
        np.testing.assert_array_equal(sl, [3, 1])

    def test_bucketed_padding(self):
        batch, sl = TextBatcher(bucket=BucketSpec(mode="multiple", multiple=8))([[1, 2, 3], [4]])
        assert batch.shape == (2, 8)


class TestDynamicTensorBatcher:
    def test_pads_time_axis(self):
        b = DynamicTensorBatcher(axis=-1)
        batch, sl = b([np.ones(5), np.ones(3)])
        assert batch.shape == (2, 5)
        np.testing.assert_array_equal(sl, [5, 3])
        assert batch[1, 3] == 0 and batch[1, 4] == 0

    def test_multidim_middle_axis(self):
        b = DynamicTensorBatcher(axis=0)
        batch, sl = b([np.ones((5, 2)), np.ones((3, 2))])
        assert batch.shape == (2, 5, 2)
        np.testing.assert_array_equal(sl, [5, 3])
        assert np.all(batch[1, 3:] == 0)

    def test_time_bucket_bounds_shapes(self):
        b = DynamicTensorBatcher(axis=-1, bucket=BucketSpec(mode="multiple", multiple=16))
        batch, sl = b([np.ones(5), np.ones(3)])
        assert batch.shape == (2, 16)
        np.testing.assert_array_equal(sl, [5, 3])

    def test_batch_size_bucket_adds_masked_rows(self):
        b = DynamicTensorBatcher(
            axis=-1,
            bucket=BucketSpec(mode="multiple", multiple=8),
            batch_size_bucket=BucketSpec(mode="pow2", base=4),
        )
        batch, sl = b([np.ones(5), np.ones(3), np.ones(2)])
        assert batch.shape == (4, 8)
        np.testing.assert_array_equal(sl, [5, 3, 2, 0])  # padded row has length 0

    def test_sort_desc(self):
        b = DynamicTensorBatcher(axis=-1)
        batch = [(np.ones(2), None), (np.ones(5), None), (np.ones(3), None)]
        out = b.sort(batch)
        assert [len(x[0]) for x in out] == [5, 3, 2]


class TestListAndTensorBatcher:
    def test_list(self):
        items, sl = ListBatcher()([np.ones(4), np.ones(2)])
        assert len(items) == 2
        np.testing.assert_array_equal(sl, [4, 2])

    def test_tensor(self):
        batch, sl = TensorBatcher()([np.ones((1, 3)), np.ones((1, 3))])
        assert batch.shape == (2, 3)


class TestParseMaxLen:
    def test_numeric(self):
        assert parse_max_len(100, [10, 50]) == 100

    def test_rejects_too_small(self):
        with pytest.raises(ValueError):
            parse_max_len(40, [10, 50])

    def test_max_string(self):
        assert parse_max_len("max", [10, 50]) == 50
        assert parse_max_len("4max", [10, 50]) == 200


class TestLengthTrainSampler:
    def _lengths(self, n=200, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(100, 2000, size=n).tolist()

    def test_all_examples_used_when_not_dropping(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_len=4000, min_pool_size=16, drop_last=False, seed=0)
        seen = sorted(i for batch in s.batches for i in batch)
        assert seen == list(range(len(lengths)))

    def test_batch_len_respected(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_len=4000, min_pool_size=16, seed=0)
        for batch in s.batches:
            assert sum(lengths[i] for i in batch) <= 4000

    def test_longest_first(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_len=4000, min_pool_size=16, longest_first=True, seed=0)
        batch_maxes = [max(lengths[i] for i in b) for b in s.batches]
        assert batch_maxes[0] == max(batch_maxes)

    def test_resample_on_iter(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_len=4000, min_pool_size=16, seed=0)
        first = [list(b) for b in s]
        second = [list(b) for b in s]
        assert first != second  # resampled between epochs

    def test_pools_have_min_size(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_len=4000, min_pool_size=32, seed=0)
        for pool in s.pools[:-1]:
            assert len(pool) >= 32

    def test_num_batches_buffered(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_len=4000, min_pool_size=16, num_batches=5, seed=0)
        assert len(s.batches) == 5

    def test_batch_size_mode(self):
        lengths = self._lengths()
        s = LengthTrainSampler(lengths, batch_size=16, min_pool_size=16, drop_last=False, seed=0)
        seen = sorted(i for b in s.batches for i in b)
        assert seen == list(range(len(lengths)))
        # all full batches except one remainder (longest_first may reorder)
        sizes = sorted(len(b) for b in s.batches)
        assert sizes[1:] == [16] * (len(sizes) - 1) and sizes[0] == len(lengths) % 16

    def test_batch_size_drop_last(self):
        lengths = self._lengths(n=100)
        s = LengthTrainSampler(lengths, batch_size=16, min_pool_size=16, drop_last=True, seed=0)
        assert all(len(b) == 16 for b in s.batches)


class TestLengthEvalSampler:
    def test_deterministic_and_complete(self):
        lengths = [100, 500, 300, 200, 400]
        s = LengthEvalSampler(lengths, batch_len=600, longest_first=False)
        seen = sorted(i for b in s.batches for i in b)
        assert seen == list(range(5))
        s2 = LengthEvalSampler(lengths, batch_len=600, longest_first=False)
        assert s.batches == s2.batches

    def test_batch_size_mode(self):
        lengths = [100, 500, 300, 200, 400]
        s = LengthEvalSampler(lengths, batch_size=2, longest_first=False)
        assert [len(b) for b in s.batches] == [2, 2, 1]

    def test_longest_first_reverses(self):
        lengths = [100, 500, 300]
        s = LengthEvalSampler(lengths, batch_size=1, longest_first=True)
        assert s.batches[0] == [1]  # index of the longest


class TestReferenceSamplerStreamParity:
    """The convergence parity harness relies on batch-PLAN identity between the
    two frameworks: the reference samplers draw from python's GLOBAL random
    (``length_samplers.py:149,166``), ours from an explicit RNG. With
    ``seed=random.Random(s)`` shared across samplers in construction order
    (``--sampler_shared_rng``), the call sequences are identical — so the batch
    sequences must match the reference exactly, across epochs, including the
    eval samplers' interleaved consumption of the stream."""

    def _reference(self):
        from tests.parity import reference_loader

        try:
            reference_loader.load_reference()
        except ImportError:
            pytest.skip("reference checkout unavailable")
        import blvm.data.samplers.length_samplers as ref_ls

        return ref_ls

    def test_train_sampler_matches_reference_stream(self):
        import random

        ref_ls = self._reference()
        rng = np.random.default_rng(7)
        # distinct lengths: the reference argsort is non-stable, ours stable —
        # ties would permute pools (real datasets: sample lengths collide
        # rarely; the harness dataset is built with all-distinct lengths)
        lengths = (rng.permutation(96) * 37 + 1600).tolist()

        seed = 123
        random.seed(seed)  # the reference's set_seed path (utils/rand.py:12)
        ref = ref_ls.LengthTrainSampler(
            source=list(lengths), field=None, batch_len=16000, max_pool_difference=300, min_pool_size=8
        )
        ours = LengthTrainSampler(
            source=list(lengths),
            batch_len=16000,
            max_pool_difference=300,
            min_pool_size=8,
            seed=random.Random(seed),
        )
        for epoch in range(4):
            assert [list(map(int, b)) for b in ref.batches] == ours.batches, f"epoch {epoch}"
            assert list(iter(ref)) is not None and list(iter(ours)) is not None  # triggers resample

    def test_interleaved_train_eval_stream(self):
        """Construction order train→eval, then per-epoch train resample with
        eval resamples interleaved at 'eval epochs' — the exact global-random
        consumption pattern of a reference driver run."""
        import random

        ref_ls = self._reference()
        rng = np.random.default_rng(11)
        train_lens = (rng.permutation(64) * 53 + 2000).tolist()
        eval_lens = (rng.permutation(24) * 41 + 1700).tolist()

        seed = 5
        random.seed(seed)
        ref_train = ref_ls.LengthTrainSampler(
            source=list(train_lens), field=None, batch_len=16000, max_pool_difference=500, min_pool_size=8
        )
        ref_eval = ref_ls.LengthEvalSampler(source=list(eval_lens), field=None, batch_len=8000, shuffle=True)

        shared = random.Random(seed)
        our_train = LengthTrainSampler(
            source=list(train_lens), batch_len=16000, max_pool_difference=500, min_pool_size=8, seed=shared
        )
        our_eval = LengthEvalSampler(source=list(eval_lens), batch_len=8000, shuffle=True, seed=shared)

        for epoch in range(1, 7):
            assert [list(map(int, b)) for b in ref_train.batches] == our_train.batches, f"train epoch {epoch}"
            list(iter(ref_train)), list(iter(our_train))
            if epoch % 2 == 0:  # eval every 2 epochs
                assert [list(map(int, b)) for b in ref_eval.batches] == our_eval.batches, f"eval epoch {epoch}"
                list(iter(ref_eval)), list(iter(our_eval))
