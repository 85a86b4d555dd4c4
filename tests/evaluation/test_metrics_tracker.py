"""Tests for the metric system (exact weighted running means) and the tracker."""

import math

import numpy as np
import pytest

from blvm_tpu.evaluation import (
    BitsPerDimMetric,
    EMAMetric,
    ErrorRateMetric,
    KLMetric,
    LatestMeanMetric,
    LLMetric,
    LossMetric,
    PerplexityMetric,
    RunningAccuracyMetric,
    RunningMeanMetric,
    RunningVarianceMetric,
    Tracker,
)
from blvm_tpu.data.tokenizers import char_tokenizer, word_tokenizer
from blvm_tpu.evaluation.metrics import edit_distance


class TestRunningMean:
    def test_exact_weighted_mean_order_independent(self):
        """Epoch aggregate equals the exact weighted mean regardless of merge order."""
        rng = np.random.default_rng(0)
        chunks = [rng.normal(size=rng.integers(2, 20)) for _ in range(10)]
        expected = np.concatenate(chunks).mean()

        m = RunningMeanMetric(chunks[0], name="x")
        for c in chunks[1:]:
            m.update(RunningMeanMetric(c, name="x"))
        np.testing.assert_allclose(m.value, expected, rtol=1e-12)

        # reversed order gives the identical value
        m2 = RunningMeanMetric(chunks[-1], name="x")
        for c in reversed(chunks[:-1]):
            m2.update(RunningMeanMetric(c, name="x"))
        np.testing.assert_allclose(m2.value, expected, rtol=1e-12)

    def test_reduce_by_and_weight_by(self):
        # values summed / reduce_by; merged with weight_by
        a = RunningMeanMetric(np.array([10.0, 20.0]), name="x", reduce_by=10)
        assert a.value == 3.0
        b = RunningMeanMetric(np.array([40.0]), name="x", reduce_by=10)
        a.update(b)
        np.testing.assert_allclose(a.value, (30 + 40) / 20)

    def test_scalar_values(self):
        m = RunningMeanMetric(5.0, name="x", weight_by=2)
        m.update(RunningMeanMetric(7.0, name="x", weight_by=2))
        assert m.value == 6.0


class TestBitsPerDim:
    def test_bits_per_frame_semantics(self):
        """-LL/ln2 summed over examples / Σ x_sl = bits per frame."""
        ll = np.array([-100.0, -200.0])  # nats per example
        x_sl = np.array([50, 150])
        m = BitsPerDimMetric(ll, reduce_by=x_sl)
        expected = (100 + 200) / math.log(2) / 200
        np.testing.assert_allclose(m.value, expected, rtol=1e-9)

    def test_merge_matches_full_batch(self):
        ll = np.array([-10.0, -30.0, -25.0])
        x_sl = np.array([5, 12, 9])
        full = BitsPerDimMetric(ll, reduce_by=x_sl)
        a = BitsPerDimMetric(ll[:2], reduce_by=x_sl[:2])
        a.update(BitsPerDimMetric(ll[2:], reduce_by=x_sl[2:]))
        np.testing.assert_allclose(a.value, full.value, rtol=1e-10)


class TestPerplexity:
    def test_two_power_mean(self):
        m = PerplexityMetric(np.array([-math.log(2) * 3]), reduce_by=1)
        np.testing.assert_allclose(m.value, 8.0, rtol=1e-6)


class TestVarianceMetric:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        a, b = rng.normal(size=100), rng.normal(loc=1, size=60)
        m = RunningVarianceMetric(a, name="v")
        m.update(RunningVarianceMetric(b, name="v"))
        np.testing.assert_allclose(m.value, np.concatenate([a, b]).var(ddof=1), rtol=1e-8)


class TestErrorRate:
    def test_edit_distance(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance([], [1, 2]) == 2
        assert edit_distance("abc", "abc") == 0

    def test_wer_accumulates(self):
        m = ErrorRateMetric(["a b c"], ["a b d"], word_tokenizer, name="wer")
        np.testing.assert_allclose(m.value, 1 / 3)
        m.update(ErrorRateMetric(["x y z"], ["x y z"], word_tokenizer, name="wer"))
        np.testing.assert_allclose(m.value, 1 / 6)

    def test_cer(self):
        m = ErrorRateMetric(["abc"], ["axc"], char_tokenizer, name="cer")
        np.testing.assert_allclose(m.value, 1 / 3)


class TestOtherMetrics:
    def test_accuracy(self):
        m = RunningAccuracyMetric(np.array([1, 2, 3]), np.array([1, 2, 0]))
        np.testing.assert_allclose(m.value, 2 / 3)
        m.update(RunningAccuracyMetric(np.array([5]), np.array([5])))
        np.testing.assert_allclose(m.value, 3 / 4)

    def test_latest_mean(self):
        m = LatestMeanMetric(2.0, name="beta")
        m.update(LatestMeanMetric(5.0, name="beta"))
        assert m.value == 5.0

    def test_tags(self):
        assert "losses" in LossMetric(1.0).tags
        assert "log_likelihoods" in LLMetric(1.0).tags
        assert "kl_divergences" in KLMetric(1.0).tags

    def test_get_best_direction(self):
        losses = [LossMetric(v) for v in (3.0, 1.0, 2.0)]
        assert losses[0].get_best(losses).value == 1.0
        lls = [LLMetric(v) for v in (-3.0, -1.0, -2.0)]
        assert lls[0].get_best(lls).value == -1.0


class TestTracker:
    def _run_epoch(self, tracker, source, values):
        for v in tracker.steps(values, source=source):
            tracker.update([LossMetric(v)])

    def test_accumulates_and_bests(self, capsys):
        tracker = Tracker(print_every=None)
        for epoch in tracker.epochs(3):
            self._run_epoch(tracker, "train", [float(epoch)] * 2)
            self._run_epoch(tracker, "test", [4.0 - epoch])
            tracker.log()

        accs = tracker.accumulated_values
        assert accs["train"]["loss"] == [1.0, 2.0, 3.0]
        assert accs["test"]["loss"] == [3.0, 2.0, 1.0]
        assert tracker.best_values["test"]["best_loss"] == 1.0

    def test_before_unset_runs_on_consumer_break(self, capsys):
        """before_unset (the deferred-metric flush point) must run even when
        the CONSUMER breaks out of the steps() loop — otherwise up to lag
        steps of metrics would silently vanish from the epoch aggregate."""
        tracker = Tracker(print_every=None)
        flushed = []
        for epoch in tracker.epochs(1):
            for i, v in enumerate(tracker.steps([1.0, 2.0, 3.0], source="train", before_unset=lambda: flushed.append(True))):
                tracker.update([LossMetric(v)])
                if i == 1:
                    break
        assert flushed == [True]
        assert tracker.source is None  # unset also ran

    def test_before_unset_runs_on_exception(self, capsys):
        tracker = Tracker(print_every=None)
        flushed = []
        tracker.epoch = 1
        with pytest.raises(RuntimeError):
            for v in tracker.steps([1.0, 2.0], source="train", before_unset=lambda: flushed.append(True)):
                raise RuntimeError("boom")
        assert flushed == [True]
        assert tracker.source is None

    def test_jsonl_sink(self, tmp_path, capsys):
        import json

        path = tmp_path / "m.jsonl"
        tracker = Tracker(print_every=None, jsonl_path=str(path))
        for epoch in tracker.epochs(2):
            self._run_epoch(tracker, "train", [1.0, 3.0])
            tracker.log(learning_rate=0.1)
        lines = [json.loads(l) for l in path.read_text().splitlines()]
        assert len(lines) == 2
        assert lines[0]["train"]["loss"] == 2.0  # exact mean of the step losses
        assert lines[0]["learning_rate"] == 0.1

    def test_unique_name_check(self, capsys):
        tracker = Tracker(print_every=None)
        tracker.set("s")
        with pytest.raises(AssertionError):
            tracker.update([LossMetric(1.0), LossMetric(2.0)])

    def test_debug_break(self, capsys):
        tracker = Tracker(print_every=None, debug_epoch_break_steps=2)
        seen = sum(1 for _ in tracker.steps(range(100), source="s"))
        assert seen == 2

    def test_host_telemetry_logged(self, tmp_path, capsys):
        """Epoch logs carry process CPU%% (and, on Linux, host iowait%%)."""
        import json
        import time

        path = tmp_path / "m.jsonl"
        tracker = Tracker(print_every=None, jsonl_path=str(path))
        for _ in tracker.epochs(1):
            for _ in tracker.steps(range(3), source="train"):
                t0 = time.process_time()
                while time.process_time() - t0 < 0.01:  # burn a little CPU
                    pass
                tracker.update([LossMetric(1.0)])
            tracker.log()

        line = json.loads(path.read_text().splitlines()[0])
        assert "process_cpu_percent" in line["train"]
        assert line["train"]["process_cpu_percent"] > 0.0
        # iowait is only available on Linux /proc; don't require it elsewhere
        if "host_iowait_percent" in line["train"]:
            assert 0.0 <= line["train"]["host_iowait_percent"] <= 100.0


class TestDropPaddedRows:
    def test_filters_per_example_leaves(self):
        from blvm_tpu.evaluation.metrics import drop_padded_rows

        mets = {
            "loss": 1.5,
            "x_sl": np.array([100, 80, 0, 0]),
            "elbo": np.array([-10.0, -8.0, 0.0, 0.0]),
            "klds": np.zeros((5, 4)) + np.arange(4),  # stacked per-layer (L, B)
            "beta": 0.7,
        }
        out = drop_padded_rows(mets)
        np.testing.assert_array_equal(out["x_sl"], [100, 80])
        np.testing.assert_array_equal(out["elbo"], [-10.0, -8.0])
        assert out["klds"].shape == (5, 2)
        assert out["loss"] == 1.5 and out["beta"] == 0.7

    def test_noop_when_unpadded(self):
        from blvm_tpu.evaluation.metrics import drop_padded_rows

        mets = {"x_sl": np.array([3, 2]), "elbo": np.array([1.0, 2.0])}
        assert drop_padded_rows(mets) is mets

    def test_per_example_means_undiluted(self):
        """The exact failure the convergence harness caught: LLMetric over a
        row-padded batch must equal the metric over the true rows."""
        from blvm_tpu.evaluation.metrics import LLMetric, drop_padded_rows

        true = {"x_sl": np.array([100, 80]), "elbo": np.array([-10.0, -8.0])}
        padded = {"x_sl": np.array([100, 80, 0, 0]), "elbo": np.array([-10.0, -8.0, 0.0, 0.0])}
        m_true = LLMetric(true["elbo"], name="elbo")
        m_fixed = LLMetric(drop_padded_rows(padded)["elbo"], name="elbo")
        assert m_true.value == m_fixed.value == -9.0
