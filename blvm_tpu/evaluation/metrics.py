"""Self-aggregating metric objects with exact weighted running means.

Rebuild of reference ``blvm/evaluation/metrics.py``: a metric is created fresh
each step from raw values and merged into an accumulator via ``update`` — the
running means are *exact* weighted means (order-independent epoch aggregates),
not EMAs. Semantics preserved precisely:

  * ``reduce_by``: divisor of the summed values (e.g. Σ sequence lengths).
  * ``weight_by``: merge weight for the running mean (defaults to reduce_by).
  * ``BitsPerDimMetric``: values are negated log-likelihoods divided by ln 2,
    then running-mean with ``reduce_by = x_sl`` → **bits per frame**
    (reference ``metrics.py:443-468``).

Values may be floats, numpy arrays or JAX arrays (device values are pulled to
host exactly once, at metric construction — by the time metrics are built the
step's outputs are already host-bound).
"""

import math
from copy import deepcopy
from typing import List, Optional, Set, Union

import numpy as np

from blvm_tpu.ops.sequence import update_running_variance


def drop_padded_rows(mets: dict) -> dict:
    """Remove zero-length padded example rows from a host-side step-metric dict.

    Shape bucketing / device padding appends zero-length rows to batches
    (masked inside the losses). Frame-normalized metrics (``reduce_by=x_sl``)
    are exact either way — padded rows contribute 0 nats AND 0 frames — but
    per-example means (``LLMetric``/``KLMetric`` without ``reduce_by``) would
    be diluted by the extra rows; the reference never pads, so its 'elbo'/
    'rec'/'kl' are true per-example means. Caught by the convergence parity
    harness (scripts/parity/run_convergence.py): before this filter the VRNN
    'elbo' aggregate read ~40%% low at pow2 row bucketing.

    Filters every array leaf with a per-example axis: leading dim == B, or —
    for stacked per-layer arrays like STCN's ``klds`` (L, B) — second dim == B.
    No-op when nothing is padded.
    """
    x_sl = np.asarray(mets["x_sl"])
    active = x_sl > 0
    if bool(active.all()):
        return mets
    B = x_sl.shape[0]

    def _filter(v):
        if isinstance(v, (list, tuple)):
            return type(v)(_filter(u) for u in v)
        a = np.asarray(v)
        if a.ndim >= 1 and a.shape[0] == B:
            return a[active]
        if a.ndim >= 2 and a.shape[1] == B:
            return a[:, active]
        return v

    return {k: _filter(v) for k, v in mets.items()}


def _to_host(x):
    """Convert device arrays to numpy; pass floats through."""
    if x is None or isinstance(x, (int, float)):
        return x
    return np.asarray(x)


def _sum_and_numel(values):
    values = _to_host(values)
    if isinstance(values, np.ndarray):
        return float(values.sum()), int(values.size)
    return float(values), 1


def _resolve(x, default):
    x = _to_host(x)
    if isinstance(x, np.ndarray):
        return float(x.sum())
    return float(x) if x else default


class Metric:
    base_tags: Set[str] = set()
    _str_value_fmt = "<.3"

    def __init__(
        self,
        name: str,
        tags: Set[str] = None,
        get_best: str = None,
        log_to_console: bool = True,
        log_to_framework: bool = True,
    ):
        self.name = name
        self.tags = self.base_tags if tags is None else (set(tags) | self.base_tags)
        self.get_best = GET_BEST[get_best] if get_best is not None else GET_BEST["none"]
        self.log_to_console = log_to_console
        self.log_to_framework = log_to_framework

    @property
    def value(self):
        raise NotImplementedError()

    @property
    def str_value(self):
        return f"{self.value:{self._str_value_fmt}f}"

    def update(self, metric: "Metric"):
        raise NotImplementedError()

    def copy(self):
        return deepcopy(self)

    def __repr__(self):
        return f"{self.__class__.__name__}(name={self.name}, value={self.str_value})"


def min_value(metrics: List[Metric]):
    return min(metrics, key=lambda m: m.value)


def max_value(metrics: List[Metric]):
    return max(metrics, key=lambda m: m.value)


def no_value(metrics: List[Metric]):
    return None


GET_BEST = dict(none=no_value, min=min_value, max=max_value)


def edit_distance(ref, hyp) -> int:
    """Levenshtein distance between two sequences (two-row DP)."""
    if len(ref) < len(hyp):
        ref, hyp = hyp, ref
    if not hyp:
        return len(ref)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        curr = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (r != h))
        prev = curr
    return prev[-1]


class ErrorRateMetric(Metric):
    """Accumulated edit-distance error rate (WER/CER via tokenizer choice)."""

    def __init__(self, refs, hyps, tokenizer, name="er", tags=None):
        super().__init__(name=name, tags=tags, get_best="min")
        edits, length = 0, 0
        for r, h in zip(refs, hyps):
            rt, ht = tokenizer(r), tokenizer(h)
            edits += edit_distance(rt, ht)
            length += len(rt)
        self._edits = edits
        self._len = length

    @property
    def value(self):
        return self._edits / self._len if self._len else float("nan")

    def update(self, metric: Metric):
        self._edits += metric._edits
        self._len += metric._len


class ConfusionMatrixMetric(Metric):
    """Accumulates predictions/labels; ``value`` returns (matrix, class_names)."""

    def __init__(self, y_pred, y_true, class_names: List[str] = None, name: str = "cm", tags=None, log_to_framework=True):
        super().__init__(name, tags, get_best=None, log_to_console=False, log_to_framework=log_to_framework)
        self.y_pred = list(np.asarray(_to_host(y_pred)).reshape(-1))
        self.y_true = list(np.asarray(_to_host(y_true)).reshape(-1))
        self.class_names = class_names

    @property
    def value(self):
        n = len(self.class_names) if self.class_names else int(max(max(self.y_true), max(self.y_pred))) + 1
        cm = np.zeros((n, n), dtype=np.int64)
        for t, p in zip(self.y_true, self.y_pred):
            cm[int(t), int(p)] += 1
        return cm, self.class_names

    def update(self, metric: Metric):
        self.y_pred += metric.y_pred
        self.y_true += metric.y_true


class LatestMeanMetric(Metric):
    def __init__(self, values, name, tags=None, reduce_by=None, get_best=None, log_to_console=True, log_to_framework=True):
        super().__init__(name=name, tags=tags, get_best=get_best, log_to_console=log_to_console, log_to_framework=log_to_framework)
        value, numel = _sum_and_numel(values)
        reduce_by = _resolve(reduce_by, numel)
        self.latest = value / reduce_by

    @property
    def value(self):
        return self.latest

    def update(self, metric: Metric):
        self.latest = metric.latest


class EMAMetric(Metric):
    def __init__(self, values, name, tags=None, reduce_by=None, weight_by=None, get_best=None, log_to_console=True, log_to_framework=True):
        super().__init__(name=name, tags=tags, get_best=get_best, log_to_console=log_to_console, log_to_framework=log_to_framework)
        value, numel = _sum_and_numel(values)
        reduce_by = _resolve(reduce_by, numel)
        self.weight_by = _resolve(weight_by, reduce_by)
        self.ema = value / reduce_by

    @property
    def value(self):
        return self.ema

    def update(self, metric: Metric):
        avg_weight = (self.weight_by + metric.weight_by) / 2
        self.ema = avg_weight * metric.ema + (1 - avg_weight) * self.ema


class RunningMeanMetric(Metric):
    def __init__(self, values, name, tags=None, reduce_by=None, weight_by=None, get_best=None, log_to_console=True, log_to_framework=True):
        """Exact weighted running mean: value = Σ values / reduce_by, merged
        across steps with weights ``weight_by`` (reference ``metrics.py:209-264``)."""
        super().__init__(name=name, tags=tags, get_best=get_best, log_to_console=log_to_console, log_to_framework=log_to_framework)
        value, numel = _sum_and_numel(values)
        reduce_by = _resolve(reduce_by, numel)
        self.weight_by = _resolve(weight_by, reduce_by)
        self.running_mean = value / reduce_by

    @property
    def value(self):
        return self.running_mean

    def update(self, metric: Metric):
        d = self.weight_by + metric.weight_by
        w1 = self.weight_by / d
        w2 = metric.weight_by / d
        self.running_mean = self.running_mean * w1 + metric.running_mean * w2
        self.weight_by = d


class RunningVarianceMetric(Metric):
    def __init__(self, values, name, tags=None, reduce_by=None, weight_by=None, get_best=None, log_to_console=True, log_to_framework=True):
        super().__init__(name=name, tags=tags, get_best=get_best, log_to_console=log_to_console, log_to_framework=log_to_framework)
        raw = _to_host(values)
        value, numel = _sum_and_numel(values)
        reduce_by = _resolve(reduce_by, numel)
        self.weight_by = _resolve(weight_by, reduce_by)
        self.running_mean = value / reduce_by
        if isinstance(raw, np.ndarray):
            self.M2 = float(((raw - self.running_mean) ** 2).sum())
        else:
            self.M2 = 0.0
        self.population_variance = self.M2 / (reduce_by - 1) if reduce_by > 1 else float("nan")

    @property
    def value(self):
        return self.population_variance

    def update(self, metric: Metric):
        var, avg, w, M2 = update_running_variance(
            mean_a=self.running_mean,
            mean_b=metric.running_mean,
            weight_a=self.weight_by,
            weight_b=metric.weight_by,
            M2_a=self.M2,
            M2_b=metric.M2,
        )
        self.running_mean = avg
        self.population_variance = var
        self.weight_by = w
        self.M2 = M2


class RunningAccuracyMetric(Metric):
    """Standard classification accuracy. (Reference name had a typo:
    ``RunnnigAccuracyMetric``, ``metrics.py:334``.)"""

    _str_value_fmt = "6.4"

    def __init__(self, predictions, labels, name="accuracy", tags=None, get_best="max", log_to_console=True, log_to_framework=True):
        super().__init__(name=name, tags=tags, get_best=get_best, log_to_console=log_to_console, log_to_framework=log_to_framework)
        predictions = np.asarray(_to_host(predictions))
        labels = np.asarray(_to_host(labels))
        self.correct = int((predictions == labels).sum())
        self.total = int(labels.shape[0])

    @property
    def value(self):
        return self.correct / self.total

    def update(self, metric: Metric):
        self.correct += metric.correct
        self.total += metric.total


class LossMetric(RunningMeanMetric):
    base_tags = {"losses"}

    def __init__(self, values, name="loss", tags=None, reduce_by=None, weight_by=None, get_best="min", **kwargs):
        super().__init__(values=values, name=name, tags=tags, reduce_by=reduce_by, weight_by=weight_by, get_best=get_best, **kwargs)


class LLMetric(RunningMeanMetric):
    base_tags = {"log_likelihoods"}

    def __init__(self, values, name="ll", tags=None, reduce_by=None, weight_by=None, get_best="max", **kwargs):
        super().__init__(values=values, name=name, tags=tags, reduce_by=reduce_by, weight_by=weight_by, get_best=get_best, **kwargs)


class KLMetric(RunningMeanMetric):
    base_tags = {"kl_divergences"}

    def __init__(self, values, name="kl", tags=None, reduce_by=None, weight_by=None, get_best=None, **kwargs):
        super().__init__(values=values, name=name, tags=tags, reduce_by=reduce_by, weight_by=weight_by, get_best=get_best, **kwargs)


class BitsPerDimMetric(RunningMeanMetric):
    """Nats → bits conversion with running mean over ``reduce_by`` frames:
    bits/frame when reduce_by = Σ sequence lengths."""

    _str_value_fmt = "<5.3"

    def __init__(self, values, name="bpd", tags=None, reduce_by=None, weight_by=None, get_best="min", **kwargs):
        values = _to_host(values)
        if isinstance(values, np.ndarray):
            values = -values / math.log(2)
        else:
            values = -float(values) / math.log(2)
        super().__init__(values=values, name=name, tags=tags, reduce_by=reduce_by, weight_by=weight_by, get_best=get_best, **kwargs)


class PerplexityMetric(BitsPerDimMetric):
    """Perplexity ``2**mean`` of the bits-per-dim running mean."""

    _str_value_fmt = "<8.3"

    def __init__(self, values, name="pp", tags=None, reduce_by=None, weight_by=None, get_best="min", **kwargs):
        super().__init__(values=values, name=name, tags=tags, reduce_by=reduce_by, weight_by=weight_by, get_best=get_best, **kwargs)

    @property
    def value(self):
        return 2**self.running_mean
