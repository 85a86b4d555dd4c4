"""Training-loop observability hub: step/epoch iteration, metric merging,
console progress and structured logging.

Rebuild of reference ``blvm/evaluation/tracker.py:56-393`` with the same API
(``epochs()``, ``steps()``, ``update()``, ``log()``, ``best_metrics`` ...) and
the same exact metric-merge semantics. Differences:

  * Logging backend is pluggable: a JSONL file sink is always available
    (``runs/<name>/metrics.jsonl``) and wandb is used when importable and
    enabled — the reference hard-required wandb.
  * Loader-worker CPU telemetry (psutil over worker PIDs, reference
    ``tracker.py:306-328``) is replaced by process-level host telemetry
    (``process_cpu_percent`` from ``time.process_time`` and
    ``host_iowait_percent`` from ``/proc/stat``) since loading is threaded,
    not forked — there are no worker PIDs to sample. Plus step-rate telemetry
    (ms/step) in the progress line.
"""

import itertools
import json
import os
import shutil
import time as time_mod
from collections import defaultdict
from typing import Any, Dict, Iterable, List, Optional, Union

from blvm_tpu.evaluation.metrics import Metric


def epoch_string(epoch: int) -> str:
    return f"\nEpoch {epoch}"


def source_string(source) -> str:
    return str(source)


class JSONLSink:
    """Append-only JSONL metric log (one object per ``log()`` call)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, values: dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(values, default=float) + "\n")


def _read_proc_stat_cpu() -> Optional[tuple]:
    """(total_jiffies, iowait_jiffies) from the aggregate ``/proc/stat`` cpu
    line, or None off-Linux. Used for host iowait telemetry."""
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
        if fields[0] != "cpu":
            return None
        vals = [int(v) for v in fields[1:]]
        return sum(vals), vals[4] if len(vals) > 4 else 0
    except (OSError, ValueError, IndexError):
        return None


class _HostTelemetry:
    """Pass-scoped host utilization: snapshot at ``begin()``, deltas at
    ``end()``. ``process_cpu_percent`` can exceed 100 (threaded loaders)."""

    def __init__(self):
        self._wall = None
        self._proc = None
        self._stat = None

    def begin(self):
        self._wall = time_mod.time()
        self._proc = time_mod.process_time()
        self._stat = _read_proc_stat_cpu()

    def end(self) -> Dict[str, float]:
        out = {}
        if self._wall is None:
            return out
        dwall = time_mod.time() - self._wall
        if dwall > 0:
            out["process_cpu_percent"] = 100.0 * (time_mod.process_time() - self._proc) / dwall
        stat = _read_proc_stat_cpu()
        if stat is not None and self._stat is not None:
            dtotal = stat[0] - self._stat[0]
            if dtotal > 0:
                out["host_iowait_percent"] = 100.0 * (stat[1] - self._stat[1]) / dtotal
        return out


class Tracker:
    def __init__(
        self,
        print_every: Union[int, float, None] = 1.0,
        debug_epoch_break_steps: Optional[int] = float("inf"),
        jsonl_path: Optional[str] = None,
        use_wandb: bool = False,
    ) -> None:
        """Track metrics per source, print progress, log epoch aggregates.

        Usage:
            for epoch in tracker.epochs(num_epochs):
                for batch in tracker.steps(train_loader, source="train"):
                    ...
                    tracker.update(metrics)
                tracker.log()
        """
        self.print_every = print_every
        self.debug_epoch_break_steps = debug_epoch_break_steps

        self.sinks = []
        if jsonl_path:
            self.sinks.append(JSONLSink(jsonl_path))
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                if wandb.run is not None:
                    self._wandb = wandb
            except ImportError:
                pass

        self.max_source_str_len = 0
        self.max_progress_str_len = 0

        self.printed_last = 0.0
        self.log_line_len = 0
        self.source = None
        self.start_time = defaultdict(lambda: None)
        self.end_time = defaultdict(lambda: None)
        self.epoch = 0
        self.step_within_epoch = defaultdict(lambda: 0)
        self.step_total = defaultdict(lambda: 0)
        self.max_steps = defaultdict(lambda: 0)

        self.metrics = defaultdict(dict)  # source -> name -> Metric
        self.accumulated_metrics = defaultdict(lambda: defaultdict(list))  # source -> name -> [Metric/epoch]
        self._telemetry = defaultdict(_HostTelemetry)  # source -> sampler
        self.telemetry = defaultdict(dict)  # source -> name -> float (last pass)

    @property
    def values(self) -> Dict[str, Dict[str, float]]:
        return {
            source: {m.name: m.value for m in self.metrics[source].values()}
            for source in self.metrics.keys()
        }

    @property
    def accumulated_values(self) -> Dict[str, Dict[str, List[float]]]:
        return {
            source: {
                metrics[0].name: [m.value for m in metrics]
                for metrics in self.accumulated_metrics[source].values()
            }
            for source in self.accumulated_metrics.keys()
        }

    @property
    def best_metrics(self) -> Dict[str, Dict[str, Metric]]:
        best = dict()
        for source in self.accumulated_metrics.keys():
            best[source] = dict()
            for name, acc in self.accumulated_metrics[source].items():
                metric = acc[0].get_best(acc)
                if metric is not None:
                    best[source][f"best_{name}"] = metric
        return best

    @property
    def best_values(self) -> Dict[str, Dict[str, float]]:
        return {
            source: {name: m.value for name, m in src.items()}
            for source, src in self.best_metrics.items()
        }

    def __call__(self, loader, source: Optional[str] = None, max_steps: Optional[int] = None):
        return self.steps(loader, source=source, max_steps=max_steps)

    def steps(
        self,
        iterable: Iterable,
        source: Optional[str] = None,
        max_steps: Optional[int] = None,
        before_unset=None,
    ):
        """Iterate batches while counting steps and rate-limited printing.

        ``before_unset`` (no-arg callable) runs after the last batch but while
        ``self.source`` is still set — the flush point for callers that defer
        per-step metric fetches (``unset`` snapshots the source's metrics into
        the epoch accumulators, so deferred updates must land before it).
        """
        if source is None:
            dataset = getattr(iterable, "dataset", None)
            source = getattr(dataset, "source", None)
            if source is None:
                raise ValueError("Must provide `source` to .steps() if the iterable has no dataset.source")

        if max_steps is None and hasattr(iterable, "__len__"):
            max_steps = len(iterable)

        self.set(source, max_steps=max_steps)

        try:
            for batch in iterable:
                yield batch
                self.increment_step()
                if self.do_print():
                    self.print()
                if self.step_within_epoch[self.source] >= self.debug_epoch_break_steps:
                    break
        finally:
            # also runs when the CONSUMER breaks out (generator close) or the
            # loop body raises — deferred metrics must not be silently dropped
            # and the source must not stay set
            if before_unset is not None:
                before_unset()
            self.unset()

    def increment_step(self):
        self.step_within_epoch[self.source] += 1

    def epochs(self, *args):
        """epochs(n) — epochs from current+1 to n; epochs(n, start) — explicit start."""
        if len(args) == 1:
            start, stop, step = self.epoch + 1, args[0], 1
        elif len(args) == 2:
            start, stop, step = args[1], args[0], 1
        elif len(args) == 3:
            start, stop, step = args[1], args[0], args[2]
        else:
            raise ValueError(f"Got `args` of length {len(args)} but that must be 1, 2 or 3.")

        for epoch in range(start, stop + 1, step):
            self.epoch = epoch
            print(epoch_string(epoch), flush=True)
            yield epoch
            print("-" * (self.log_line_len or 50), flush=True)
            self.reset()

    def set(self, source, max_steps: Optional[int] = None):
        self.source = source
        self.max_steps[self.source] = max_steps
        self.start_time[self.source] = time_mod.time()
        self._telemetry[self.source].begin()

    def unset(self):
        self.print(end="\n")
        self.end_time[self.source] = time_mod.time()
        self.telemetry[self.source] = self._telemetry[self.source].end()
        self.step_total[self.source] += self.step_within_epoch[self.source]
        # snapshot the active source plus any derived sources updated during
        # this pass (multi-seed training logs per-seed as "<source>[s<i>]");
        # derived sources inherit the pass's step count and timing so their
        # metrics.jsonl sections carry steps/epoch_duration like single-seed
        # runs (they share the parent's loop)
        derived = [s for s in self.metrics if s.startswith(f"{self.source}[")]
        for src in derived:
            self.start_time[src] = self.start_time[self.source]
            self.end_time[src] = self.end_time[self.source]
            self.step_total[src] += self.step_within_epoch[self.source]
            self.telemetry[src] = self.telemetry[self.source]
        for src in [self.source] + derived:
            for name, metric in self.metrics[src].items():
                self.accumulated_metrics[src][name].append(metric.copy())
        self.source = None
        self.printed_last = 0.0

    def reset(self):
        """Reset per-epoch state (metrics and timers), keeping accumulations."""
        self.metrics = defaultdict(dict)
        self.start_time = defaultdict(lambda: None)
        self.end_time = defaultdict(lambda: None)
        self.step_within_epoch = defaultdict(lambda: 0)
        self.max_steps = defaultdict(lambda: 0)
        self._telemetry = defaultdict(_HostTelemetry)
        self.telemetry = defaultdict(dict)

    def do_print(self) -> bool:
        if self.print_every is None:
            return False
        t = time_mod.time()
        if isinstance(self.print_every, float):
            do_print = (t - self.printed_last) > self.print_every
        else:
            step = self.step_within_epoch[self.source]
            do_print = step % self.print_every == 0 or step == 1
        if do_print:
            self.printed_last = t
        return do_print

    def print(self, end="\r", source: Optional[str] = None):
        source = self.source if source is None else source
        if source is None:
            return

        steps = self.step_within_epoch[source]
        max_steps = self.max_steps[source]
        steps_frac = f"{steps}/{max_steps if max_steps else '-'}"

        if self.start_time[source] is None or steps == 0:
            duration_s, ms_per_step = "-", "-"
        else:
            duration = time_mod.time() - self.start_time[source]
            ms_per_step = f"{int(duration / steps * 1000):d}ms"
            duration_s = f"{int(duration // 60):d}m {int(duration % 60):2d}s"

        ps = f"{steps_frac} ({duration_s}, {ms_per_step})"
        ss = source_string(source)
        self.max_source_str_len = max(self.max_source_str_len, len(ss))
        self.max_progress_str_len = max(self.max_progress_str_len, len(ps))
        sp = f"{ss:<{self.max_source_str_len}} - {ps:<{self.max_progress_str_len}}"

        sep = " | "
        metrics = [f"{name} = {m.str_value}" for name, m in self.metrics[source].items() if m.log_to_console]
        if metrics:
            metrics_len = [len(sep) + len(m) for m in metrics]
            cumlen = list(itertools.accumulate(metrics_len))
            width = shutil.get_terminal_size((120, 20)).columns
            max_len = width - len(sp)
            if cumlen[-1] > max_len:
                idx = next((i for i, v in enumerate(cumlen) if v > max_len - 3), 0)
                metrics = metrics[:idx] + ["..."]
        ms = sep + sep.join(metrics) if metrics else ""

        s = f"{sp}{ms}"
        self.log_line_len = len(s)
        print(s + " " * 5, end=end, flush=True)

    def log(self, **extra_log_data: Any):
        """Push epoch aggregates (values + bests + durations) to all sinks."""
        values = self.values
        values.update(extra_log_data)
        sources = set(values.keys()).intersection(set(self.best_values.keys()))
        for source in sources:
            values[source].update(self.best_values[source])
            if self.end_time[source] is not None and self.start_time[source] is not None:
                values[source]["epoch_duration"] = self.end_time[source] - self.start_time[source]
            values[source]["steps"] = self.step_total[source]
            values[source].update(self.telemetry[source])

        # drop empty source sections (under multi-seed every update lands on a
        # derived "<source>[s<i>]" entry and the parent would emit as {})
        values = {k: v for k, v in values.items() if not (isinstance(v, dict) and not v)}
        payload = {"epoch": self.epoch, **values}
        for sink in self.sinks:
            sink.log(payload)
        if self._wandb is not None:
            loggable = {
                src: {k: v for k, v in vals.items()} if isinstance(vals, dict) else vals
                for src, vals in values.items()
            }
            self._wandb.log(loggable)

    def update(self, metrics: List[Metric], source: Optional[str] = None, check_unique: bool = True):
        """Merge step metrics into the tracked accumulators for ``source``."""
        source = self.source if source is None else source

        if check_unique:
            names = [m.name for m in metrics]
            assert len(names) == len(set(names)), "Metrics must have unique names"

        if self.start_time[source] is None:
            self.start_time[source] = time_mod.time()

        for metric in metrics:
            if metric.name in self.metrics[source]:
                self.metrics[source][metric.name].update(metric)
            else:
                self.metrics[source][metric.name] = metric.copy()
