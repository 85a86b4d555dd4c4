"""Shape bucketing: quantize dynamic batch dimensions to a small set of shapes.

This subsystem has no reference counterpart — the reference (PyTorch) pads each
batch to its exact max length (``blvm/data/batchers.py:113-143``), which under
XLA would trigger a recompile for nearly every batch. Buckets round the padded
time length (and optionally the batch size) *up* to a bounded grid, so a whole
training run compiles only a handful of executables while per-example sequence
lengths keep the loss normalization exact (loss = −Σ log p / Σ x_sl; the extra
padding is masked out).
"""

import math
from dataclasses import dataclass
from typing import Optional, Sequence


@dataclass(frozen=True)
class BucketSpec:
    """Bucketing policy for one dynamic dimension.

    ``mode='multiple'``: round up to a multiple of ``multiple`` (bounded count
    of shapes when lengths are bounded; good default for the time dimension
    combined with token-budget batching).
    ``mode='pow2'``: round up to ``base * 2**k`` — logarithmic shape count.
    ``boundaries``: explicit sorted grid; values above the last boundary round
    up to a multiple of it.
    """

    mode: str = "multiple"
    multiple: int = 1024
    base: int = 128
    boundaries: Optional[Sequence[int]] = None

    def __call__(self, length: int) -> int:
        return bucket_length(length, self)


def bucket_length(length: int, spec: Optional[BucketSpec]) -> int:
    """Smallest bucketed length >= ``length`` under ``spec`` (identity if None)."""
    if spec is None or length <= 0:
        return length
    if spec.boundaries is not None:
        for b in spec.boundaries:
            if length <= b:
                return int(b)
        last = spec.boundaries[-1]
        return int(math.ceil(length / last) * last)
    if spec.mode == "multiple":
        return int(math.ceil(length / spec.multiple) * spec.multiple)
    if spec.mode == "pow2":
        if length <= spec.base:
            return spec.base
        return int(spec.base * 2 ** math.ceil(math.log2(length / spec.base)))
    raise ValueError(f"Unknown bucket mode {spec.mode!r}")
