"""Length-bucketed batch samplers (the data pipeline's throughput core).

Rebuild of reference ``blvm/data/samplers/length_samplers.py``: examples are
pooled by similar length, pools are shuffled internally, and batches are packed
greedily up to a total-timestep budget ``batch_len`` ("token budget"). This
minimizes padding waste; combined with shape bucketing it also minimizes the
number of distinct compiled shapes on TPU.

Differences from the reference: explicit seeded RNG (``random.Random(seed)``)
instead of global ``random`` state. ``seed`` may also be a ``random.Random``
instance shared between samplers, which reproduces the reference's
global-``random`` stream exactly (same ``sample``/``shuffle`` call sequence —
reference ``length_samplers.py:149,166``); the convergence parity harness uses
this to make both frameworks plan identical batches.
"""

import random
from typing import Iterator, List, Optional, Union

import numpy as np

from blvm_tpu.data.samplers.utils import load_field


def parse_max_len(batch_len: Union[int, float, str], lengths: List[int]):
    """Parse ``batch_len``: a number (must be >= the longest example) or a
    string containing 'max', e.g. '4max' = 4 * max(lengths)."""
    if batch_len is None:
        raise ValueError("batch_len is required; pass a number or a 'max'-style string")

    max_len = max(lengths)
    if isinstance(batch_len, (int, float)):
        if batch_len < max_len:
            raise ValueError(
                f"batch_len={batch_len} is below the longest example ({max_len} timesteps); "
                "no batch could hold that example"
            )
        return batch_len

    if isinstance(batch_len, str):
        if "max" not in batch_len:
            raise ValueError(f"string batch_len must contain 'max' (e.g. '4max'), got {batch_len!r}")
        digits = [c for c in batch_len if c.isdigit()]
        if not digits:
            return max_len
        return int("".join(digits)) * max_len

    raise ValueError(f"unsupported batch_len type {type(batch_len).__name__}: pass int, float, or a 'max' string")


class LengthTrainSampler:
    def __init__(
        self,
        source,
        field: Optional[str] = "length",
        max_pool_difference: Optional[float] = None,
        min_pool_size: int = 512,
        batch_len: Optional[Union[float, str]] = None,
        batch_size: Optional[int] = None,
        num_batches: Optional[int] = None,
        shuffle: bool = True,
        longest_first: bool = True,
        drop_last: bool = True,
        seed: Optional[int] = None,
    ):
        """Pool examples of similar length; pack shuffled pools into batches of
        at most ``batch_len`` total timesteps. ``longest_first`` emits the
        longest batch first on epoch one to pre-trigger maximum memory
        allocation (and, on TPU, the largest-bucket compilation) up front.
        """
        assert sum([bool(batch_len), bool(batch_size)]) == 1, "batch_len and batch_size are mutually exclusive."

        self.source = source
        self.field = field
        self.max_pool_difference = max_pool_difference
        self.min_pool_size = min_pool_size
        self.batch_size = batch_size
        self.batch_len = batch_len
        self.num_batches = num_batches
        self.shuffle = shuffle
        self.longest_first = longest_first
        self.buffer: list = []  # only used when num_batches is not None
        self.drop_last = drop_last
        self._rng = seed if isinstance(seed, random.Random) else random.Random(seed)

        lengths = source if isinstance(source, list) else load_field(source, field)
        self.lengths = np.asarray(lengths, dtype=int)

        if max_pool_difference is None:
            max_pool_difference = (self.lengths.max() - self.lengths.min()) * 0.05

        self.sorted_indices = np.argsort(self.lengths, kind="stable")

        if batch_len:
            self.batch_len = parse_max_len(batch_len, self.lengths.tolist())
        # (the reference raises NotImplementedError for batch_size mode —
        # implemented here: fixed-count batches drawn from the length pools)

        self.pools = self.create_sample_pools(max_pool_difference, min_pool_size)
        self.sample_batches()

        if self.longest_first:
            self.move_longest_to_front()

    def move_longest_to_front(self):
        batch_lengths = [max(self.lengths[b] for b in batch) for batch in self.batches]
        max_idx = batch_lengths.index(max(batch_lengths))
        self.batches[0], self.batches[max_idx] = self.batches[max_idx], self.batches[0]

    def create_sample_pools(self, max_diff, min_size):
        """Group sorted examples into pools spanning at most ``max_diff`` length
        difference, each at least ``min_size`` examples."""
        start, end = 0, 0
        sorted_lens = self.lengths[self.sorted_indices]

        pools = []
        while end != len(self.lengths):
            base_len = sorted_lens[start]
            deltas = sorted_lens - base_len
            pool_size = int(np.logical_and(0 <= deltas, deltas < max_diff).sum())
            end = min(max(start + min_size, start + pool_size), len(self.lengths))
            if (len(self.lengths) - end) < min_size:
                end = len(self.lengths)
            pools.append(self.sorted_indices[start:end].tolist())
            start = end

        return pools

    def sample_batches(self):
        """Shuffle within pools, then greedily pack batches up to batch_len."""
        if self.num_batches is not None:
            if len(self.buffer) >= self.num_batches:
                self.batches = self.buffer[: self.num_batches]
                self.buffer = self.buffer[self.num_batches :]
                return None

        ordered_idxs = np.concatenate([self._rng.sample(p, k=len(p)) for p in self.pools])

        if self.batch_size:
            # fixed-count batches from the length pools (still length-grouped)
            idxs = [int(i) for i in ordered_idxs]
            batches = [idxs[i : i + self.batch_size] for i in range(0, len(idxs), self.batch_size)]
            if self.drop_last and len(batches) > 1 and len(batches[-1]) < self.batch_size:
                batches = batches[:-1]
        else:
            batch, batches, batch_len = [], [], 0
            for idx in ordered_idxs:
                l = self.lengths[idx]
                if batch_len + l <= self.batch_len:
                    batch_len += l
                    batch.append(int(idx))
                else:
                    batches.append(batch)
                    batch = [int(idx)]
                    batch_len = l
            if batch and not (self.drop_last and batch_len < self.batch_len and batches):
                # keep the final partial batch; never drop it if it is the only
                # one (the reference crashes on tiny datasets here —
                # length_samplers.py:161)
                batches.append(batch)

        if self.shuffle:
            self._rng.shuffle(batches)

        if self.num_batches is not None:
            # Refill the buffer and take num_batches from it. (The reference
            # recursed here but then fell through and overwrote self.batches
            # with the full epoch — `length_samplers.py:168-172`; fixed.)
            self.buffer += batches
            self.sample_batches()
            return None

        self.batches = batches

    def __iter__(self) -> Iterator[List[int]]:
        try:
            for batch in self.batches:
                yield batch
        finally:
            if self.shuffle:
                self.sample_batches()  # resample even if iteration is interrupted

    def __len__(self):
        return len(self.batches)

    def __repr__(self):
        return (
            f"LengthTrainSampler(source={self.source!r}, field={self.field!r}, batch_size={self.batch_size}, "
            f"batch_len={self.batch_len}, max_pool_difference={self.max_pool_difference}, "
            f"min_pool_size={self.min_pool_size}, num_batches={self.num_batches})"
        )


class LengthEvalSampler:
    def __init__(
        self,
        source,
        field: Optional[str] = "length",
        batch_len: Optional[Union[float, str]] = None,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        longest_first: bool = True,
        seed: Optional[int] = None,
    ):
        """Deterministic packing of sorted examples into batches by total length
        or count; ``longest_first`` reverses so the largest batch comes first."""
        assert sum([bool(batch_len), bool(batch_size)]) == 1, "batch_len and batch_size are mutually exclusive."

        self.source = source
        self.field = field
        self.batch_size = batch_size
        self.batch_len = batch_len
        self.shuffle = shuffle
        self.longest_first = longest_first
        self._rng = seed if isinstance(seed, random.Random) else random.Random(seed)

        lengths = source if isinstance(source, list) else load_field(source, field)
        self.lengths = np.asarray(lengths, dtype=int)
        self.sorted_indices = np.argsort(self.lengths, kind="stable")

        if batch_len:
            self.batch_len = parse_max_len(batch_len, self.lengths.tolist())
            self.sample_batches = self.sample_batches_len
        else:
            self.sample_batches = self.sample_batches_size

        self.sample_batches()

    def sample_batches_size(self):
        idxs = [int(i) for i in self.sorted_indices]
        batches = [idxs[i : i + self.batch_size] for i in range(0, len(idxs), self.batch_size)]

        if self.longest_first:
            self.longest_first = not self.shuffle  # disable after first epoch if shuffling
            batches.reverse()
        elif self.shuffle:
            self._rng.shuffle(batches)

        self.batches = batches

    def sample_batches_len(self):
        batch, batches, batch_len = [], [], 0
        for idx in self.sorted_indices:
            l = self.lengths[idx]
            if batch_len + l <= self.batch_len:
                batch_len += l
                batch.append(int(idx))
            else:
                batches.append(batch)
                batch = [int(idx)]
                batch_len = l
        if batch:
            batches.append(batch)

        if self.longest_first:
            self.longest_first = not self.shuffle
            batches.reverse()
        elif self.shuffle:
            self._rng.shuffle(batches)

        self.batches = batches

    def __iter__(self) -> Iterator[List[int]]:
        try:
            for batch in self.batches:
                yield batch
        finally:
            if self.shuffle:
                self.sample_batches()

    def __len__(self):
        return len(self.batches)

    def __repr__(self):
        return (
            f"LengthEvalSampler(source={self.source!r}, field={self.field!r}, "
            f"batch_size={self.batch_size}, batch_len={self.batch_len})"
        )
