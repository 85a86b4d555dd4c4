"""Collation strategies returning ``(batch, seq_lens)`` numpy arrays.

Rebuild of reference ``blvm/data/batchers.py`` with one TPU-critical addition:
batchers accept a :class:`~blvm_tpu.data.buckets.BucketSpec` for the dynamic
(padded) dimension and an optional ``batch_size_bucket`` so emitted shapes come
from a bounded grid (see ``buckets.py`` docstring). Extra batch rows added by
batch-size bucketing have sequence length 0 and are fully masked downstream.
"""

from typing import Any, List, Optional, Tuple

import numpy as np

from blvm_tpu.data.buckets import BucketSpec, bucket_length


class Batcher:
    """Base class: must define ``collate`` and optionally ``sort``."""

    def __call__(self, batch: List[Any]):
        return self.collate(batch)

    def collate(self, batch: List[Any]):
        raise NotImplementedError()

    def sort(self, batch: List[Tuple[Any, Any]], sort_modality_idx: Optional[int] = None):
        raise NotImplementedError()

    def __repr__(self):
        return self.__class__.__name__ + "()"


def _sort_desc(batch, key):
    return sorted(batch, key=key, reverse=True)


class ListBatcher(Batcher):
    """No collation: returns the list plus inferred lengths (numel/len/0)."""

    def collate(self, batch: List[Any]):
        if isinstance(batch[0], np.ndarray):
            sequence_lengths = [int(a.size) for a in batch]
        elif hasattr(batch[0], "__len__"):
            sequence_lengths = [len(element) for element in batch]
        else:
            sequence_lengths = [0 for _ in batch]
        return batch, np.asarray(sequence_lengths, dtype=np.int64)

    def sort(self, batch, sort_modality_idx: Optional[int] = None):
        if sort_modality_idx is not None:
            return _sort_desc(batch, lambda x: len(x[0][sort_modality_idx]))
        return _sort_desc(batch, lambda x: len(x[0]))


class TextBatcher(Batcher):
    """Pad integer lists to the (bucketed) max length."""

    def __init__(self, pad_value: int = 0, bucket: Optional[BucketSpec] = None) -> None:
        self.pad_value = pad_value
        self.bucket = bucket

    def collate(self, batch: List[List[int]]):
        sequence_lengths = [len(text) for text in batch]
        T = bucket_length(max(sequence_lengths), self.bucket)
        rows = [list(text) + [self.pad_value] * (T - t) for t, text in zip(sequence_lengths, batch)]
        return np.asarray(rows, dtype=np.int64), np.asarray(sequence_lengths, dtype=np.int64)

    def sort(self, batch, sort_modality_idx: Optional[int] = None):
        if sort_modality_idx is not None:
            return _sort_desc(batch, lambda x: len(x[0][sort_modality_idx]))
        return _sort_desc(batch, lambda x: len(x[0]))


class TensorBatcher(Batcher):
    """Stack equally-shaped arrays; length is the element count per example."""

    def collate(self, batch: List[np.ndarray]):
        sequence_lengths = [int(a.size) for a in batch]
        shapes = [a.shape for a in batch]
        assert all(sequence_lengths[0] == s for s in sequence_lengths)
        assert all(shapes[0] == s for s in shapes)
        return np.concatenate([np.asarray(a) for a in batch], axis=0), np.asarray(sequence_lengths, dtype=np.int64)

    def sort(self, batch, sort_modality_idx: Optional[int] = None):
        return batch


class DynamicTensorBatcher(Batcher):
    """Pad arrays along one dynamic axis to the (bucketed) max length and stack.

    The workhorse batcher (reference ``batchers.py:113-143``). Output shape is
    ``(B', *, T', *)`` where T' is bucketed and B' is optionally bucketed by
    appending all-zero rows with sequence length 0.
    """

    def __init__(
        self,
        axis: int = -1,
        pad_value: float = 0,
        bucket: Optional[BucketSpec] = None,
        batch_size_bucket: Optional[BucketSpec] = None,
    ) -> None:
        self.axis = axis
        self.pad_value = pad_value
        self.bucket = bucket
        self.batch_size_bucket = batch_size_bucket

    def collate(self, batch: List[np.ndarray]):
        batch = [np.asarray(a) for a in batch]
        axis = self.axis if self.axis >= 0 else batch[0].ndim + self.axis
        sequence_lengths = [a.shape[axis] for a in batch]

        N = len(batch)
        T = bucket_length(max(sequence_lengths), self.bucket)
        N_out = bucket_length(N, self.batch_size_bucket)

        collated_shape = list(batch[0].shape)
        collated_shape[axis] = T
        out = np.full([N_out] + collated_shape, self.pad_value, dtype=batch[0].dtype)
        for i, (a, sl) in enumerate(zip(batch, sequence_lengths)):
            sel = [i] + [slice(None)] * a.ndim
            sel[1 + axis] = slice(0, sl)
            out[tuple(sel)] = a

        seq_lens = np.zeros(N_out, dtype=np.int64)
        seq_lens[:N] = sequence_lengths
        return out, seq_lens

    def sort(self, batch, sort_modality_idx: Optional[int] = None):
        if sort_modality_idx is not None:
            return _sort_desc(batch, lambda x: x[0][sort_modality_idx].shape[self.axis])
        return _sort_desc(batch, lambda x: len(x[0]))
