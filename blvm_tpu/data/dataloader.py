"""Threaded data loader with asynchronous device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` worker processes
(``experiment_lstm_audio.py:111-117``) with a thread pipeline (audio decode and
collation release the GIL in numpy) plus a device prefetcher that keeps N
batches in flight to HBM — double-buffered host→device transfer so the TPU
never waits on input (SURVEY §2.8 "async data loading").
"""

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


class DataLoader:
    """Iterate a batch sampler over a dataset, loading batches ahead with threads.

    Yields whatever ``dataset.collate`` returns. ``num_workers=0`` loads
    synchronously; otherwise a thread pool pipelines ``prefetch_batches`` ahead.
    """

    def __init__(self, dataset, batch_sampler=None, batch_size: int = 1, num_workers: int = 2, prefetch_batches: int = 2):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch_batches = max(1, prefetch_batches)

    def _batches(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
        else:
            n = len(self.dataset)
            for start in range(0, n, self.batch_size):
                yield list(range(start, min(start + self.batch_size, n)))

    def _load_batch(self, indices):
        return self.dataset.collate([self.dataset[i] for i in indices])

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        return -(-len(self.dataset) // self.batch_size)

    def __iter__(self) -> Iterator:
        if self.num_workers == 0:
            for indices in self._batches():
                yield self._load_batch(indices)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            batches = self._batches()
            try:
                for _ in range(self.prefetch_batches):
                    indices = next(batches, None)
                    if indices is None:
                        break
                    pending.append(pool.submit(self._load_batch, indices))

                while pending:
                    fut = pending.pop(0)
                    indices = next(batches, None)
                    if indices is not None:
                        pending.append(pool.submit(self._load_batch, indices))
                    yield fut.result()
            finally:
                for fut in pending:
                    fut.cancel()


class DevicePrefetcher:
    """Wrap an iterator of host batches; asynchronously ``device_put`` with an
    optional sharding, keeping ``depth`` batches in flight.

    ``sharding`` is typically a ``NamedSharding(mesh, P('data'))`` so each batch
    lands already sharded over the mesh's data axis. Transfers overlap with the
    previous step's compute (device_put is async under JAX).
    """

    def __init__(self, iterable: Iterable, sharding=None, depth: int = 2):
        self.iterable = iterable
        self.sharding = sharding
        self.depth = max(1, depth)

    def _put(self, item):
        if self.sharding is None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if isinstance(x, (np.ndarray, np.generic)) else x, item
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.sharding) if isinstance(x, (np.ndarray, np.generic)) else x, item
        )

    def __iter__(self):
        buf = []
        it = iter(self.iterable)
        for item in it:
            buf.append(self._put(item))
            if len(buf) >= self.depth:
                yield buf.pop(0)
        yield from buf
