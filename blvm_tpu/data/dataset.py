"""CSV source-file dataset with (Loader, Transform, Batcher) modalities.

Rebuild of reference ``blvm/data/base_dataset.py:17-166`` without torch: a
dataset is a list of modalities; ``__getitem__`` loads all modalities of one
example; ``collate`` optionally sorts by modality-0 length then batches each
modality with its batcher. "Batch datasets" (an ``n_examples`` column) are
cached up-front.
"""

import csv
import random
from typing import Any, List, Tuple

import numpy as np

from blvm_tpu.data.batchers import Batcher, ListBatcher
from blvm_tpu.data.datapaths import DATAPATHS_MAPPING
from blvm_tpu.data.loaders import Loader
from blvm_tpu.data.transforms import Transform
from blvm_tpu.ops.sequence import update_running_variance


class BaseDataset:
    def __init__(self, source: str, modalities: List[Tuple[Loader, Any, Batcher]], sort: bool = True):
        """Dataset serving examples from files listed in ``source``.

        Args:
            source: dataset shorthand name or path to a source CSV.
            modalities: list of (Loader, Transform, Batcher) per modality.
            sort: sort batch by the first modality's batcher before collation.
        """
        self.source = source
        self.loaders, self.transforms, self.batchers = zip(*modalities)
        self.sort = sort
        self.num_modalities = len(modalities)

        self.source_filepath = DATAPATHS_MAPPING.get(source, source)
        self.unique_loaders = set(self.loaders)
        self.examples = self.load_examples(self.source_filepath)
        self.transforms_enabled = True

    def load_examples(self, source_filepath):
        with open(source_filepath, newline="") as f:
            reader = csv.DictReader(f)
            is_batch_dataset = "n_examples" in reader.fieldnames
            source_rows = list(reader)

        if is_batch_dataset:
            return self._load_and_cache_batch_dataset(source_rows)
        return [row["filename"] for row in source_rows]

    def _load_and_cache_batch_dataset(self, source_rows):
        """Cache every sub-example of every batch file up-front."""
        examples = []
        for row in source_rows:
            examples += [f"{row['filename']}-{idx}" for idx in range(int(row["n_examples"]))]

        for loader in self.unique_loaders:
            loader.enable_cache()
            for row in source_rows:
                loader.load_and_cache_batch(row["filename"])
            assert all(exid in loader.load.memory for exid in examples), "Not all examples were cached correctly."

        return examples

    def enable_transforms(self):
        self.transforms_enabled = True

    def disable_transforms(self):
        self.transforms_enabled = False

    def set_epoch(self, epoch: int) -> None:
        """Advance the transform context's epoch counter (the driver calls this
        once per epoch) so per-example-deterministic random transforms (e.g.
        ``RandomSegment``) draw fresh crops each epoch while staying a pure
        function of (seed, example_id, epoch) — thread- and multi-host-safe."""
        self.epoch = int(epoch)

    def __getitem__(self, idx):
        """All modalities of a single example: ``(data, metadata)`` or tuples thereof."""
        example_id = self.examples[idx]

        loader_data = {}
        for loader in self.unique_loaders:
            loader_data[loader.id] = loader(example_id)

        ctx = {"example_id": example_id, "epoch": getattr(self, "epoch", 0)}
        data, metadata = [], []
        for loader, transform in zip(self.loaders, self.transforms):
            x, m = loader_data[loader.id]
            if self.transforms_enabled and transform:
                y = transform(x, ctx) if isinstance(transform, Transform) else transform(x)
            else:
                y = x
            data.append(y)
            metadata.append(m)

        if len(data) == 1:
            return data[0], metadata[0]
        return tuple(data), tuple(metadata)

    def collate(self, batch: List[Tuple[Any, Any]]):
        """Arrange ``__getitem__`` outputs into per-modality batches."""
        if self.sort:
            sort_modality_idx = 0 if self.num_modalities > 1 else None
            batch = self.batchers[0].sort(batch, sort_modality_idx=sort_modality_idx)

        data, metadata = zip(*batch)
        if self.num_modalities == 1:
            return self.batchers[0](list(data)), metadata

        data = zip(*data)
        metadata = list(zip(*metadata))

        outputs = [batcher(list(modality_data)) for batcher, modality_data in zip(self.batchers, data)]
        return outputs, metadata

    def compute_statistics(self):
        """Streaming global mean/variance per modality (parallel Welford)."""
        assert all(isinstance(b, ListBatcher) for b in self.batchers)

        means = [0.0] * self.num_modalities
        weights = [0.0] * self.num_modalities
        M2s = [0.0] * self.num_modalities
        variances = [0.0] * self.num_modalities

        for i in range(len(self)):
            data, _ = self[i]
            if self.num_modalities == 1:
                data = [data]
            for m in range(self.num_modalities):
                x = np.asarray(data[m], dtype=np.float64)
                x_mean = float(x.mean())
                # M2 about this chunk's own mean (standard parallel Welford; the
                # reference used deviations from the running mean, which skews
                # the variance — ``base_dataset.py:142``).
                x_M2 = float(((x - x_mean) ** 2).sum())
                x_w = float(x.size)
                variances[m], means[m], weights[m], M2s[m] = update_running_variance(
                    means[m], weights[m], M2s[m], x_mean, x_w, x_M2
                )

        if self.num_modalities == 1:
            return means[0], variances[0]
        return means, variances

    def subsample(self, fraction: float, seed: int = 0):
        """Keep a random ``fraction`` of the examples."""
        assert 0 < fraction < 1
        self.examples_original = self.examples
        k = int(len(self.examples) * fraction)
        self.examples = random.Random(seed).sample(self.examples, k)

    def __len__(self):
        return len(self.examples)

    def __repr__(self) -> str:
        attrs = ["source", "loaders", "transforms", "batchers", "sort"]
        s = "".join(f"\n\t{a}={getattr(self, a)}," for a in attrs)
        return f"BaseDataset({s}\n)"
