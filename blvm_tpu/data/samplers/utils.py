"""Sampler helpers: read a length column from a source CSV or a dataset.

Rebuild of reference ``blvm/data/samplers/utils.py:21-87``.
"""

import csv
from typing import List, Union


def load_field_from_sourcefile(source_filepath: str, field: str = "length") -> List[int]:
    with open(source_filepath, newline="") as f:
        reader = csv.DictReader(f)
        if field not in reader.fieldnames:
            raise KeyError(f"Field {field!r} not in source file columns {reader.fieldnames}")
        return [int(float(row[field])) for row in reader]


def load_field_from_dataset(dataset, modality_idx: int = 0) -> List[int]:
    """Fall back to iterating the dataset and reading metadata lengths."""
    lengths = []
    for i in range(len(dataset)):
        _, metadata = dataset[i]
        meta = metadata[modality_idx] if isinstance(metadata, tuple) else metadata
        lengths.append(int(meta.length))
    return lengths


def load_field(source, field: str = "length") -> List[int]:
    """Resolve lengths from a source file path, dataset name, or dataset object."""
    from blvm_tpu.data.datapaths import DATAPATHS_MAPPING

    if isinstance(source, str):
        path = DATAPATHS_MAPPING.get(source, source)
        return load_field_from_sourcefile(path, field)
    if hasattr(source, "source_filepath"):
        try:
            return load_field_from_sourcefile(source.source_filepath, field)
        except (KeyError, FileNotFoundError):
            return load_field_from_dataset(source)
    raise TypeError(f"Cannot load field {field!r} from source of type {type(source)}")
