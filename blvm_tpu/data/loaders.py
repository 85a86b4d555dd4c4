"""Extension-keyed file loaders returning ``(data, MetaData)`` numpy arrays.

Rebuild of reference ``blvm/data/loaders.py`` without torch/torchaudio: WAV and
NIST-SPHERE audio are decoded with the stdlib + numpy (this image has no
soundfile/torchaudio); FLAC falls back to `soundfile` if it is ever installed.
Loaders support memoization and batch-file caching exactly as the reference
(``loaders.py:91-260``).
"""

import os
import uuid
import wave
from dataclasses import dataclass
from typing import Callable, Optional, Union

import numpy as np


@dataclass
class MetaData:
    length: int = None
    file_path: str = None
    example_id: str = None
    sub_id: int = None  # sub id for batched datasets


@dataclass
class AudioMetaData(MetaData):
    sample_rate: int = None
    channels: int = None
    bits_per_sample: int = None
    encoding: str = None


@dataclass
class TextMetaData(MetaData):
    word_length: int = None
    char_length: int = None


def _decode_pcm(raw: bytes, sampwidth: int, n_channels: int) -> np.ndarray:
    """Decode interleaved PCM bytes to float32 in [-1, 1], shape (channels, T)."""
    if sampwidth == 2:
        from blvm_tpu import native

        ints = np.frombuffer(raw, dtype="<i2")
        if native.available():
            data = native.decode_pcm16(ints)
        else:
            data = ints.astype(np.float32) / 32768.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8) | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"Unsupported PCM sample width: {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).T
    else:
        data = data[None, :]
    return data


def _load_wav(file_path: str):
    with wave.open(file_path, "rb") as f:
        n_channels = f.getnchannels()
        sampwidth = f.getsampwidth()
        framerate = f.getframerate()
        n_frames = f.getnframes()
        raw = f.readframes(n_frames)
    audio = _decode_pcm(raw, sampwidth, n_channels)
    return audio, framerate, n_channels, sampwidth * 8, "PCM"


def _load_sphere(file_path: str):
    """Decode NIST SPHERE files (original TIMIT distribution format)."""
    with open(file_path, "rb") as f:
        magic = f.read(8)
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"Not a NIST SPHERE file: {file_path}")
        header_size = int(f.read(8).strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", errors="replace")
        fields = {}
        for line in header.splitlines()[2:]:
            parts = line.split()
            if len(parts) >= 3:
                fields[parts[0]] = parts[2]
            if line.strip() == "end_head":
                break
        n_channels = int(fields.get("channel_count", 1))
        sample_rate = int(fields.get("sample_rate", 16000))
        sampwidth = int(fields.get("sample_n_bytes", 2))
        raw = f.read()
    audio = _decode_pcm(raw, sampwidth, n_channels)
    return audio, sample_rate, n_channels, sampwidth * 8, "SPHERE-PCM"


def load_audio(file_path: str, sum_channels: bool = False):
    """Load an audio file as float32 (channels, T) in [-1, 1] with metadata.

    WAV and NIST-SPHERE are decoded natively; other formats (e.g. FLAC) need
    ``soundfile`` which is imported lazily if present.
    """
    ext = os.path.splitext(file_path)[1].lower()
    if ext == ".wav":
        # TIMIT ships ".wav" files that are actually SPHERE; sniff the magic.
        with open(file_path, "rb") as f:
            magic = f.read(8)
        if magic.startswith(b"NIST_1A"):
            audio, sr, ch, bps, enc = _load_sphere(file_path)
        else:
            audio, sr, ch, bps, enc = _load_wav(file_path)
    elif ext in (".sph", ".nist"):
        audio, sr, ch, bps, enc = _load_sphere(file_path)
    else:
        try:
            import soundfile  # optional: not in the base image
        except ImportError as e:
            raise ValueError(
                f"Cannot decode {file_path}: only wav/sphere supported natively; install soundfile for {ext}."
            ) from e
        data, sr = soundfile.read(file_path, dtype="float32", always_2d=True)
        audio, ch, bps, enc = data.T, data.shape[1], 16, ext.lstrip(".").upper()

    if sum_channels:
        audio = audio.sum(axis=0)

    length = audio.shape[-1]
    metadata = AudioMetaData(
        sample_rate=sr, channels=ch, bits_per_sample=bps, encoding=enc, length=length, file_path=file_path
    )
    return audio, metadata


def load_text(file_path: str):
    with open(file_path, "r") as text_file:
        text = text_file.read()
    metadata = TextMetaData(
        length=len(text), char_length=len(text), word_length=len(text.split()), file_path=file_path
    )
    return text, metadata


def load_numpy(file_path: str, length_dim: int = 0, key: Optional[str] = None, dtype=None, **kwargs):
    """Load a npy or npz file (npz requires ``key``; object arrays become lists)."""
    array = np.load(file_path, **kwargs)

    if isinstance(array, np.ndarray):
        output = array
        length = output.shape[length_dim]
    elif key is not None:
        if array[key].dtype != np.dtype("O"):
            output = array[key]
            length = output.shape[length_dim]
        else:
            output = [np.asarray(a) for a in array[key]]
            length = [o.shape[length_dim] for o in output]
    else:
        output, length = array, None

    if dtype is not None and isinstance(output, np.ndarray):
        output = output.astype(dtype)

    metadata = MetaData(length=length, file_path=file_path)
    return output, metadata


def memoize(func: Callable):
    """Wrap ``func`` with a dict cache keyed by its single argument."""
    cache = dict()

    def memoized_func(example_id):
        if example_id in cache:
            return cache[example_id]
        result = func(example_id)
        cache[example_id] = result
        return result

    memoized_func.memory = cache
    return memoized_func


class Loader:
    def __init__(self, extension: Union[None, str], cache: bool = False):
        """Base loader keyed by file extension; optionally memoized."""
        self.extension = extension
        self.cache = False
        self.suffix = f"{os.extsep}{extension}" if extension is not None else ""
        self.id = str(uuid.uuid4())
        self.cached_files = set()
        if cache:
            self.enable_cache()

    def enable_cache(self):
        if not self.cache:
            self.cache = True
            self.load = memoize(self.load)

    def __call__(self, example_id):
        return self.load(example_id)

    def load(self, example_id):
        raise NotImplementedError

    def __repr__(self):
        name = self.__class__.__name__
        return f"{name}(extension={self.extension!r}, cache={self.cache}, id={self.id})"


class AudioLoader(Loader):
    def __init__(self, extension: Union[None, str], cache: bool = False, sum_channels: bool = True):
        super().__init__(extension=extension, cache=cache)
        self.sum_channels = sum_channels

    def load(self, example_id):
        file_path = example_id + self.suffix
        audio, metadata = load_audio(file_path, self.sum_channels)
        metadata.example_id = example_id
        return audio, metadata


class TextLoader(Loader):
    def load(self, example_id):
        file_path = example_id + self.suffix
        text, metadata = load_text(file_path)
        metadata.example_id = example_id
        return text, metadata

    def load_and_cache_batch(self, batch_id):
        """Load a text file with one example per line and cache each line."""
        if not self.cache:
            raise ValueError("Caching not enabled for loader.")
        file_path = batch_id + self.suffix
        if file_path in self.cached_files:
            return

        with open(file_path, "r") as text_file:
            strings = text_file.read().splitlines()

        batch_data = {}
        for idx, string in enumerate(strings):
            example_id = f"{batch_id}-{idx}"
            metadata = TextMetaData(
                length=len(string),
                char_length=len(string),
                word_length=len(string.split()),
                example_id=example_id,
                file_path=file_path,
                sub_id=idx,
            )
            batch_data[example_id] = (string, metadata)

        self.load.memory.update(batch_data)
        self.cached_files.add(file_path)


class NumpyLoader(Loader):
    def __init__(
        self,
        extension: Union[None, str],
        cache: bool = False,
        length_dim: int = 0,
        key: Optional[str] = None,
        dtype=None,
        **kwargs,
    ):
        super().__init__(extension=extension, cache=cache)
        self.length_dim = length_dim
        self.key = key
        self.dtype = dtype
        self.kwargs = kwargs

    def load(self, example_id):
        file_path = example_id + self.suffix
        array, metadata = load_numpy(file_path, self.length_dim, self.key, self.dtype, **self.kwargs)
        metadata.example_id = example_id
        return array, metadata

    def load_and_cache_batch(self, batch_id):
        """Load a numpy file with multiple examples along dim 0 and cache each."""
        if not self.cache:
            raise ValueError("Caching not enabled for loader.")
        file_path = batch_id + self.suffix
        if file_path in self.cached_files:
            return None

        arrays, _ = load_numpy(file_path, self.length_dim, self.key, self.dtype, **self.kwargs)

        batch_data = {}
        for idx in range(len(arrays)):
            example_id = f"{batch_id}-{idx}"
            array = arrays[idx]
            metadata = MetaData(
                length=array.shape[self.length_dim], example_id=example_id, file_path=file_path, sub_id=idx
            )
            batch_data[example_id] = (array, metadata)

        self.load.memory.update(batch_data)
        self.cached_files.add(file_path)
