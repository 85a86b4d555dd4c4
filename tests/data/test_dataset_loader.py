"""End-to-end data pipeline tests on a synthetic on-disk wav dataset."""

import csv
import os
import wave

import numpy as np
import pytest

from blvm_tpu.data import (
    AudioLoader,
    BaseDataset,
    Compose,
    DataLoader,
    DynamicTensorBatcher,
    LengthEvalSampler,
    ListBatcher,
    MuLawEncode,
    TextBatcher,
    TextLoader,
    TokenMap,
    char_tokenizer,
)
from blvm_tpu.data.loaders import load_audio
from blvm_tpu.data.transforms import EncodeInteger
from blvm_tpu.data.tokens import ENGLISH_STANDARD


def write_wav(path, samples, sample_rate=16000):
    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(data.tobytes())


@pytest.fixture
def wav_dataset(tmp_path):
    """Five wav files + transcripts + a source CSV; returns (source_path, lengths)."""
    rng = np.random.default_rng(0)
    lengths = [1600, 2400, 800, 3200, 1200]
    rows = []
    for i, n in enumerate(lengths):
        stem = tmp_path / f"ex{i}"
        write_wav(str(stem) + ".wav", rng.uniform(-0.5, 0.5, size=n))
        with open(str(stem) + ".txt", "w") as f:
            f.write("hello world")
        rows.append({"filename": str(stem), "length": n})

    source = tmp_path / "source.txt"
    with open(source, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["filename", "length"])
        writer.writeheader()
        writer.writerows(rows)
    return str(source), lengths


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        x = np.linspace(-0.9, 0.9, 1000)
        path = tmp_path / "t.wav"
        write_wav(path, x)
        audio, meta = load_audio(str(path))
        assert meta.sample_rate == 16000
        assert meta.length == 1000
        np.testing.assert_allclose(audio[0], x, atol=1e-4)


class TestBaseDataset:
    def test_getitem_single_modality(self, wav_dataset):
        source, lengths = wav_dataset
        ds = BaseDataset(source, [(AudioLoader("wav"), None, DynamicTensorBatcher())])
        x, meta = ds[0]
        assert x.shape == (lengths[0],)
        assert meta.length == lengths[0]

    def test_collate_sorts_and_pads(self, wav_dataset):
        source, lengths = wav_dataset
        ds = BaseDataset(source, [(AudioLoader("wav"), None, DynamicTensorBatcher())])
        (batch, sl), meta = ds.collate([ds[i] for i in range(3)])
        assert batch.shape == (3, max(lengths[:3]))
        assert list(sl) == sorted(lengths[:3], reverse=True)

    def test_two_modalities(self, wav_dataset):
        source, lengths = wav_dataset
        token_map = TokenMap(ENGLISH_STANDARD, add_blank=True)
        enc = EncodeInteger(char_tokenizer, token_map)
        ds = BaseDataset(
            source,
            [
                (AudioLoader("wav"), MuLawEncode(8), DynamicTensorBatcher()),
                (TextLoader("txt"), Compose(enc), TextBatcher()),
            ],
        )
        outputs, meta = ds.collate([ds[i] for i in range(2)])
        (audio, audio_sl), (text, text_sl) = outputs
        assert audio.shape[0] == text.shape[0] == 2
        assert text.dtype == np.int64

    def test_transforms_toggle(self, wav_dataset):
        source, _ = wav_dataset
        ds = BaseDataset(source, [(AudioLoader("wav"), MuLawEncode(8), DynamicTensorBatcher())])
        x1, _ = ds[0]
        ds.disable_transforms()
        x0, _ = ds[0]
        assert not np.allclose(x0, x1)

    def test_compute_statistics(self, wav_dataset):
        source, _ = wav_dataset
        ds = BaseDataset(source, [(AudioLoader("wav"), None, ListBatcher())])
        mean, var = ds.compute_statistics()
        all_x = np.concatenate([np.asarray(ds[i][0]) for i in range(len(ds))])
        np.testing.assert_allclose(mean, all_x.mean(), atol=1e-5)
        np.testing.assert_allclose(var, all_x.var(ddof=1), rtol=1e-4)


class TestDataLoader:
    def test_sampler_driven_iteration(self, wav_dataset):
        source, lengths = wav_dataset
        ds = BaseDataset(source, [(AudioLoader("wav"), None, DynamicTensorBatcher())])
        sampler = LengthEvalSampler(source, field="length", batch_len=5000)
        loader = DataLoader(ds, batch_sampler=sampler, num_workers=2)
        n_examples = sum(batch.shape[0] for (batch, sl), meta in loader)
        assert n_examples == len(lengths)

    def test_workers_match_sync(self, wav_dataset):
        source, _ = wav_dataset
        ds = BaseDataset(source, [(AudioLoader("wav"), None, DynamicTensorBatcher())])
        sampler = LengthEvalSampler(source, field="length", batch_len=5000)
        sync = [b for (b, sl), m in DataLoader(ds, batch_sampler=sampler, num_workers=0)]
        threaded = [b for (b, sl), m in DataLoader(ds, batch_sampler=sampler, num_workers=3)]
        assert len(sync) == len(threaded)
        for a, b in zip(sync, threaded):
            np.testing.assert_array_equal(a, b)
