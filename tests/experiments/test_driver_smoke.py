"""End-to-end driver smoke tests: synthetic wav dataset → full training loop
(data pipeline, bucketing, sharded train step, tracker, metrics.jsonl)."""

import csv
import importlib
import json
import os
import sys
import wave
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT / "experiments"))


def write_wav(path, samples, sample_rate=16000):
    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(data.tobytes())


@pytest.fixture
def synthetic_dataset(tmp_path):
    """Register a synthetic dataset ('synthetic') with train/valid/test splits."""
    from blvm_tpu.data.datapaths import DATAPATHS_MAPPING
    from blvm_tpu.data.datasets import DATASETS

    rng = np.random.default_rng(0)
    splits = {}
    for split, n in [("train", 8), ("valid", 2), ("test", 2)]:
        rows = []
        for i in range(n):
            length = int(rng.integers(2000, 4000))
            stem = tmp_path / f"{split}_{i}"
            write_wav(str(stem) + ".wav", rng.uniform(-0.5, 0.5, size=length))
            rows.append({"filename": str(stem), "length.wav.samples": length})
        source = tmp_path / f"{split}.txt"
        with open(source, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "length.wav.samples"])
            w.writeheader()
            w.writerows(rows)
        splits[split] = str(source)
        DATAPATHS_MAPPING[f"synthetic_{split}"] = str(source)

    DATASETS["synthetic"] = SimpleNamespace(
        name="synthetic",
        train="synthetic_train",
        valid="synthetic_valid",
        test="synthetic_test",
        valid_sets=["synthetic_valid"],
        test_sets=["synthetic_test"],
        audio_ext="wav",
        audio_length="length.wav.samples",
    )
    yield splits
    DATASETS.pop("synthetic", None)


class TestLSTMDriver:
    def test_end_to_end(self, synthetic_dataset, tmp_path, monkeypatch):
        run_dir = tmp_path / "run"
        argv = [
            "experiment_lstm_audio.py",
            "--dataset", "synthetic",
            "--epochs", "2",
            "--test_every", "1",
            "--batch_len", "1.0",  # seconds → 16000 samples (reference CLI semantics)
            "--stack_size", "8",
            "--hidden_size", "16",
            "--num_mix", "2",
            "--seed", "0",
            "--num_workers", "0",
            "--bucket_multiple", "512",
            "--n_devices", "2",
            "--run_dir", str(run_dir),
            "--save_checkpoints", "false",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        driver = importlib.import_module("experiment_lstm_audio")
        driver.main()

        # metrics.jsonl written with train + eval sources
        lines = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert len(lines) == 2  # one log per epoch
        assert "synthetic_train" in lines[0]
        assert "synthetic_test" in lines[0]
        assert np.isfinite(lines[0]["synthetic_train"]["loss"])
        assert "bpd" in lines[0]["synthetic_test"]
        # audio reconstructions logged
        wavs = list((run_dir / "audio").glob("*.wav"))
        assert len(wavs) > 0
