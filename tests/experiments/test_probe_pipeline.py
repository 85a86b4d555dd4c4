"""End-to-end probe pipeline: save a VRNN checkpoint → dump_representations →
train the CTC probe on the dumped .npy features → resampling probe on the
frozen model (SURVEY §3.5, both stages)."""

import csv
import importlib
import json
import sys
import wave
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
def probe_env(tmp_path, monkeypatch):
    """Synthetic dataset rooted under a DATA_DIRECTORY-style layout + a trained
    (randomly initialized) VRNN checkpoint."""
    import blvm_tpu.settings as settings
    from blvm_tpu.data.datapaths import DATAPATHS_MAPPING
    from blvm_tpu.data.datasets import DATASETS

    data_dir = tmp_path / "data" / "synthetic"
    data_dir.mkdir(parents=True)
    monkeypatch.setattr(settings, "DATA_DIRECTORY", tmp_path / "data")

    rng = np.random.default_rng(0)
    phones = ["ah", "eh", "s", "t"]
    for split, n in [("train", 4), ("valid", 2), ("test", 2)]:
        rows = []
        for i in range(n):
            length = int(rng.integers(1500, 2500))
            stem = data_dir / f"{split}_{i}"
            write_wav(str(stem) + ".wav", rng.uniform(-0.5, 0.5, size=length))
            with open(str(stem) + ".PHN", "w") as f:
                f.write("\n".join(f"{j * 100} {(j + 1) * 100} {rng.choice(phones)}" for j in range(4)) + "\n")
            rows.append({"filename": str(stem), "length.wav.samples": length})
        source = tmp_path / f"{split}.txt"
        with open(source, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "length.wav.samples"])
            w.writeheader()
            w.writerows(rows)
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

    # save a small VRNN checkpoint (the "trained" LVM)
    from blvm_tpu.models import VRNNAudio

    model = VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=16, latent_size=4)
    x = jnp.zeros((1, 64))
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.array([64]))
    ckpt_dir = tmp_path / "vrnn_ckpt"
    model.save(str(ckpt_dir), variables["params"])

    yield SimpleNamespace(tmp_path=tmp_path, ckpt_dir=ckpt_dir, data_dir=data_dir)
    DATASETS.pop("synthetic", None)


class TestProbePipeline:
    def test_dump_then_probe_then_resample(self, probe_env, monkeypatch):
        # keep the dump script's datapath consistent with the patched settings
        import dump_representations as dump_mod

        monkeypatch.setattr(
            "blvm_tpu.settings.DATA_DIRECTORY", probe_env.tmp_path / "data", raising=False
        )
        monkeypatch.setattr(dump_mod, "DATA_DIRECTORY", str(probe_env.tmp_path / "data"), raising=False)

        # ---- stage 1: dump representations
        argv = [
            "dump_representations.py",
            "--dataset", "synthetic",
            "--model_dir", str(probe_env.ckpt_dir),
            "--model_tag", "vrnntest",
            "--num_samples", "2",
            "--num_workers", "0",
            "--seed", "0",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        dump_mod.main()

        npys = list(probe_env.data_dir.glob("*.vrnntest-z0-n2.npy"))
        assert len(npys) == 8  # all examples of all splits
        z = np.load(npys[0])
        assert z.ndim == 2 and z.shape[1] == 4  # (T', latent)

        # ---- stage 2a: CTC probe on the dumped representations
        run_dir = probe_env.tmp_path / "probe_run"
        argv = [
            "experiment_asr_ctc.py",
            "--dataset", "synthetic",
            "--data_type", "vrnntest-z0-n2.npy",
            "--text_type", "phon",
            "--epochs", "1",
            "--batch_len", "2",
            "--num_batches_per_epoch", "2",
            "--hidden_size", "8",
            "--seed", "0",
            "--num_workers", "0",
            "--n_devices", "1",
            "--run_dir", str(run_dir),
        ]
        monkeypatch.setattr(sys, "argv", argv)
        probe = importlib.import_module("experiment_asr_ctc")
        probe.main()
        lines = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert "wer" in lines[0]["synthetic_test"]

        # ---- stage 2b: resampling probe on the frozen model
        run_dir2 = probe_env.tmp_path / "resample_run"
        argv = [
            "experiment_asr_ctc_resampling.py",
            "--dataset", "synthetic",
            "--model_dir", str(probe_env.ckpt_dir),
            "--z_index", "0",
            "--text_type", "phon",
            "--epochs", "1",
            "--batch_len", "2",
            "--num_batches_per_epoch", "2",
            "--hidden_size", "8",
            "--seed", "0",
            "--num_workers", "0",
            "--run_dir", str(run_dir2),
        ]
        monkeypatch.setattr(sys, "argv", argv)
        resample = importlib.import_module("experiment_asr_ctc_resampling")
        resample.main()
        lines = [json.loads(l) for l in (run_dir2 / "metrics.jsonl").read_text().splitlines()]
        assert "wer" in lines[0]["synthetic_test"]
