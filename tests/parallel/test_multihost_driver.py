"""Multi-host as a DRIVER feature: ``experiment_lstm_audio.py`` itself runs on
a 2-process ``jax.distributed`` CPU cluster (1 device per process) and must
produce per-epoch train/eval losses identical to the single-process run on a
2-device mesh.

This is the end-to-end guarantee on top of the library-level smoke test
(``test_multihost.py``): coordinator join via driver flags, the global-batch
plan (same seeded samplers on every host), per-host row-block device placement
(``make_global_batch``), process-0-only JSONL/checkpoint writes — all through
the real CLI. Identical losses hold because the global batch COMPOSITION is
identical in both topologies; only which host materializes which rows differs.
"""

import csv
import json
import os
import socket
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]
DRIVER = REPO_ROOT / "experiments" / "experiment_lstm_audio.py"


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def write_wav(path, samples, sample_rate=16000):
    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(data.tobytes())


def fabricate_timit(root: Path):
    """A timit-shaped dataset under $BLVM_TPU_DATA_ROOT/source/timit."""
    src = root / "source" / "timit"
    src.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for split, n in [("train", 8), ("valid", 2), ("test", 2)]:
        rows = []
        for i in range(n):
            length = int(rng.integers(2000, 4000))
            stem = src / f"{split}_{i}"
            write_wav(str(stem) + ".wav", rng.uniform(-0.5, 0.5, size=length))
            rows.append({"filename": str(stem), "length.wav.samples": length})
        with open(src / f"{split}.txt", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "length.wav.samples"])
            w.writeheader()
            w.writerows(rows)


def driver_argv(run_dir: Path, num_workers: int = 0, extra=()):
    return [
        sys.executable,
        str(DRIVER),
        "--dataset", "timit",
        "--epochs", "2",
        "--test_every", "1",
        "--batch_len", "1.0",
        "--stack_size", "8",
        "--hidden_size", "16",
        "--num_mix", "2",
        "--seed", "0",
        "--num_workers", str(num_workers),
        "--bucket_multiple", "512",
        "--run_dir", str(run_dir),
        "--save_checkpoints", "false",
        *extra,
    ]


def base_env(data_root: Path):
    env = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_FLAGS", "JAX_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO_ROOT)
    env["BLVM_TPU_DATA_ROOT"] = str(data_root)
    return env


def read_losses(run_dir: Path):
    lines = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    return [
        {k: lines_k["loss"] for k, lines_k in line.items() if isinstance(lines_k, dict) and "loss" in lines_k}
        for line in lines
    ]


@pytest.mark.slow
@pytest.mark.parametrize(
    "n_procs,num_workers,extra",
    [
        (2, 0, ()),
        # round-3 verdict item 3, un-degraded multi-host: threaded loaders
        # (safe now that RandomSegment crops are per-example-deterministic —
        # the crop is live here via --random_segment_size), the IW bound, and
        # reconstruction logging all active on a 4-process cluster
        (4, 2, ("--random_segment_size", "1024", "--eval_iw_samples", "2")),
    ],
    ids=["2proc", "4proc-workers-iw-segment"],
)
def test_multi_process_driver_matches_single_process(tmp_path, n_procs, num_workers, extra):
    fabricate_timit(tmp_path)

    # --- single process, n virtual devices ---------------------------------
    run_single = tmp_path / "run_single"
    env = base_env(tmp_path)
    env_single = dict(env, XLA_FLAGS=f"--xla_force_host_platform_device_count={n_procs}")
    out = subprocess.run(
        driver_argv(run_single, num_workers, extra) + ["--n_devices", str(n_procs)],
        env=env_single, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, f"single-process driver failed:\n{out.stdout}\n{out.stderr}"

    # --- n processes, 1 device each, joined via the driver's dist flags -----
    run_multi = tmp_path / "run_multi"
    port = free_port()
    procs = [
        subprocess.Popen(
            driver_argv(run_multi, num_workers, extra)
            + [
                "--dist_coordinator", f"127.0.0.1:{port}",
                "--dist_num_processes", str(n_procs),
                "--dist_process_id", str(pid),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(n_procs)
    ]
    # generous timeout: under a full-suite run on a small host, 4 processes
    # each jit-compiling on CPU can take several minutes to reach the barrier
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"multi-host driver process failed:\n{o}"

    # process 0 is the system of record; other processes must write nothing
    assert (run_multi / "metrics.jsonl").exists()
    single, multi = read_losses(run_single), read_losses(run_multi)
    assert len(single) == len(multi) == 2
    for ep_s, ep_m in zip(single, multi):
        assert ep_s.keys() == ep_m.keys()
        for source in ep_s:
            np.testing.assert_allclose(ep_m[source], ep_s[source], rtol=1e-6, err_msg=source)

    if "--eval_iw_samples" in extra:
        # the IW bound must be logged under multi-host (round-3: disabled) and
        # equal the single-process value; reconstruction wavs must exist
        iw_key = "iw_2 (bpf)"
        for run in (run_single, run_multi):
            lines = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
            assert any(
                iw_key in v for line in lines for v in line.values() if isinstance(v, dict)
            ), f"{run}: IW metric missing"
        s_iw = [v[iw_key] for line in [json.loads(l) for l in (run_single / "metrics.jsonl").read_text().splitlines()] for v in line.values() if isinstance(v, dict) and iw_key in v]
        m_iw = [v[iw_key] for line in [json.loads(l) for l in (run_multi / "metrics.jsonl").read_text().splitlines()] for v in line.values() if isinstance(v, dict) and iw_key in v]
        np.testing.assert_allclose(m_iw, s_iw, rtol=1e-5)
        assert list((run_multi / "audio").glob("*.wav")), "multi-host reconstruction wavs missing"
