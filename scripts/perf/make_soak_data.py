"""Fabricate the soak dataset: TIMIT-shaped CSV tree of synthetic harmonic clips.

Creates ``$BLVM_TPU_DATA_ROOT/source/timit/{train,valid,test}.txt`` plus the
referenced 16 kHz mono PCM16 wavs — the layout the drivers resolve through
``blvm_tpu/data/datapaths.py`` (reference layout: /root/reference/blvm/data/
datapaths.py source CSVs). Clips are sums of 3-6 random harmonics with a
random fundamental and a decaying envelope, 16-24k samples each, so the model
has real low-entropy structure to fit (white noise would pin the DMoL loss at
its entropy floor and hide training progress).

Usage: BLVM_TPU_DATA_ROOT=/tmp/soak_data python scripts/perf/make_soak_data.py \
    [--train 160] [--valid 16] [--test 16] [--seed 0]
"""

import argparse
import os
import pathlib
import wave

import numpy as np

SAMPLE_RATE = 16000


def harmonic_clip(rng: np.random.Generator, n: int) -> np.ndarray:
    t = np.arange(n) / SAMPLE_RATE
    f0 = rng.uniform(80.0, 400.0)
    x = np.zeros(n)
    for k in range(1, int(rng.integers(3, 7)) + 1):
        x += rng.uniform(0.2, 1.0) / k * np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
    x *= np.exp(-t / rng.uniform(0.5, 2.0))  # decaying envelope
    x += 0.01 * rng.standard_normal(n)  # sensor-noise floor
    return (0.7 * x / np.max(np.abs(x)) * 32767).astype(np.int16)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train", type=int, default=160)
    parser.add_argument("--valid", type=int, default=16)
    parser.add_argument("--test", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    data_root = os.environ.get("BLVM_TPU_DATA_ROOT")
    if not data_root:
        raise SystemExit("set BLVM_TPU_DATA_ROOT to the target data root")
    root = pathlib.Path(data_root) / "source" / "timit"
    root.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    for split, n_clips in [("train", args.train), ("valid", args.valid), ("test", args.test)]:
        rows = ["filename,length.wav.samples"]
        for i in range(n_clips):
            n = int(rng.integers(16000, 24000))
            stem = root / f"{split}_{i:04d}"
            with wave.open(str(stem) + ".wav", "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SAMPLE_RATE)
                w.writeframes(harmonic_clip(rng, n).tobytes())
            rows.append(f"{stem},{n}")
        (root / f"{split}.txt").write_text("\n".join(rows) + "\n")
        print(f"{split}: {n_clips} clips")


if __name__ == "__main__":
    main()
