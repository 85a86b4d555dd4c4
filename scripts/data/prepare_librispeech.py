"""Prepare LibriSpeech: download subsets from OpenSLR, restructure, split
transcripts into per-utterance files, write source CSVs.

Rebuild of reference ``scripts/data/prepare_librispeech.py``. LibriSpeech ships
FLAC; this environment has no FLAC decoder, so audio is converted to wav via
``ffmpeg`` if available (otherwise the flac files are kept and require
``soundfile`` at load time).
"""

import argparse
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request
from glob import glob

from blvm_tpu.settings import DATA_DIRECTORY, SOURCE_DIRECTORY

BASE_URL = "https://www.openslr.org/resources/12"
SUBSETS = [
    "train-clean-100",
    "train-clean-360",
    "train-other-500",
    "dev-clean",
    "dev-other",
    "test-clean",
    "test-other",
]


def download_and_extract(subset: str, data_dir: str):
    url = f"{BASE_URL}/{subset}.tar.gz"
    tar_path = os.path.join(data_dir, f"{subset}.tar.gz")
    if not os.path.exists(tar_path):
        print(f"Downloading {url}")
        urllib.request.urlretrieve(url, tar_path)
    print(f"Extracting {tar_path}")
    with tarfile.open(tar_path) as tar:
        tar.extractall(data_dir)


def flac_to_wav(flac_path: str) -> str:
    wav_path = flac_path[: -len(".flac")] + ".wav"
    if shutil.which("ffmpeg") and not os.path.exists(wav_path):
        subprocess.run(
            ["ffmpeg", "-loglevel", "error", "-y", "-i", flac_path, wav_path], check=True
        )
        os.remove(flac_path)
        return wav_path
    return flac_path


def split_transcripts(subset_dir: str):
    """Split each ``*.trans.txt`` into per-utterance ``.TXT`` files."""
    for trans in glob(os.path.join(subset_dir, "**", "*.trans.txt"), recursive=True):
        with open(trans) as f:
            for line in f:
                utt_id, _, text = line.partition(" ")
                out = os.path.join(os.path.dirname(trans), f"{utt_id}.TXT")
                with open(out, "w") as g:
                    g.write(text.strip())


def build_source_file(subset: str, data_dir: str, source_dir: str):
    from blvm_tpu.data.loaders import load_audio

    subset_dir = os.path.join(data_dir, "LibriSpeech", subset)
    audio_paths = sorted(
        glob(os.path.join(subset_dir, "**", "*.wav"), recursive=True)
        + glob(os.path.join(subset_dir, "**", "*.flac"), recursive=True)
    )
    header = "filename,length.wav.samples,length.txt.char,length.txt.word"
    lines = []
    for p in audio_paths:
        stem = os.path.splitext(p)[0]
        _, meta = load_audio(p)
        txt_path = stem + ".TXT"
        if os.path.exists(txt_path):
            text = open(txt_path).read()
            lc, lw = len(text), len(text.split())
        else:
            lc = lw = 0
        lines.append(f"{stem},{meta.length},{lc},{lw}")

    os.makedirs(source_dir, exist_ok=True)
    path = os.path.join(source_dir, f"{subset}.txt")
    with open(path, "w") as f:
        f.write("\n".join([header] + lines))
    print(f"Saved {path} ({len(lines)} examples)")
    return lines, header


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--subsets", nargs="+", default=SUBSETS)
    parser.add_argument("--convert_wav", action="store_true", help="convert flac to wav via ffmpeg")
    args = parser.parse_args()

    data_dir = os.path.join(str(DATA_DIRECTORY), "librispeech")
    source_dir = os.path.join(str(SOURCE_DIRECTORY), "librispeech")
    os.makedirs(data_dir, exist_ok=True)

    train_lines, header = [], None
    for subset in args.subsets:
        download_and_extract(subset, data_dir)
        subset_dir = os.path.join(data_dir, "LibriSpeech", subset)
        split_transcripts(subset_dir)
        if args.convert_wav:
            for flac in glob(os.path.join(subset_dir, "**", "*.flac"), recursive=True):
                flac_to_wav(flac)
        lines, header = build_source_file(subset, data_dir, source_dir)
        if subset.startswith("train"):
            train_lines += lines

    if train_lines:
        path = os.path.join(source_dir, "train.txt")
        with open(path, "w") as f:
            f.write("\n".join([header] + train_lines))
        print(f"Saved combined train source {path} ({len(train_lines)} examples)")


if __name__ == "__main__":
    main()
