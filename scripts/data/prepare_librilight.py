"""Prepare the LibriLight finetuning split and build 10m/1h/10h subsets.

Rebuild of reference ``scripts/data/prepare_librilight.py``: downloads
``librispeech_finetuning`` and builds the overlapping subsets — 10h = the six
``1h/{0..5}`` folders plus ``9h``; 1h = the six 10m folders; six individual
10m subsets.
"""

import os
import tarfile
import urllib.request
from glob import glob

from blvm_tpu.settings import DATA_DIRECTORY, SOURCE_DIRECTORY

URL = "https://dl.fbaipublicfiles.com/librilight/data/librispeech_finetuning.tgz"


def build_source(paths, out_path, header="filename,length.wav.samples"):
    from blvm_tpu.data.loaders import load_audio

    lines = []
    for p in sorted(paths):
        stem = os.path.splitext(p)[0]
        _, meta = load_audio(p)
        lines.append(f"{stem},{meta.length}")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join([header] + lines))
    print(f"Saved {out_path} ({len(lines)} examples)")


def main():
    data_dir = os.path.join(str(DATA_DIRECTORY), "librilight")
    source_dir = os.path.join(str(SOURCE_DIRECTORY), "librilight")
    os.makedirs(data_dir, exist_ok=True)

    tar_path = os.path.join(data_dir, "librispeech_finetuning.tgz")
    if not os.path.exists(tar_path):
        print(f"Downloading {URL}")
        urllib.request.urlretrieve(URL, tar_path)
        with tarfile.open(tar_path) as tar:
            tar.extractall(data_dir)

    root = os.path.join(data_dir, "librispeech_finetuning")

    def audio_in(*parts):
        return glob(os.path.join(root, *parts, "**", "*.flac"), recursive=True) + glob(
            os.path.join(root, *parts, "**", "*.wav"), recursive=True
        )

    # 10h = 1h/{0..5} + 9h
    build_source(audio_in("1h") + audio_in("9h"), os.path.join(source_dir, "train-10h.txt"))
    # 1h = 1h/{0..5}
    build_source(audio_in("1h"), os.path.join(source_dir, "train-1h.txt"))
    # individual 10m folds
    for i in range(6):
        build_source(audio_in("1h", str(i)), os.path.join(source_dir, f"train-10m-{i}.txt"))


if __name__ == "__main__":
    main()
