"""Prepare the TIMIT dataset (pre-downloaded; TIMIT is commercial).

Rebuild of reference ``scripts/data/prepare_timit.py``: verify the unpacked
layout, build source CSVs with audio/text lengths, create a seeded
231-utterance validation split, assert the canonical counts (1680/4620).
Audio is read with the native wav/SPHERE decoder (no torchaudio).
"""

import os
import random
import sys
from glob import glob

from blvm_tpu.data.loaders import load_audio
from blvm_tpu.settings import DATA_DIRECTORY, SOURCE_DIRECTORY

SUBSETS = [("test", "test"), ("train_all", "train")]

VALIDATION_SPLIT_SEED = 0
VALIDATION_SPLIT_SIZE = 231  # 5% of train subset


def main():
    data_dir = os.path.join(str(DATA_DIRECTORY), "timit")
    source_dir = os.path.join(str(SOURCE_DIRECTORY), "timit")

    assert os.path.exists(data_dir), "TIMIT dataset must already be downloaded."
    assert not os.path.exists(source_dir), "Dataset already exists in source directory."
    os.makedirs(source_dir, exist_ok=True)

    audio_ext = "wav"
    header = "filename,length.wav.samples,length.txt.char,length.txt.word"

    subset_filepaths = dict()
    source_file_lines = dict()
    for subset, subset_dir in SUBSETS:
        subset_data_dir = os.path.join(data_dir, subset_dir)
        audio_filepaths = sorted(glob(os.path.join(subset_data_dir, f"**/*.{audio_ext}"), recursive=True))
        if not audio_filepaths:
            audio_filepaths = sorted(glob(os.path.join(subset_data_dir, "**/*.WAV"), recursive=True))
        txt_filepaths = sorted(glob(os.path.join(subset_data_dir, "**/*.TXT"), recursive=True))
        assert len(audio_filepaths) == len(txt_filepaths)
        assert len(set(audio_filepaths)) == len(audio_filepaths)

        subset_filepaths[subset] = [os.path.splitext(fp)[0] for fp in audio_filepaths]

        source_file_lines[subset] = []
        for file_path, audio_path in zip(subset_filepaths[subset], audio_filepaths):
            _, meta = load_audio(audio_path)
            length_samples = meta.length

            with open(file_path + ".TXT", "r") as f:
                txt = f.read().split()[2:]  # strip alignment prefix
                length_char = len(" ".join(txt))
                length_word = len(txt)

            source_file_lines[subset].append(f"{file_path},{length_samples},{length_char},{length_word}")

        source_file_path = os.path.join(source_dir, f"{subset}.txt")
        content = "\n".join([header] + source_file_lines[subset])
        with open(source_file_path, "w") as f:
            f.write(content)
        print(f"Saved source file at {source_file_path} of size {sys.getsizeof(content)} bytes")

    assert len(subset_filepaths["test"]) == 1680
    assert len(subset_filepaths["train_all"]) == 4620

    print(f"Creating validation split of {VALIDATION_SPLIT_SIZE} samples with seed {VALIDATION_SPLIT_SEED}")
    random.seed(VALIDATION_SPLIT_SEED)
    lines_valid = set(random.sample(source_file_lines["train_all"], VALIDATION_SPLIT_SIZE))
    lines_train = set(source_file_lines["train_all"]) - lines_valid

    lines_test = set(source_file_lines["test"])
    assert not (lines_train & lines_test) and not (lines_valid & lines_test)
    assert not any("test" in f for f in lines_train | lines_valid)

    for subset, lines in [("train", sorted(lines_train)), ("valid", sorted(lines_valid))]:
        path = os.path.join(source_dir, f"{subset}.txt")
        with open(path, "w") as f:
            f.write("\n".join([header] + lines))
        print(f"Saved source file at {path}")

    # the full (train+valid) training source
    with open(os.path.join(source_dir, "train_full.txt"), "w") as f:
        f.write("\n".join([header] + sorted(source_file_lines["train_all"])))

    print("\nTIMIT dataset successfully processed!")


if __name__ == "__main__":
    main()
