"""Dataset registry: names → splits/extension/length-field (reference ``blvm/data/datasets.py``).

Audio extension is ``wav`` (decoded natively — no FLAC decoder in this image;
the prep scripts keep audio as PCM wav; reference used flac via torchaudio).
"""

import os
from types import SimpleNamespace

from blvm_tpu.data.datapaths import (
    LIBRILIGHT_TRAIN_10H,
    LIBRISPEECH,
    LIBRISPEECH_100H,
    LIBRISPEECH_DEV_CLEAN,
    LIBRISPEECH_DEV_OTHER,
    LIBRISPEECH_TEST_CLEAN,
    LIBRISPEECH_TEST_OTHER,
    LIBRISPEECH_TRAIN,
    LIBRISPEECH_TRAIN_CLEAN_100,
    TIMIT,
    TIMIT_TEST,
    TIMIT_TRAIN,
    TIMIT_VALID,
)
from blvm_tpu.settings import DATA_DIRECTORY

AUDIO_EXT = "wav"
AUDIO_LENGTH_FIELD = f"length.{AUDIO_EXT}.samples"

DATASETS = {
    TIMIT: SimpleNamespace(
        name=TIMIT,
        train=TIMIT_TRAIN,
        valid=TIMIT_VALID,
        test=TIMIT_TEST,
        valid_sets=[TIMIT_VALID],
        test_sets=[TIMIT_TEST],
        audio_ext=AUDIO_EXT,
        audio_length=AUDIO_LENGTH_FIELD,
        speaker_info=os.path.join(str(DATA_DIRECTORY), TIMIT, "DOC", "SPKRINFO.TXT"),
    ),
    LIBRISPEECH: SimpleNamespace(
        name=LIBRISPEECH,
        train=LIBRISPEECH_TRAIN,
        valid=LIBRISPEECH_DEV_CLEAN,
        test=LIBRISPEECH_TEST_CLEAN,
        valid2=LIBRISPEECH_DEV_OTHER,
        test2=LIBRISPEECH_TEST_OTHER,
        valid_sets=[LIBRISPEECH_DEV_CLEAN, LIBRISPEECH_DEV_OTHER],
        test_sets=[LIBRISPEECH_TEST_CLEAN, LIBRISPEECH_TEST_OTHER],
        audio_ext=AUDIO_EXT,
        audio_length=AUDIO_LENGTH_FIELD,
    ),
    LIBRISPEECH_100H: SimpleNamespace(
        name=LIBRISPEECH_100H,
        train=LIBRISPEECH_TRAIN_CLEAN_100,
        valid=LIBRISPEECH_DEV_CLEAN,
        test=LIBRISPEECH_TEST_CLEAN,
        valid2=LIBRISPEECH_DEV_OTHER,
        test2=LIBRISPEECH_TEST_OTHER,
        valid_sets=[LIBRISPEECH_DEV_CLEAN, LIBRISPEECH_DEV_OTHER],
        test_sets=[LIBRISPEECH_TEST_CLEAN, LIBRISPEECH_TEST_OTHER],
        audio_ext=AUDIO_EXT,
        audio_length=AUDIO_LENGTH_FIELD,
    ),
    LIBRILIGHT_TRAIN_10H: SimpleNamespace(
        name=LIBRILIGHT_TRAIN_10H,
        train=LIBRILIGHT_TRAIN_10H,
        valid=LIBRISPEECH_DEV_CLEAN,
        test=LIBRISPEECH_TEST_CLEAN,
        valid2=LIBRISPEECH_DEV_OTHER,
        test2=LIBRISPEECH_TEST_OTHER,
        valid_sets=[LIBRISPEECH_DEV_CLEAN, LIBRISPEECH_DEV_OTHER],
        test_sets=[LIBRISPEECH_TEST_CLEAN, LIBRISPEECH_TEST_OTHER],
        audio_ext=AUDIO_EXT,
        audio_length=AUDIO_LENGTH_FIELD,
    ),
}
