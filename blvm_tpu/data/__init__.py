from blvm_tpu.data.tokens import (
    BLANK_TOKEN,
    DELIMITER_TOKEN,
    END_TOKEN,
    ENGLISH_STANDARD,
    START_TOKEN,
    TIMIT_ALPHABET,
    TIMIT_PHONESET,
    UNKNOWN_TOKEN,
)
from blvm_tpu.data.token_map import TokenMap
from blvm_tpu.data.tokenizers import char_tokenizer, word_tokenizer
from blvm_tpu.data.text_cleaners import clean_timit
from blvm_tpu.data.loaders import (
    AudioLoader,
    AudioMetaData,
    Loader,
    MetaData,
    NumpyLoader,
    TextLoader,
    TextMetaData,
    load_audio,
    load_numpy,
    load_text,
)
from blvm_tpu.data.transforms import (
    Compose,
    Denormalize,
    EncodeInteger,
    DecodeInteger,
    LogMelSpectrogram,
    MuLawDecode,
    MuLawEncode,
    Normalize,
    Quantize,
    RandomSegment,
    StackTensor,
    TextCleaner,
    Transform,
)
from blvm_tpu.data.buckets import BucketSpec, bucket_length
from blvm_tpu.data.batchers import (
    Batcher,
    DynamicTensorBatcher,
    ListBatcher,
    TensorBatcher,
    TextBatcher,
)
from blvm_tpu.data.dataset import BaseDataset
from blvm_tpu.data.dataloader import DataLoader
from blvm_tpu.data.samplers import LengthEvalSampler, LengthTrainSampler
from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.data.datapaths import DATAPATHS_MAPPING
