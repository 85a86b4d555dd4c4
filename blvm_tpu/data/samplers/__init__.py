from blvm_tpu.data.samplers.length_samplers import LengthEvalSampler, LengthTrainSampler, parse_max_len
from blvm_tpu.data.samplers.utils import load_field
