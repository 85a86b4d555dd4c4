from blvm_tpu.models.base import BaseModel, count_parameters, load_model
from blvm_tpu.models.wavenet import WaveNet
from blvm_tpu.models.lstm import LSTMAudio
