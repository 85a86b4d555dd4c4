from blvm_tpu.models.base import BaseModel, count_parameters, load_model
from blvm_tpu.models.wavenet import WaveNet
from blvm_tpu.models.lstm import LSTMAudio
from blvm_tpu.models.vrnn import VRNN, VRNNAudio
from blvm_tpu.models.srnn import SRNN, SRNNAudio
from blvm_tpu.models.stcn import STCN
from blvm_tpu.models.clockwork_vae import CWVAE, CWVAEAudio
from blvm_tpu.models.lstm_asr import SimpleLSTMASR
