from blvm_tpu.models.clockwork_vae.conv_coders import BlockSeparable, BlockSimple, ConvCoder1d, TemporalResidual
from blvm_tpu.models.clockwork_vae.clockwork_vae import CWVAE, CWVAEAudio
