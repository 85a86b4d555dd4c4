from blvm_tpu.modules.common import Dense, MLP, torch_bias_init, torch_kernel_init
from blvm_tpu.modules.distributions import (
    BernoulliDense,
    CategoricalDense,
    ConditionalDistribution,
    DiagonalGaussianDense,
    DiagonalGaussianMixtureDense,
    DiscretizedLogisticDense,
    DiscretizedLogisticMixtureDense,
    GaussianDense,
    IsotropicGaussianDense,
    get_likelihood_head,
)
from blvm_tpu.modules.activations import GatedTanhUnit, gated_tanh_unit
from blvm_tpu.modules.convenience import AddConstant, Permute, View
from blvm_tpu.modules.convolutions import ConvDepthwiseSeparable1d, ConvTransposeDepthwiseSeparable1d
from blvm_tpu.modules.dropout import TemporalDropout, WordDropout
from blvm_tpu.modules.lstm_block import LSTMBlock
from blvm_tpu.modules.recurrent import GRU, GRUCell, LSTM
from blvm_tpu.modules.rssm import RSSMCell
