from blvm_tpu.models.wavenet.modules import (
    CausalConv1d,
    Conv1dResidualGLU,
    PointwiseTransform,
    ResidualStack,
)
from blvm_tpu.models.wavenet.wavenet import InputSizeError, WaveNet
