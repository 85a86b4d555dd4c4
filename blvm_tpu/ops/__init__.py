from blvm_tpu.ops.likelihoods import (
    gaussian_ll,
    gaussian_mixture_ll,
    categorical_ll,
    bernoulli_ll,
    discretized_logistic_ll,
    discretized_logistic_mixture_ll,
)
from blvm_tpu.ops.variational import (
    kl_divergence_gaussian,
    kl_divergence_gaussian_mc,
    discount_free_nats,
    precision_weighted_gaussian,
    rsample_gaussian,
    rsample_gaussian_mixture,
    rsample_gumbel,
    rsample_gumbel_softmax,
    rsample_logistic,
    rsample_discretized_logistic,
    rsample_discretized_logistic_mixture,
)
from blvm_tpu.ops.sequence import (
    sequence_mask,
    stack_tensor,
    unstack_tensor,
    reverse_sequences,
    split_sequence,
    split_lengths,
    update_running_variance,
)
from blvm_tpu.ops.padding import (
    get_length_padding,
    get_modulo_padding,
    get_modulo_length,
    get_same_padding,
    get_same_padding_transposed,
    split_padding_left_right,
    pad_axis,
    pad_to_length,
    pad_modulo,
    pad_same,
)
from blvm_tpu.ops.conv_arithmetic import (
    ConvAttributes,
    compute_conv_attributes_single,
    compute_conv_attributes,
)
