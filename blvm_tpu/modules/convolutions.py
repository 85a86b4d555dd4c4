"""Depthwise-separable 1-D convolutions (reference
``blvm/modules/convolutions.py:6-104``).

Channels-last (B, T, C) rebuilds of ``ConvDepthwiseSeparable1d`` and
``ConvTransposeDepthwiseSeparable1d``: depthwise conv (one filter per channel,
bias) → activation → optional per-channel norm → pointwise 1×1 (no bias).
The transposed variant uses XLA's native input-dilation form of
``conv_general_dilated`` with torch ``ConvTranspose1d`` geometry
``out = (T-1)·s − 2p + d·(k−1) + 1``.

The Clockwork-VAE coders keep their own specialized block
(``models/clockwork_vae/conv_coders.py``) with fixed ReLU + GroupNorm; these
are the general, reusable modules matching the reference API.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch Conv1d default init: kaiming-uniform(a=sqrt(5)) == uniform with
# variance scale 1/3 over fan_in
_conv_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _depthwise_bias_init(k: int):
    # torch bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); depthwise fan_in = k
    bound = 1.0 / float(k) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvDepthwiseSeparable1d(nn.Module):
    """Depthwise (k, stride, dilation, groups=C) → act → [norm] → pointwise 1×1."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_norm: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        effective_k = self.dilation * (self.kernel_size - 1) + 1
        if x.shape[1] + 2 * self.padding < effective_k:
            # torch raises here; XLA would silently return a zero-length axis
            raise ValueError(
                f"Input length {x.shape[1]} (+2*{self.padding} padding) is shorter than the "
                f"effective kernel size {effective_k}"
            )
        kernel = self.param("depthwise_kernel", _conv_kernel_init, (self.kernel_size, 1, C))
        bias = self.param("depthwise_bias", _depthwise_bias_init(self.kernel_size), (C,))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        )
        y = self.activation(y + bias)
        if self.use_norm:
            y = nn.GroupNorm(num_groups=C, epsilon=1e-5)(y)
        pw = self.param("pointwise_kernel", _conv_kernel_init, (C, self.out_channels))
        return jnp.dot(y, pw)


class ConvTransposeDepthwiseSeparable1d(nn.Module):
    """Transposed depthwise (input-dilated) → act → [norm] → pointwise 1×1."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_norm: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("depthwise_kernel", _conv_kernel_init, (self.kernel_size, 1, C))
        bias = self.param("depthwise_bias", _depthwise_bias_init(self.kernel_size), (C,))
        k, d, p = self.kernel_size, self.dilation, self.padding
        full = d * (k - 1)  # "full" padding gives (T-1)*s + d(k-1) + 1 outputs
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(full - p, full - p)],
            lhs_dilation=(self.stride,),
            rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C,
        )
        y = self.activation(y + bias)
        if self.use_norm:
            y = nn.GroupNorm(num_groups=C, epsilon=1e-5)(y)
        pw = self.param("pointwise_kernel", _conv_kernel_init, (C, self.out_channels))
        return jnp.dot(y, pw)
