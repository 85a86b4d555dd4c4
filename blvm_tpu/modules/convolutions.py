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

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def depthwise_conv1d(x, kernel, stride: int = 1, padding: Tuple[int, int] = (0, 0), dilation: int = 1):
    """Depthwise 1-D conv as ``k`` shifted multiply-adds (channels-last).

    Semantically identical to ``jax.lax.conv_general_dilated(x, kernel,
    feature_group_count=C)`` (correlation, NWC/WIO), but deliberately avoids
    ``feature_group_count``:

    * TPU-idiomatic: a depthwise conv has no channel contraction, so it never
      uses the MXU — it IS ``k`` shifted elementwise FMAs on the VPU, and XLA
      fuses this unrolled form into a single pass over ``x``.
    * Correctness under SPMD: jax 0.9.0's partitioner computes a WRONG kernel
      gradient for grouped convs that feed another conv when the batch is
      sharded over one axis of a multi-axis mesh (replicated over the others)
      — f64-verified miscompile, see
      ``tests/modules/test_depthwise_spmd.py`` (the pinned repro). The
      shift-mul form contains no grouped conv and partitions correctly.

    ``x``: (B, T, C); ``kernel``: (k, 1, C) (the grouped-conv layout, kept for
    checkpoint compatibility); VALID output length after ``padding``.
    """
    k = kernel.shape[0]
    if padding[0] or padding[1]:
        x = jnp.pad(x, ((0, 0), tuple(padding), (0, 0)))
    span = dilation * (k - 1)
    out_len = (x.shape[1] - span - 1) // stride + 1
    y = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(x, j * dilation, j * dilation + (out_len - 1) * stride + 1, axis=1)
        if stride > 1:
            xs = xs[:, ::stride]
        term = xs * kernel[j, 0]
        y = term if y is None else y + term
    return y


def depthwise_conv_transpose1d(x, kernel, stride: int = 1, padding: int = 0, dilation: int = 1):
    """Depthwise ConvTranspose1d via zero-stuffing + :func:`depthwise_conv1d`.

    Exact torch geometry ``out = (T-1)·s − 2p + d·(k−1) + 1`` (flip kernel,
    full padding), matching the grouped ``lhs_dilation`` form it replaces —
    see :func:`depthwise_conv1d` for why grouped convs are avoided.
    """
    B, T, C = x.shape
    if stride > 1:
        # zero-stuff between frames: (B, T, C) -> (B, (T-1)*s + 1, C)
        x = jnp.pad(x[:, :, None, :], ((0, 0), (0, 0), (0, stride - 1), (0, 0)))
        x = x.reshape(B, T * stride, C)[:, : (T - 1) * stride + 1]
    full = dilation * (kernel.shape[0] - 1)
    return depthwise_conv1d(
        x, jnp.flip(kernel, axis=0), stride=1, padding=(full - padding, full - padding), dilation=dilation
    )

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
        y = depthwise_conv1d(
            x, kernel, stride=self.stride, padding=(self.padding, self.padding), dilation=self.dilation
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
        y = depthwise_conv_transpose1d(
            x, kernel, stride=self.stride, padding=self.padding, dilation=self.dilation
        )
        y = self.activation(y + bias)
        if self.use_norm:
            y = nn.GroupNorm(num_groups=C, epsilon=1e-5)(y)
        pw = self.param("pointwise_kernel", _conv_kernel_init, (C, self.out_channels))
        return jnp.dot(y, pw)
