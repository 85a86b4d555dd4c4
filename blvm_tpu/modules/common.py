"""Shared NN building blocks: torch-calibrated Dense and MLP.

The reference's layers are ``nn.Linear`` with PyTorch's default init
(kaiming-uniform kernel, uniform bias, both scaled by 1/sqrt(fan_in)). flax's
default is lecun-normal; to keep training dynamics comparable we default to the
torch distributions here. MXU note: feature sizes in this codebase are small
(≤512); XLA pads to MXU tiles — keeping everything as plain Dense matmuls lets
batches*time fold into the leading dim and saturate the 128×128 systolic array.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# U(-sqrt(1/fan_in), sqrt(1/fan_in)): torch nn.Linear kernel default
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: Optional[int] = None):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear bias default."""
    if fan_in is None:
        raise ValueError("fan_in required")
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nn.Module):
    """``nn.Linear`` equivalent with torch default initialization."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype or x.dtype), kernel.astype(self.dtype or kernel.dtype))
        if self.use_bias:
            bias = self.param("bias", lambda k, s: torch_bias_init(k, s, fan_in=fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class MLP(nn.Module):
    """Stack of Dense layers with activation between (and optionally after).

    Mirrors the reference's 3-layer MLP encoders/decoders (e.g.
    ``blvm/models/lstm.py:44-56``): activation after every layer including the
    last unless ``activate_final=False``.
    """

    features: Sequence[int]
    activation: Callable = nn.tanh
    activate_final: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, feat in enumerate(self.features):
            x = Dense(feat, dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x
