"""Activations (reference ``blvm/modules/activations.py:5-13``)."""

import flax.linen as nn
import jax.numpy as jnp


def gated_tanh_unit(x, axis: int = -1):
    """WaveNet gate: split ``x`` in two along ``axis``, return tanh(a)·σ(b)."""
    a, b = jnp.split(x, 2, axis=axis)
    return jnp.tanh(a) * nn.sigmoid(b)


class GatedTanhUnit(nn.Module):
    axis: int = -1

    def __call__(self, x):
        return gated_tanh_unit(x, axis=self.axis)
