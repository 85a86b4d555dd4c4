"""Convenience modules: Permute, View, AddConstant
(reference ``blvm/modules/convenience.py:1-41``)."""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Permute(nn.Module):
    """Transpose the non-batch axes: ``Permute(1, 0)`` swaps (B, D, T) → (B, T, D)."""

    axes: Sequence[int]

    def __call__(self, x):
        batch_axes = (0,)
        return jnp.transpose(x, batch_axes + tuple(a + 1 for a in self.axes))


class View(nn.Module):
    """Reshape the non-batch dims (``n_batch_dims``-aware like the reference)."""

    shape: Sequence[int]
    n_batch_dims: int = 1

    def __call__(self, x):
        return x.reshape(x.shape[: self.n_batch_dims] + tuple(self.shape))


class AddConstant(nn.Module):
    constant: float

    def __call__(self, x):
        return x + self.constant
