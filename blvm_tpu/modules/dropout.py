"""Dropout variants (reference ``blvm/modules/dropout.py``).

``WordDropout`` zeroes whole timesteps (reference ``dropout.py:42``); the
"temporal/variational" dropout of ``Dropout1dPackedData`` (fixed mask over
time) is provided by :class:`TemporalDropout` operating on dense (B, T, D)
batches — packed sequences do not exist in this framework (masking replaces
packing under static shapes).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class WordDropout(nn.Module):
    """Zero out entire timesteps with probability ``rate`` (train only)."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic=None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.shape[:2] + (1,) * (x.ndim - 2))
        return x * keep


class TemporalDropout(nn.Module):
    """Variational dropout: one feature mask per sequence, shared across time.

    Scales kept units by 1/keep_prob (inverted dropout), matching torch
    semantics of ``Dropout1d`` applied with a fixed mask over time.
    """

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic=None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep_prob = 1.0 - self.rate
        # mask shape (B, 1, D): constant over the time axis
        keep = jax.random.bernoulli(rng, keep_prob, (x.shape[0], 1, x.shape[-1]))
        return jnp.where(keep, x / keep_prob, 0.0)
