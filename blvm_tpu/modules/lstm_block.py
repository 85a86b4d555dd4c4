"""Stacked (bi)LSTM block with temporal dropout.

Rebuild of reference ``blvm/modules/lstm_block.py`` on the scan-based LSTM
core: bidirectionality = a second LSTM over the padding-preserving reversed
sequence (outputs re-reversed), optional direction summing, per-layer
variational (fixed-over-time) or standard dropout. Batch-first (B, T, D) —
packed sequences are replaced by masking.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from blvm_tpu.modules.recurrent import LSTM
from blvm_tpu.ops.sequence import reverse_sequences, sequence_mask


class LSTMBlock(nn.Module):
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True
    sum_directions: bool = False
    dropout_prob: float = 0.40
    temporal_dropout: bool = True
    return_all: bool = False

    @nn.compact
    def __call__(self, x, x_sl, deterministic: bool = True):
        """x: (B, T, D); returns ((B, T, H or 2H), x_sl)."""
        if self.sum_directions and not self.bidirectional:
            raise ValueError("LSTM block must be bidirectional to sum directions.")

        mask = sequence_mask(x_sl, max_len=x.shape[1])
        outputs = []
        for idx in range(self.num_layers):
            fwd, _ = LSTM(hidden_size=self.hidden_size, name=f"fwd_{idx}")(x, mask=mask)
            if self.bidirectional:
                x_rev = reverse_sequences(x, x_sl)
                bwd, _ = LSTM(hidden_size=self.hidden_size, name=f"bwd_{idx}")(x_rev, mask=mask)
                bwd = reverse_sequences(bwd, x_sl)
                if self.sum_directions:
                    x = fwd + bwd
                else:
                    x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd

            if self.dropout_prob > 0 and not deterministic:
                rng = self.make_rng("dropout")
                keep_prob = 1.0 - self.dropout_prob
                if self.temporal_dropout:
                    keep = jax.random.bernoulli(rng, keep_prob, (x.shape[0], 1, x.shape[-1]))
                else:
                    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
                x = jnp.where(keep, x / keep_prob, 0.0)
            outputs.append(x)

        if self.return_all:
            return outputs, x_sl
        return x, x_sl
