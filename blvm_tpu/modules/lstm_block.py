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
from blvm_tpu.ops.sequence import sequence_mask


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
                # gather-free padding-preserving reverse: full flip moves valid
                # frames to [T-sl, T); the masked LSTM holds state over the
                # (flipped-mask) left padding, and flipping back re-aligns the
                # outputs at [0, sl) with zeros beyond — like torch's
                # pad_packed_sequence, and without the gather whose scatter-add
                # backward dominates the recurrence cost on TPU (see
                # models/srnn.py smoothing pass).
                x_flip = jnp.flip(x, axis=1)
                mask_flip = jnp.flip(mask, axis=1)
                bwd, _ = LSTM(hidden_size=self.hidden_size, name=f"bwd_{idx}")(x_flip, mask=mask_flip)
                bwd = jnp.flip(bwd, axis=1)
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
