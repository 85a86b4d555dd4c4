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
    # Run both directions of a layer in ONE lax.scan with a direction-batched
    # (2, B, H) carry — halves the sequential step count, which dominates the
    # CTC probe's step time (the per-step matmuls are far below MXU
    # saturation). Same math per direction (torch gate order, masked carry),
    # same parameter structure (the fwd_i/bwd_i LSTM submodules still own the
    # weights — checkpoints are unaffected). False falls back to two scans.
    fuse_directions: bool = True
    unroll: int = 1  # scan unroll factor (TPU scheduling knob, same math)

    @nn.compact
    def __call__(self, x, x_sl, deterministic: bool = True):
        """x: (B, T, D); returns ((B, T, H or 2H), x_sl)."""
        if self.sum_directions and not self.bidirectional:
            raise ValueError("LSTM block must be bidirectional to sum directions.")

        mask = sequence_mask(x_sl, max_len=x.shape[1])
        outputs = []
        for idx in range(self.num_layers):
            if self.bidirectional and self.fuse_directions:
                fwd, bwd = self._fused_bidirectional(x, mask, idx)
                x = fwd + bwd if self.sum_directions else jnp.concatenate([fwd, bwd], axis=-1)
            elif self.bidirectional:
                fwd, _ = LSTM(hidden_size=self.hidden_size, unroll=self.unroll, name=f"fwd_{idx}")(x, mask=mask)
                # gather-free padding-preserving reverse: full flip moves valid
                # frames to [T-sl, T); the masked LSTM holds state over the
                # (flipped-mask) left padding, and flipping back re-aligns the
                # outputs at [0, sl) with zeros beyond — like torch's
                # pad_packed_sequence, and without the gather whose scatter-add
                # backward dominates the recurrence cost on TPU (see
                # models/srnn.py smoothing pass).
                x_flip = jnp.flip(x, axis=1)
                mask_flip = jnp.flip(mask, axis=1)
                bwd, _ = LSTM(hidden_size=self.hidden_size, unroll=self.unroll, name=f"bwd_{idx}")(x_flip, mask=mask_flip)
                bwd = jnp.flip(bwd, axis=1)
                if self.sum_directions:
                    x = fwd + bwd
                else:
                    x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                fwd, _ = LSTM(hidden_size=self.hidden_size, unroll=self.unroll, name=f"fwd_{idx}")(x, mask=mask)
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

    def _fused_bidirectional(self, x, mask, idx):
        """Both directions of layer ``idx`` in one scan.

        The fwd/bwd LSTM submodules are instantiated (T=1 dummy call — dead
        code under jit, kept only for its parameter side effect) so the
        parameter tree is identical to the two-scan path; their weights are
        then stacked on a leading direction axis and the recurrence runs once
        with a (2, B, H) carry. The backward direction consumes the
        full-flipped sequence with the flipped mask (see the two-scan branch
        for why this reproduces pad_packed_sequence semantics) and its outputs
        are flipped back. Per-direction math is the LSTM cell's, step for
        step; only the matmul is direction-batched.
        """
        H = self.hidden_size
        B, T = x.shape[0], x.shape[1]
        fwd_mod = LSTM(hidden_size=H, name=f"fwd_{idx}")
        bwd_mod = LSTM(hidden_size=H, name=f"bwd_{idx}")
        _ = fwd_mod(x[:, :1])
        _ = bwd_mod(x[:, :1])
        pf = fwd_mod.variables["params"]
        pb = bwd_mod.variables["params"]
        w_ih = jnp.stack([pf["w_ih_0"], pb["w_ih_0"]])  # (2, D, 4H)
        b_ih = jnp.stack([pf["b_ih_0"], pb["b_ih_0"]])  # (2, 4H)
        w_hh = jnp.stack([pf["w_hh_0"], pb["w_hh_0"]])  # (2, H, 4H)
        b_hh = jnp.stack([pf["b_hh_0"], pb["b_hh_0"]])  # (2, 4H)

        x2 = jnp.stack([x, jnp.flip(x, axis=1)])  # (2, B, T, D)
        m2 = jnp.stack([mask, jnp.flip(mask, axis=1)]).astype(x.dtype)  # (2, B, T)

        # time-parallel input projection for both directions at once
        xw = jnp.einsum("dbtf,dfk->dbtk", x2, w_ih) + b_ih[:, None, None]
        xw_t = jnp.transpose(xw, (2, 0, 1, 3))  # (T, 2, B, 4H)
        m_t = jnp.transpose(m2, (2, 0, 1))[..., None]  # (T, 2, B, 1)

        def step(carry, inputs):
            h, c = carry
            xw_i, m = inputs
            gates = xw_i + jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            h = m * h_new + (1 - m) * h
            c = m * c_new + (1 - m) * c
            return (h, c), h_new * m

        h0 = jnp.zeros((2, B, H), x.dtype)
        _, out_t = jax.lax.scan(step, (h0, h0), (xw_t, m_t), unroll=self.unroll)
        out = jnp.transpose(out_t, (1, 2, 0, 3))  # (2, B, T, H)
        return out[0], jnp.flip(out[1], axis=1)
