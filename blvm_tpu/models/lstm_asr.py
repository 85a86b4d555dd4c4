"""SimpleLSTMASR — CTC probe classifier over representations/spectrograms.

Rebuild of reference ``blvm/models/lstm_asr.py:14-84``: LSTMBlock → linear →
log-softmax → CTC loss; greedy CTC decode to hypotheses; WER/CER via edit
distance. The CTC loss is ``optax.ctc_loss`` (jit-compiled on device); decoding
and error rates run host-side via :meth:`build_metrics` with the token map.
"""

from types import SimpleNamespace
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from blvm_tpu.data.token_map import TokenMap
from blvm_tpu.data.tokenizers import char_tokenizer, word_tokenizer
from blvm_tpu.evaluation.metrics import ErrorRateMetric, LossMetric
from blvm_tpu.models.base import BaseModel
from blvm_tpu.modules.common import Dense
from blvm_tpu.modules.lstm_block import LSTMBlock
from blvm_tpu.utils.decoding import greedy_ctc


class SimpleLSTMASR(BaseModel):
    """The vocabulary is stored as a tuple field (JSON-serializable for
    checkpointing); blank must be at ``blank_index`` (TokenMap puts it at 0)."""

    vocab: Sequence[str]
    input_size: int = 80
    hidden_size: int = 256
    num_layers: int = 1
    bidirectional: bool = False
    sum_directions: bool = False
    dropout_prob: float = 0.0
    temporal_dropout: bool = True
    blank_index: int = 0
    unroll: int = 1  # time-scan unroll factor (TPU scheduling knob, same math)

    @classmethod
    def from_token_map(cls, token_map: TokenMap, **kwargs):
        from blvm_tpu.data.tokens import BLANK_TOKEN

        return cls(vocab=tuple(token_map.tokens), blank_index=token_map.token2index[BLANK_TOKEN], **kwargs)

    def token_map(self) -> TokenMap:
        tm = TokenMap.__new__(TokenMap)
        tm.tokens = list(self.vocab)
        tm.token2index = {t: i for i, t in enumerate(tm.tokens)}
        tm.index2token = {i: t for i, t in enumerate(tm.tokens)}
        tm.add_unknown = False
        tm.prefix = tm.suffix = ""
        return tm

    def setup(self):
        self.lstm = LSTMBlock(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            sum_directions=self.sum_directions,
            dropout_prob=self.dropout_prob,
            temporal_dropout=self.temporal_dropout,
            unroll=self.unroll,
        )
        self.output = Dense(len(self.vocab))

    def __call__(self, x, x_sl, y, y_sl, deterministic: bool = True):
        """x: features (B, T, D); y: integer targets (B, N); lengths per example."""
        z, z_sl = self.lstm(x, x_sl, deterministic=deterministic)
        return self.ctc_decoder(z, z_sl, y, y_sl)

    def ctc_decoder(self, z, z_sl, y, y_sl):
        logits = self.output(z)  # (B, T, O)

        T = logits.shape[1]
        N = y.shape[1]
        logit_paddings = (jnp.arange(T)[None, :] >= z_sl[:, None]).astype(jnp.float32)
        label_paddings = (jnp.arange(N)[None, :] >= y_sl[:, None]).astype(jnp.float32)
        per_example = optax.ctc_loss(logits, logit_paddings, y, label_paddings, blank_id=self.blank_index)
        loss = per_example.sum() / y_sl.sum()

        mets = dict(loss=loss, per_example=per_example, logits=logits, z_sl=z_sl, y=y, y_sl=y_sl)
        outputs = SimpleNamespace(logits=logits, sl=z_sl)
        return loss, mets, outputs

    def build_metrics(self, mets: dict):
        """Host-side: greedy decode, WER/CER (reference ``lstm_asr.py:67-84``)."""
        token_map = self.token_map()
        logits = np.asarray(mets["logits"])
        z_sl = np.asarray(mets["z_sl"])
        y = np.asarray(mets["y"])
        y_sl = np.asarray(mets["y_sl"])
        # drop zero-length padded rows (device-multiple/bucket padding): their
        # empty refs would dilute WER/CER and their hyps are garbage
        active = y_sl > 0
        if not active.all():
            logits, z_sl, y, y_sl = logits[active], z_sl[active], y[active], y_sl[active]

        hyps_raw = greedy_ctc(logits, z_sl, blank=self.blank_index)
        hyps = [token_map.decode(h, " ") for h in hyps_raw]
        refs = token_map.decode_batch(y, y_sl, " ")

        return [
            LossMetric(mets["loss"], weight_by=float(y_sl.sum())),
            ErrorRateMetric(refs, hyps, word_tokenizer, name="wer"),
            ErrorRateMetric(refs, hyps, char_tokenizer, name="cer"),
        ], hyps, refs

    def example_inputs(self):
        x = jnp.zeros((1, 8, self.input_size), jnp.float32)
        return (x, jnp.array([8]), jnp.zeros((1, 4), jnp.int32), jnp.array([4])), {}
