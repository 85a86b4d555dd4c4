"""Frame-stacked autoregressive LSTM over waveforms.

Rebuild of reference ``blvm/models/lstm.py:17-141``: stack the waveform into
``stack_size``-frame vectors, embed with a 3-layer ReLU MLP, run a (stacked)
LSTM, decode with a 3-layer ReLU MLP to ``3 * num_mix * stack_size`` DMoL
parameters, unstack, and evaluate the DMoL likelihood of the *next* stack.
Loss is masked −log p / Σ x_sl (bits/frame denominator).

Reference bugs fixed, not ported: the post-LSTM dropout whose result was
discarded (``lstm.py:100``) is applied; the ``s_n``/``sn`` output-name mismatch
that broke split-eval state carry (``experiment_lstm_audio.py:207``) is
resolved by always exposing ``s_n``.
"""

from types import SimpleNamespace
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from blvm_tpu.evaluation.metrics import BitsPerDimMetric, drop_padded_rows, LLMetric, LossMetric
from blvm_tpu.models.base import BaseModel
from blvm_tpu.modules.common import MLP
from blvm_tpu.modules.distributions import DiscretizedLogisticMixtureDense
from blvm_tpu.modules.recurrent import LSTM
from blvm_tpu.ops.likelihoods import at_least_f32
from blvm_tpu.ops.sequence import sequence_mask, stack_tensor


class LSTMAudio(BaseModel):
    stack_size: int = 64
    hidden_size: int = 256
    num_layers: int = 1
    dropout: float = 0.0
    num_mix: int = 10
    num_bins: int = 256
    bf16: bool = False
    unroll: int = 1  # time-scan unroll factor (TPU scheduling knob, same math)

    def setup(self):
        dtype = jnp.bfloat16 if self.bf16 else None
        self.embedding = MLP([self.hidden_size] * 3, activation=nn.relu, activate_final=True, dtype=dtype)
        self.lstm = LSTM(
            hidden_size=self.hidden_size, num_layers=self.num_layers, dropout=self.dropout, dtype=dtype, unroll=self.unroll
        )
        self.decoder = MLP(
            [self.hidden_size, self.hidden_size, 3 * self.num_mix * self.stack_size],
            activation=nn.relu,
            activate_final=True,  # reference applies ReLU after the last decoder layer (lstm.py:63)
        )
        self.likelihood = DiscretizedLogisticMixtureDense(y_dim=1, num_mix=self.num_mix, num_bins=self.num_bins)

    def __call__(
        self,
        x: jnp.ndarray,  # (B, T) waveform in [-1, 1] (µ-law domain upstream)
        x_sl: jnp.ndarray,  # (B,)
        s_0: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        deterministic: bool = True,
    ):
        B, T = x.shape
        x_sl_stack = jnp.ceil(x_sl / self.stack_size).astype(jnp.int32)

        x_stack, _ = stack_tensor(x, self.stack_size, axis=-1)  # (B, T', S)
        T_stack = x_stack.shape[1]

        x_input = x_stack[:, :-1]  # (B, T'-1, S)
        x_target = jax.lax.stop_gradient(x_stack[:, 1:]).reshape(B, -1)  # (B, (T'-1)*S)

        e_stack = self.embedding(x_input)

        lstm_mask = sequence_mask(x_sl_stack - 1, max_len=T_stack - 1)
        h, s_n = self.lstm(e_stack, mask=lstm_mask, initial_state=s_0, deterministic=deterministic)

        if self.dropout and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - self.dropout), 0.0)

        h = at_least_f32(h)  # likelihood surface stays at least f32
        o = self.decoder(h)  # (B, T'-1, 3*M*S)
        o = o.reshape(B, (T_stack - 1) * self.stack_size, 3 * self.num_mix)

        parameters = self.likelihood(o)
        mode = self.likelihood.mode(parameters)
        sample = self.likelihood.sample(self.make_rng("sample"), parameters)

        # The reference masks with x_sl clipped by the target length of an
        # exactly-padded batch, (ceil(max(x_sl)/S) - 1) * S (lstm.py:111-113).
        # Under bucketed padding the static target is longer, so clip to the
        # same effective length explicitly — the loss is then independent of
        # the bucket size and matches the reference bit-for-bit.
        t_max_stack = jnp.ceil(jnp.max(x_sl) / self.stack_size).astype(jnp.int32)
        eff_len = jnp.minimum(x_sl, (t_max_stack - 1) * self.stack_size)
        seq_mask = sequence_mask(eff_len, max_len=x_target.shape[1], dtype=jnp.float32)
        log_prob = self.likelihood.log_prob(x_target[..., None], parameters)  # (B, (T'-1)*S)
        log_prob = (log_prob * seq_mask).sum(axis=1)  # (B,)

        loss = -log_prob.sum() / x_sl.sum()

        mets = dict(loss=loss, log_prob=log_prob, x_sl=x_sl)
        outputs = SimpleNamespace(
            loss=loss,
            ll=log_prob,
            z=h,
            z_sl=x_sl_stack,
            reconstruction_sample=sample,
            reconstruction_mode=mode,
            s_n=s_n,
        )
        return loss, mets, outputs

    @staticmethod
    def build_metrics(mets: dict):
        """Host-side Metric construction (same classes/weights as reference
        ``lstm.py:117-121``)."""
        mets = drop_padded_rows(mets)
        log_prob = mets["log_prob"]
        return [
            LossMetric(mets["loss"], weight_by=int(log_prob.shape[0])),
            LLMetric(log_prob),
            BitsPerDimMetric(log_prob, reduce_by=mets["x_sl"]),
        ]

    def generate(
        self,
        n_samples: int = 1,
        max_timesteps: int = 100,
        use_mode: bool = False,
        x: Optional[jnp.ndarray] = None,
        s_0: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Ancestral rollout: embed the current frame-stack, one LSTM step,
        decode DMoL parameters for the next stack, sample it, feed it back —
        one ``lax.scan`` over stacks.

        Capability ADDED over the reference, whose ``LSTMAudio.generate``
        raises ``NotImplementedError`` (``blvm/models/lstm.py:133-135``).
        ``max_timesteps`` counts stacks (like VRNN/SRNN); the waveform output
        is ``max_timesteps * stack_size`` frames. ``x`` optionally primes the
        rollout with one (B, stack_size) seed stack (zeros = silence prime,
        the natural µ-law origin).
        """
        S = self.stack_size
        if x is None:
            x = jnp.zeros((n_samples, S), jnp.float32)
        elif x.shape[0] == 1 and n_samples > 1:
            x = jnp.repeat(x, n_samples, axis=0)
        B = x.shape[0]

        if s_0 is None:
            s_0 = (
                jnp.zeros((self.num_layers, B, self.hidden_size), jnp.float32),
                jnp.zeros((self.num_layers, B, self.hidden_size), jnp.float32),
            )
        key = self.make_rng("sample")

        def body(mdl, carry, step_key):
            x_in, s_in = carry
            e = mdl.embedding(x_in)  # (B, H)
            h, s_new = mdl.lstm(e[:, None, :], initial_state=s_in)
            h = at_least_f32(h)
            o = mdl.decoder(h).reshape(B, S, 3 * mdl.num_mix)
            params = mdl.likelihood(o)
            x_next = mdl.likelihood.mode(params) if use_mode else mdl.likelihood.rsample(step_key, params)
            x_next = x_next.reshape(B, S)
            return (x_next, s_new), x_next

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=0,
            out_axes=0,
            unroll=self.unroll,  # same scheduling knob as training (same math)
        )
        (_, _), stacks = scan(self, (x, s_0), jax.random.split(key, max_timesteps))
        x_out = jnp.moveaxis(stacks, 0, 1).reshape(B, -1)  # (B, T'*S)
        x_sl = jnp.full((B,), x_out.shape[1], jnp.int32)
        return (x_out, x_sl), SimpleNamespace()

    def split_sequence_args(self):
        """Chunk geometry for chunked eval: no overlap, strideable by stack."""
        return dict(overlap=0, mode="consume")

    def example_inputs(self):
        x = jnp.zeros((1, 4 * self.stack_size), jnp.float32)
        x_sl = jnp.full((1,), 4 * self.stack_size, jnp.int32)
        return (x, x_sl), {"sample": None}
