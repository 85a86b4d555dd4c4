"""WaveNet: autoregressive dilated-causal-conv waveform model.

Rebuild of reference ``blvm/models/wavenet/wavenet.py:29-293``. The forward
geometry is identical: optional frame stacking or embedding, left-pad by the
receptive field, causal conv (drop last frame), residual stack with skips
sliced to the output region, summed skips scaled, pointwise head, likelihood.

Reference quirks preserved/fixed:
  * ``variance_scale = sqrt(1/n_stacks * n_layers)`` — operator precedence
    makes this ``sqrt(n_layers/n_stacks)`` (``wavenet.py:95``); the trained
    numbers depend on it, so the same value is used here. Unlike the reference
    (which multiplies in forward but divides in generate — ``wavenet.py:198``
    vs ``:274``), generation uses the same multiply as forward.
  * ``z`` = every 5th skip tensor (``wavenet.py:215``).

Generation is a jitted ``lax.scan`` over output frames with a FIFO receptive-
field window as carry — the reference's Python loop (``wavenet.py:271-290``)
made one full graph dispatch per sample.
"""

import math
from types import SimpleNamespace
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from blvm_tpu.evaluation.metrics import BitsPerDimMetric, drop_padded_rows, LLMetric, LossMetric
from blvm_tpu.models.base import BaseModel
from blvm_tpu.models.wavenet.modules import CausalConv1d, PointwiseTransform, ResidualStack
from blvm_tpu.modules.distributions import get_likelihood_head
from blvm_tpu.ops.likelihoods import at_least_f32
from blvm_tpu.ops.padding import get_modulo_length
from blvm_tpu.ops.sequence import sequence_mask, split_sequence, stack_tensor, unstack_tensor


# Unroll factor of the fast-generation inner block scan: the per-block ops are
# tiny, so the loop is latency-bound — unrolling amortizes issue overhead while
# keeping the compiled body ~unroll×15 ops (full unroll measured ~9 min of XLA
# compile; on a v5e: unroll=1 → 3.2k frames/s, 5 → 4.0k, 10 → measured below).
_BLOCK_UNROLL = 10


class InputSizeError(Exception):
    def __init__(self, input_size, receptive_field):
        message = "Input size has to be larger than receptive_field\n"
        message += f"Input size: {input_size}, Receptive fields size: {receptive_field}"
        super().__init__(message)


class WaveNet(BaseModel):
    likelihood: str = "DMoL"
    in_channels: int = 1
    embedding_dim: Optional[int] = None
    num_bins: int = 256
    num_mix: int = 10
    n_layers: int = 10
    n_stacks: int = 5
    res_channels: int = 512
    skip_channels: Optional[int] = None
    gate_channels: Optional[int] = None
    kernel_size: int = 2
    base_dilation: int = 2
    n_stack_frames: int = 1
    remat: bool = False
    bf16: bool = False
    # measured-negative ablation (54.5 → 72.2 ms/step on v5e); see
    # modules.Conv1dResidualGLU.fuse_gate_dots
    fuse_gate_dots: bool = False

    def setup(self):
        if self.embedding_dim is not None and self.n_stack_frames > 1:
            raise ValueError("Cannot stack frames if using an embedding (which is what we do when in_channels>1)")
        if self.embedding_dim is not None and self.in_channels > 1:
            raise ValueError("Cannot use more than 1 input_channel if also wanting to use an embedding.")

        # reference precedence quirk: sqrt(1/n_stacks * n_layers) == sqrt(n_layers/n_stacks)
        self.variance_scale = math.sqrt(1 / self.n_stacks * self.n_layers)

        if self.embedding_dim is None:
            self.embedding = None
            self.causal = CausalConv1d(features=self.res_channels, kernel_size=self.kernel_size)
        else:
            self.embedding = nn.Embed(num_embeddings=self.num_bins, features=self.embedding_dim)
            self.causal = CausalConv1d(features=self.res_channels, kernel_size=self.kernel_size)

        self.res_stack = ResidualStack(
            n_layers=self.n_layers,
            n_stacks=self.n_stacks,
            res_channels=self.res_channels,
            skip_channels=self.skip_channels,
            gate_channels=self.gate_channels,
            kernel_size=self.kernel_size,
            base_dilation=self.base_dilation,
            remat=self.remat,
            dtype=jnp.bfloat16 if self.bf16 else None,
            fuse_gate_dots=self.fuse_gate_dots,
        )

        self.out_transform = PointwiseTransform(self.res_channels * self.n_stack_frames)

        y_dim = self.in_channels * self.n_stack_frames if self.n_stack_frames > 1 else self.in_channels
        self.likelihood_head = get_likelihood_head(
            self.likelihood, y_dim=1, num_mix=self.num_mix, num_bins=self.num_bins
        )

    @property
    def receptive_field(self) -> int:
        """Static (config-derived) so it is usable outside init/apply too."""
        return (
            ResidualStack.compute_receptive_fields(
                self.n_layers, self.n_stacks, self.kernel_size, self.base_dilation
            )[-1]
            + self.kernel_size
            - 1
        )

    def compute_loss(self, y, x_sl, parameters):
        """Masked negative log-likelihood normalized by Σ x_sl
        (reference ``wavenet.py:128-146``)."""
        seq_mask = sequence_mask(x_sl, max_len=y.shape[1], dtype=jnp.float32)  # (B, T)
        if y.ndim == 2:
            # categorical targets stay (B, T) ints — the gather consumes no
            # channel axis, so there is nothing to reduce per frame
            log_prob_twise = self.likelihood_head.log_prob(y, parameters, reduce_dim=None) * seq_mask
        else:
            log_prob_twise = self.likelihood_head.log_prob(y, parameters) * seq_mask  # (B, T)
        log_prob = log_prob_twise.reshape(y.shape[0], -1).sum(axis=1)  # (B,)
        loss = -log_prob.sum() / x_sl.sum()
        return loss, log_prob, log_prob_twise

    def _network(self, x, skip_size: int, pad_causal: bool):
        """Causal conv → residual stack → scaled skip sum → pointwise head."""
        output = self.causal(x, pad_causal=pad_causal)
        skip_connections = self.res_stack(output, skip_size)
        # skip sum and the output head at least f32 (likelihood parity surface)
        summed = sum(at_least_f32(s) for s in skip_connections) * self.variance_scale
        logits = self.out_transform(summed)
        return logits, skip_connections

    def __call__(
        self,
        x,  # (B, T) or (B, T, C), values in [-1, 1] (or ints if embedding)
        x_sl,
        y=None,
        pad_causal: bool = True,
        pad_receptive_field: bool = True,
    ):
        if y is None:
            y = jax.lax.stop_gradient(x)
            if not pad_receptive_field:
                y = y[:, self.receptive_field * self.n_stack_frames :]

        x_sl_strided = jnp.ceil(x_sl / self.n_stack_frames).astype(jnp.int32)
        if self.n_stack_frames > 1:
            x, p = stack_tensor(x, self.n_stack_frames, axis=1)
        else:
            p = 0

        # categorical (discretized/mu-law) targets stay integer (B, T); every
        # density head scores a trailing channel axis
        add_y_channel = self.likelihood.lower() != "categorical"
        if self.embedding is None:
            x = x[..., None] if x.ndim == 2 else x  # (B, T, 1)
        else:
            x = self.embedding(x.astype(jnp.int32))  # (B, T, C)
        if add_y_channel:
            y = y[..., None] if y.ndim == 2 else y

        T = x.shape[1]
        if pad_receptive_field:
            skip_size = T
            x = jnp.pad(x, ((0, 0), (self.receptive_field, 0), (0, 0)))
        else:
            skip_size = T - self.receptive_field
            # x_sl is in the SAMPLE domain: the stack-domain receptive field
            # consumes rf * n_stack_frames samples (matching the y slice
            # above). Clamp at 0: inactive rows (sl=0 from static-shape
            # chunking) must not go negative and pollute the Σ x_sl loss
            # denominator — the reference never sees such rows because it
            # drops them (operations.py drop_inactive)
            x_sl = jnp.clip(x_sl - self.n_stack_frames * self.receptive_field, 0)

        if x.shape[1] - int(pad_causal) < self.receptive_field:
            raise InputSizeError(x.shape[1], self.receptive_field)

        logits, skip_connections = self._network(x, skip_size, pad_causal)

        if self.n_stack_frames > 1:
            # unstack along time: (B, T', res*S) -> (B, T'*S, res); row-major
            # reshape matches the reference's view-based unstack (wavenet.py:202)
            B, Ts, _ = logits.shape
            logits = logits.reshape(B, Ts, self.n_stack_frames, self.res_channels).reshape(
                B, Ts * self.n_stack_frames, self.res_channels
            )
            if p:
                logits = logits[:, :-p]

        parameters = self.likelihood_head(logits)
        predictions = self.likelihood_head.sample(self.make_rng("sample"), parameters)
        predictions_mode = self.likelihood_head.mode(parameters)

        loss, log_prob, log_prob_twise = self.compute_loss(y, x_sl, parameters)

        mets = dict(loss=loss, log_prob=log_prob, x_sl=x_sl)
        z = [s for s in skip_connections][::5]  # every 5th skip (B, T, C)
        outputs = SimpleNamespace(
            loss=loss,
            log_prob=log_prob,
            log_prob_twise=log_prob_twise,
            parameters=parameters,
            z=z,
            z_sl=x_sl_strided,
            y=y,
            predictions=predictions,
            predictions_mode=predictions_mode,
        )
        return loss, mets, outputs

    @staticmethod
    def build_metrics(mets: dict):
        mets = drop_padded_rows(mets)
        log_prob = mets["log_prob"]
        return [
            LossMetric(mets["loss"], weight_by=int(log_prob.shape[0])),
            LLMetric(log_prob),
            BitsPerDimMetric(log_prob, reduce_by=mets["x_sl"]),
        ]

    def split_sequence(self, x, x_sl, length: int):
        """Chunk a long sequence for memory-constrained forward; overlap is the
        full receptive field (pad_causal removes the last input of each chunk,
        reference ``wavenet.py:230-242``)."""
        overlap = self.receptive_field * self.n_stack_frames
        length = get_modulo_length(length, stride=self.n_stack_frames)
        mode = "extend" if overlap >= length else "consume"
        # Extend mode: chunk 0 stays unpadded (forward_split's first-chunk
        # rf-padding supplies the empty history), later chunks carry their
        # overlap-length context. The reference instead left-pads chunk 0 with
        # zeros and then evaluates the zeros under a left-aligned mask
        # (wavenet.py:240-242 + operations.py:188) — its extend path scores
        # the wrong frames; fixed, not ported.
        return split_sequence(x, x_sl, length=length, overlap=overlap, mode=mode)

    def forward_split(self, x, x_sl, i_split: int, y=None):
        return self(x, x_sl, y=y, pad_causal=True, pad_receptive_field=(i_split == 0))

    def generate(
        self, n_samples: int, n_frames: int = 16000, x: Optional[jnp.ndarray] = None, fast: bool = True
    ):
        """Ancestral sampling (jittable; no per-frame dispatch).

        ``fast=True`` (default, Fast-WaveNet): per-layer circular history
        buffers as the ``lax.scan`` carry — O(n_layers·C²) per emitted frame
        instead of a full receptive-field forward (O(rf·n_layers·C²)). Same
        keys, same contractions, same sample stream as the naive path (the
        reference's Python loop re-runs the full window every frame,
        ``wavenet.py:254-293`` — this path beats it algorithmically).
        Falls back to the windowed scan for stacked-frame or k≠2 configs.
        """
        if fast and self.kernel_size == 2 and self.n_stack_frames == 1:
            return self._generate_fast(n_samples, n_frames, x)
        return self._generate_naive(n_samples, n_frames, x)

    def _prediction_to_input(self, pred):
        pred_in = self.embedding(pred.astype(jnp.int32)) if self.embedding is not None else pred
        if pred_in.ndim == 2:
            pred_in = pred_in[:, None, :]
        return pred_in

    def _emit_frame(self, skips, step_key):
        """Skip-sum → head → sample for a single output column."""
        summed = sum(at_least_f32(s) for s in skips) * self.variance_scale
        logits = self.out_transform(summed)
        parameters = self.likelihood_head(logits)
        return self.likelihood_head.rsample(step_key, parameters)

    def _generate_fast(self, n_samples: int, n_frames: int, x: Optional[jnp.ndarray]):
        """Fast-WaveNet step loop.

        The per-frame work of the residual chain is expressed as an INNER
        ``lax.scan`` over the 50 blocks with their parameters stacked on a
        leading block axis — the step executes the exact contractions of
        ``Conv1dResidualGLU`` (one output column: ``k[0]ᵀx[t-d] + k[1]ᵀx[t]``)
        but compiles as a ~15-op loop body instead of ~300 unrolled ops
        (measured: the unrolled form took ~9 min of XLA compile on a v5e
        relay; execution itself is sub-millisecond per frame either way).

        Each block's ``x[t-d]`` comes from a circular history buffer at slot
        ``t % d`` — that slot was written ``d`` steps ago, exactly the frame
        falling out of range. Buffers are seeded by the priming forward's
        ``collect_tails`` (last ``d`` input frames per block, final column
        time-aligned with the stack's output column).
        """
        rf = self.receptive_field
        if x is None:
            if self.embedding is None:
                x = jnp.zeros((n_samples, rf, self.in_channels), jnp.float32)
            else:
                x = self.embedding(jnp.zeros((n_samples, rf), jnp.int32))

        key = self.make_rng("sample")
        keys = jax.random.split(key, n_frames)

        # prime: ONE windowed forward over the history; collect each block's
        # last-``dilation`` input frames to seed the circular buffers, and
        # sample the first frame from its output column
        causal_out = self.causal(x, pad_causal=False)
        skips, tails = self.res_stack(causal_out, 1, collect_tails=True)
        pred0 = self._emit_frame(skips, keys[0])  # (B, 1)

        # ---- stack per-block params / buffers on a leading block axis ------
        dilations = ResidualStack.build_dilations(
            self.res_stack.n_layers, self.res_stack.n_stacks, self.res_stack.base_dilation
        )
        n_blocks, max_d = len(dilations), max(dilations)
        rs_params = self.res_stack.variables["params"]
        blocks = [rs_params[f"Conv1dResidualGLU_{i}"] for i in range(n_blocks)]
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32

        def stacked(name):
            return jnp.stack([b[name] for b in blocks]).astype(dtype)

        w_t, w_s = stacked("gate_kernel_t"), stacked("gate_kernel_s")  # (L, 2, C, half)
        b_t, b_s = stacked("gate_bias_t"), stacked("gate_bias_s")  # (L, half)
        w_rs, b_rs = stacked("rs_kernel"), stacked("rs_bias")  # (L, 1, half, R+S), (L, R+S)
        # column-concatenate the tanh/sigmoid branches per tap: a dot's output
        # column depends only on its own kernel column, so one (C, 2*half)
        # matmul per tap is BITWISE identical to the two separate branch dots —
        # and the step loop is issue-latency-bound, so fewer ops = faster
        w_old = jnp.concatenate([w_t[:, 0], w_s[:, 0]], axis=-1)  # (L, C, 2*half)
        w_cur = jnp.concatenate([w_t[:, 1], w_s[:, 1]], axis=-1)
        b_gate = jnp.concatenate([b_t, b_s], axis=-1)  # (L, 2*half)
        half = w_t.shape[-1]
        in_kernel = rs_params["Conv1d_0"]["kernel"].astype(dtype)  # (1, C_in, C)
        in_bias = rs_params["Conv1d_0"]["bias"].astype(dtype)
        # causal k=2 conv as two explicit taps — the conv op's fixed issue cost
        # dominates at (B, 2, C) shapes
        causal_params = self.causal.variables["params"]["Conv1d_0"]
        ck, cb = causal_params["kernel"], causal_params["bias"]  # (k, C_in, C), (C,)
        dil_arr = jnp.asarray(dilations, jnp.int32)
        # circular buffers: (L, B, max_d, C), block i valid in [0:dilations[i]]
        buffers0 = jnp.stack(
            [jnp.pad(t.astype(dtype), ((0, 0), (0, max_d - d), (0, 0))) for t, d in zip(tails, dilations)]
        )
        inv_std = math.sqrt(0.5)
        R = self.res_channels

        def block_step(carry, xs):
            h, acc = carry  # (B, 1, C) block input, f32 skip accumulator
            wo, wc, wrs, bg, brs, buf, slot = xs
            old = jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=1)  # x[t-d]
            new_buf = jax.lax.dynamic_update_slice_in_dim(buf, h, slot, axis=1)
            gate = old @ wo + h @ wc + bg  # (B, 1, 2*half): [tanh | sigmoid] columns
            act = jnp.tanh(gate[..., :half]) * jax.nn.sigmoid(gate[..., half:])
            rs = act @ wrs[0] + brs
            r, s = rs[..., :R], rs[..., R:]
            # accumulate skips IN BLOCK ORDER — matches the sequential
            # ``sum(at_least_f32(s) for s in skips)`` of the windowed path
            return ((h + r) * inv_std, acc + at_least_f32(s)), new_buf

        def step(carry, step_key):
            prev2, prev1, buffers, idx = carry
            c = prev2 @ ck[0] + prev1 @ ck[1] + cb  # causal k=2 conv, (B, 1, C)
            h0 = c.astype(dtype) @ in_kernel[0] + in_bias  # res_stack in_transform
            acc0 = jnp.zeros(h0.shape[:2] + (w_rs.shape[-1] - R,), jnp.float32)
            slots = jax.lax.rem(idx, dil_arr)  # (L,)
            (_, acc), buffers = jax.lax.scan(
                block_step, (h0, acc0), (w_old, w_cur, w_rs, b_gate, b_rs, buffers, slots), unroll=_BLOCK_UNROLL
            )
            logits = self.out_transform(acc * self.variance_scale)
            parameters = self.likelihood_head(logits)
            pred = self.likelihood_head.rsample(step_key, parameters)
            return (prev1, self._prediction_to_input(pred), buffers, idx + 1), pred

        carry0 = (x[:, -1:], self._prediction_to_input(pred0), buffers0, jnp.int32(0))
        _, preds = jax.lax.scan(step, carry0, keys[1:])
        preds = jnp.moveaxis(preds, 0, 1).reshape(n_samples, -1)  # (B, n_frames-1)
        return jnp.concatenate([pred0.reshape(n_samples, -1), preds], axis=1)

    def _generate_naive(self, n_samples: int, n_frames: int = 16000, x: Optional[jnp.ndarray] = None):
        """Ancestral sampling with a FIFO receptive-field window, as one
        ``lax.scan`` over frames — every step re-runs the full window
        (reference semantics; kept as the oracle for the fast path and for
        stacked-frame/k≠2 configs)."""
        rf = self.receptive_field
        C = self.in_channels * self.n_stack_frames

        if x is None:
            if self.embedding is None:
                x = jnp.zeros((n_samples, rf, C), jnp.float32)
            else:
                x = self.embedding(jnp.zeros((n_samples, rf), jnp.int32))

        key = self.make_rng("sample")

        def step(carry, step_key):
            window = carry  # (B, rf, C)
            logits, _ = self._network(window, skip_size=1, pad_causal=False)
            if self.n_stack_frames > 1:
                B, Ts, _ = logits.shape
                logits = logits.reshape(B, Ts, self.n_stack_frames, self.res_channels).reshape(
                    B, Ts * self.n_stack_frames, self.res_channels
                )
            parameters = self.likelihood_head(logits)
            pred = self.likelihood_head.rsample(step_key, parameters)  # (B, 1[, C])
            pred_in = self.embedding(pred.astype(jnp.int32)) if self.embedding is not None else pred
            if pred_in.ndim == 2:
                pred_in = pred_in[:, None, :]
            window = jnp.concatenate([window[:, 1:], pred_in[:, -1:]], axis=1)
            return window, pred

        n_steps = n_frames // self.n_stack_frames if self.n_stack_frames > 1 else n_frames
        _, preds = jax.lax.scan(step, x, jax.random.split(key, n_steps))
        # (steps, B, 1[, C]) -> (B, steps[, C])
        preds = jnp.moveaxis(preds, 0, 1)
        preds = preds.reshape(n_samples, -1)
        return preds

    def example_inputs(self):
        T = self.receptive_field + 8
        x = jnp.zeros((1, T * self.n_stack_frames), jnp.float32)
        x_sl = jnp.full((1,), T * self.n_stack_frames, jnp.int32)
        return (x, x_sl), {"sample": None}
