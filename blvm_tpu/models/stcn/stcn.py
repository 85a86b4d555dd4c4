"""STCN — Stochastic Temporal Convolutional Network (Aksan & Hilliges 2019).

Rebuild of reference ``blvm/models/stcn/stcn.py:32-443``. Structure (identical):
  * WaveNet ResidualStack backbone; a hierarchy of ``len(latent_size)`` latents
    fed from every n-th skip connection.
  * Prior sees the skips shifted one frame back (``d[..., :-1]``) and the
    posterior the unshifted ones (``d[..., 1:]``) — ``stcn.py:299-326``.
  * Top-down (analytic KL) or bottom-up (MC KL) inference; optional
    precision-weighted posterior fusion.
  * Dense (concat all z) or bottom-only decoding through a second non-dilated
    ResidualStack and an upsample head.

Layout is channels-last (B, T, C) as in the WaveNet rebuild.
"""

import math
from types import SimpleNamespace
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blvm_tpu.evaluation.metrics import BitsPerDimMetric, drop_padded_rows, KLMetric, LatestMeanMetric, LLMetric, LossMetric
from blvm_tpu.models.base import BaseModel
from blvm_tpu.models.wavenet.modules import CausalConv1d, ResidualStack
from blvm_tpu.modules.common import MLP, Dense
from blvm_tpu.modules.distributions import (
    DiagonalGaussianDense,
    DiagonalGaussianMixtureDense,
    DiscretizedLogisticMixtureDense,
    softplus_beta,
)
from blvm_tpu.ops.likelihoods import at_least_f32
from blvm_tpu.ops.sequence import sequence_mask, stack_tensor
from blvm_tpu.ops.variational import (
    discount_free_nats,
    kl_divergence_gaussian,
    kl_divergence_gaussian_mc,
    precision_weighted_gaussian,
    rsample_gaussian,
)


def _leaky_relu(v):
    return nn.leaky_relu(v, 0.01)


class DiagonalGaussianDenseSTCN(nn.Module):
    """Two-branch (µ, σ) 3-layer MLP head with calibrated softplus sd
    (reference ``stcn.py:32-74``).

    ``dtype=bfloat16`` runs the six dense matmuls on the MXU at double rate;
    the returned µ/σ (and the softplus calibration) are always f32 — the
    KL/rsample math downstream stays full precision."""

    out_channels: int
    hidden_channels: int
    init_sd_mean: float = 1.0
    epsilon: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sizes = [self.hidden_channels, self.hidden_channels, self.out_channels]
        mu = MLP(sizes, activation=_leaky_relu, activate_final=False, dtype=self.dtype)(x)
        sd = MLP(sizes, activation=_leaky_relu, activate_final=False, dtype=self.dtype)(x)
        mu = at_least_f32(mu)
        beta = math.log(2.0) / (self.init_sd_mean - self.epsilon)
        sd = softplus_beta(at_least_f32(sd), beta) + self.epsilon
        return mu, sd


# Unroll factor of the fast-generation inner block scans. The per-frame step
# is ISSUE-latency-bound (~175 tiny ops at B=2), so both stacks unroll fully —
# at 25+5 blocks the compile stays manageable (WaveNet's 50-block stack is the
# one that needed a partial unroll, wavenet.py:_BLOCK_UNROLL)
_BLOCK_UNROLL = 25


class STCN(BaseModel):
    likelihood: str = "DMoL"
    in_channels: int = 1
    n_layers: int = 5
    n_stacks: Optional[int] = None
    latent_size: Sequence[int] = (256, 128, 64, 32, 16)
    res_channels: int = 256
    kernel_size: int = 2
    base_dilation: int = 2
    n_stack_frames: int = 1
    precision_posterior: bool = True
    dense: bool = True
    top_down: bool = True
    remat: bool = False
    bf16: bool = False
    # measured-negative ablation (slower on v5e); see
    # wavenet.modules.Conv1dResidualGLU.fuse_gate_dots
    fuse_gate_dots: bool = False

    def setup(self):
        n_latents = len(self.latent_size)
        n_stacks = n_latents if self.n_stacks is None else self.n_stacks
        self._n_latents = n_latents
        self._n_stacks = n_stacks

        dtype = jnp.bfloat16 if self.bf16 else None
        self.causal = CausalConv1d(features=self.res_channels, kernel_size=self.kernel_size)
        self.res_stack = ResidualStack(
            n_layers=self.n_layers,
            n_stacks=n_stacks,
            res_channels=self.res_channels,
            kernel_size=self.kernel_size,
            base_dilation=self.base_dilation,
            remat=self.remat,
            dtype=dtype,
            fuse_gate_dots=self.fuse_gate_dots,
        )

        # priors/posteriors per latent, conditioned on the level above (top-down)
        # or below (bottom-up)
        priors, posteriors = [], []
        order = list(reversed(range(n_latents))) if self.top_down else list(range(n_latents))
        heads_p = [None] * n_latents
        heads_q = [None] * n_latents
        for i, l in enumerate(order):
            heads_p[l] = DiagonalGaussianDenseSTCN(
                out_channels=self.latent_size[l],
                hidden_channels=self.res_channels,
                init_sd_mean=0.5,
                dtype=dtype,
                name=f"prior_{l}",
            )
            heads_q[l] = DiagonalGaussianDenseSTCN(
                out_channels=self.latent_size[l],
                hidden_channels=self.res_channels,
                init_sd_mean=0.1,
                dtype=dtype,
                name=f"posterior_{l}",
            )
        self.priors = heads_p
        self.posteriors = heads_q

        # decode stack in the compute dtype too — at the benchmark config it
        # is ~4 MFLOP/frame of otherwise-f32 conv work
        self.out_transform = ResidualStack(
            n_layers=self.n_layers,
            n_stacks=1,
            res_channels=self.res_channels,
            kernel_size=self.kernel_size,
            base_dilation=1,
            dtype=dtype,
            fuse_gate_dots=self.fuse_gate_dots,
        )
        self._out_rf = ResidualStack.compute_receptive_fields(self.n_layers, 1, self.kernel_size, 1)[-1]
        self.inv_std = 1.0 / math.sqrt(n_stacks)

        self.likelihood_module = self._make_likelihood()
        self.out_upsample = _UpsampleHead(out_features=self._likelihood_out_features() * self.n_stack_frames)

    @property
    def receptive_fields(self):
        n_stacks = len(self.latent_size) if self.n_stacks is None else self.n_stacks
        rfs = ResidualStack.compute_receptive_fields(self.n_layers, n_stacks, self.kernel_size, self.base_dilation)
        return [rf + self.kernel_size - 1 for rf in rfs]

    @property
    def receptive_field(self) -> int:
        return self.receptive_fields[-1]

    def _make_likelihood(self):
        num_mix = 10
        if self.likelihood == "DMoL":
            return DiscretizedLogisticMixtureDense(y_dim=1, num_mix=num_mix, num_bins=2**16)
        if self.likelihood == "GMM":
            return DiagonalGaussianMixtureDense(y_dim=1, num_mix=num_mix, initial_sd=1, epsilon=1e-4)
        if self.likelihood == "Gaussian":
            return DiagonalGaussianDense(y_dim=1, epsilon=1e-4)
        raise ValueError(f"Unknown likelihood type {self.likelihood}")

    def _likelihood_out_features(self) -> int:
        if self.likelihood == "DMoL":
            return 30
        if self.likelihood == "GMM":
            return 30
        if self.likelihood == "Gaussian":
            return 2
        raise ValueError(self.likelihood)

    def infer(self, skips: List[jnp.ndarray]):
        """Hierarchical inference from every n-th skip with one-frame shift
        (reference ``stcn.py:299-326``). Skips are (B, T+1, C)."""
        n = self._n_latents
        d = skips[n - 1 :: n][:n]  # one per latent level, bottom→top
        d_p = [d_[:, :-1] for d_ in d]  # prior input: frames ..t-1
        d_q = [d_[:, 1:] for d_ in d]  # posterior input: frames ..t

        mu_p, sd_p = [None] * n, [None] * n
        mu_q, sd_q = [None] * n, [None] * n
        z = [None] * n

        order = list(reversed(range(n))) if self.top_down else list(range(n))
        for i, l in enumerate(order):
            if i == 0:
                in_p, in_q = d_p[l], d_q[l]
            else:
                l_cond = l + 1 if self.top_down else l - 1
                # z is carried in f32 for the KL/rsample math; the head MLPs
                # cast their input to the compute dtype anyway, so casting z
                # BEFORE the concat is bitwise-identical forward and keeps the
                # concatenated conditioning tensor in bf16 (halves its HBM
                # footprint when the stack runs bf16). Two separate casts (not
                # one shared) so each cast's cotangent is widened to f32
                # before summation at z. Backward is exact in f32 mode; in
                # bf16 mode the d_p/d_q cotangents now sum at the skip in bf16
                # (measured ~2e-6 relative on gradient norms — the same
                # rounding the bf16 stack backward performs everywhere else).
                dt = d_p[l].dtype
                in_p = jnp.concatenate([d_p[l], z[l_cond].astype(dt)], axis=-1)
                in_q = jnp.concatenate([d_q[l], z[l_cond].astype(dt)], axis=-1)

            mu_p[l], sd_p[l] = self.priors[l](in_p)
            mu_q[l], sd_q[l] = self.posteriors[l](in_q)
            if self.precision_posterior:
                mu_q[l], sd_q[l] = precision_weighted_gaussian(mu_p[l], sd_p[l], mu_q[l], sd_q[l])
            z[l] = rsample_gaussian(self.make_rng("sample"), mu_q[l], sd_q[l])

        return mu_p, sd_p, mu_q, sd_q, z

    def compute_loss(self, y, x_sl, parameters, mu_p, sd_p, mu_q, sd_q, z, free_nats, beta):
        log_prob_twise = self.likelihood_module.log_prob(y, parameters, reduce_dim=-1)  # (B, T)
        seq_mask = sequence_mask(x_sl, max_len=y.shape[1], dtype=jnp.float32)
        log_prob = (log_prob_twise * seq_mask).sum(axis=1)  # (B,)

        z_mask = seq_mask[:, :: self.n_stack_frames, None]
        z_mask = z_mask[:, : mu_p[0].shape[1]]
        n = self._n_latents
        if self.top_down:
            klds = [kl_divergence_gaussian(mu_q[l], sd_q[l], mu_p[l], sd_p[l]) * z_mask for l in range(n)]
        else:
            klds = [kl_divergence_gaussian_mc(mu_q[l], sd_q[l], mu_p[l], sd_p[l], z[l]) * z_mask for l in range(n)]
        klds_fn = [discount_free_nats(klds[l], free_nats, shared_dims=-1) * z_mask for l in range(n)]
        kld = jnp.concatenate(klds, axis=-1).sum(axis=(1, 2))  # (B,)
        kld_fn = jnp.concatenate(klds_fn, axis=-1).sum(axis=(1, 2))
        klds = [kl.sum(axis=(1, 2)) for kl in klds]

        elbo = log_prob - kld
        loss = -(log_prob - beta * kld_fn).sum() / x_sl.sum()
        return loss, elbo, log_prob, kld, klds

    def __call__(
        self,
        x,
        x_sl,
        y=None,
        pad_receptive_field: bool = True,
        free_nats=0.0,
        beta=1.0,
    ):
        if y is None:
            y = jax.lax.stop_gradient(x)
            if not pad_receptive_field:
                y = y[:, self.receptive_field * self.n_stack_frames :]

        if self.n_stack_frames > 1:
            x, p = stack_tensor(x, self.n_stack_frames, axis=1)
        else:
            p = 0

        x = x[..., None] if x.ndim == 2 else x  # (B, T, 1)
        y = y[..., None] if y.ndim == 2 else y

        if pad_receptive_field:
            T = x.shape[1]
            x = jnp.pad(x, ((0, 0), (self.receptive_field, 0), (0, 0)))
        else:
            T = x.shape[1] - self.receptive_field
            # clamp like WaveNet: zero-length rows from static-shape chunking
            # must not go negative and pollute the loss denominator
            x_sl = jnp.clip(x_sl - self.n_stack_frames * self.receptive_field, 0)
            if x.shape[1] <= self.receptive_field:
                raise ValueError(f"Input must be at least as long as the receptive field if {pad_receptive_field=}")

        output = self.causal(x, pad_causal=False)
        # ``infer`` reads only every n_latents-th skip (``d = skips[n-1::n]``,
        # matching reference ``stcn.py:299-326``); the mask stops the other
        # blocks from computing/materializing skips that are provably dead
        # (zero gradient) — ~20 of 25 (B, T+1, C) tensors at the flagship.
        n_blocks = self.n_layers * self._n_stacks
        used = set(list(range(self._n_latents - 1, n_blocks, self._n_latents))[: self._n_latents])
        skip_mask = [i in used for i in range(n_blocks)]
        skip_connections = self.res_stack(output, skip_size=T + 1, skip_mask=skip_mask)  # used ones (B, T+1, C)
        # Skips stay in the stack's compute dtype (bf16 when enabled): their
        # only consumers — the latent-head MLPs and the decode stack — cast
        # their input to bf16 anyway, so a bf16→f32→bf16 round trip here is
        # bitwise-identical but materializes ~2.6 GB of f32 skips per flagship
        # step (profiler-measured; the f32 latent math happens INSIDE the
        # heads via ``at_least_f32`` on µ/σ, not on the skips).

        return self.finish_from_skips(skip_connections, y, x_sl, T, p, free_nats, beta)

    def finish_from_skips(self, skip_connections, y, x_sl, T, p, free_nats=0.0, beta=1.0):
        """Latent inference + decode + loss from the (masked) skip list — the
        training forward after the encoder stack. Factored out of
        ``__call__`` so the pipeline-parallel adapter
        (``parallel/pipeline_parallel.py``) can replace the encoder stack with
        the GPipe engine and reuse everything downstream unchanged (same
        module scopes, same ``sample`` rng sequence)."""
        mu_p, sd_p, mu_q, sd_q, z = self.infer(skip_connections)

        # decode consumes z in the compute dtype (the stack's in_transform
        # casts to bf16 regardless — concat-then-cast == cast-then-concat)
        # (no cast in full-precision mode — the parity suite runs in f64)
        z_dec = [z_.astype(jnp.bfloat16) for z_ in z] if self.bf16 else z
        logits_in = jnp.concatenate(z_dec, axis=-1) if self.dense else z_dec[0]
        logits_in = jnp.pad(logits_in, ((0, 0), (self._out_rf - 1, 0), (0, 0)))
        skip_logits = self.out_transform(logits_in, skip_size=T)

        # skip sum and everything from here f32 (likelihood parity surface,
        # mirroring WaveNet's skip-sum policy)
        logits = sum(at_least_f32(s) for s in skip_logits) * self.inv_std  # (B, T, C)
        logits = self.out_upsample(logits)

        if self.n_stack_frames > 1:
            B, Ts, _ = logits.shape
            D = self._likelihood_out_features()
            logits = logits.reshape(B, Ts, self.n_stack_frames, D).reshape(B, Ts * self.n_stack_frames, D)
            if p:
                logits = logits[:, :-p]

        params = self.likelihood_module(logits)

        loss, elbo, log_prob, kld, klds = self.compute_loss(
            y, x_sl, params, mu_p, sd_p, mu_q, sd_q, z, free_nats, beta
        )

        # per-sample MC KL across all layers (importance-weighted bounds)
        seq_mask_ = sequence_mask(x_sl, max_len=y.shape[1], dtype=jnp.float32)
        z_mask_ = seq_mask_[:, :: self.n_stack_frames, None][:, : mu_p[0].shape[1]]
        mc_kl = sum(
            (kl_divergence_gaussian_mc(mu_q[l], sd_q[l], mu_p[l], sd_p[l], z[l]) * z_mask_).sum(axis=(1, 2))
            for l in range(self._n_latents)
        )

        reconstructions = self.likelihood_module.sample(self.make_rng("sample"), params)
        reconstructions_mode = self.likelihood_module.mode(params)

        z_sl = jnp.ceil(x_sl / self.n_stack_frames).astype(jnp.int32)
        mets = dict(
            loss=loss,
            elbo=elbo,
            log_prob=log_prob,
            kld=kld,
            klds=klds,
            mc_kl=mc_kl,
            x_sl=x_sl,
            beta=jnp.asarray(beta),
            free_nats=jnp.asarray(free_nats),
        )
        outputs = SimpleNamespace(
            loss=loss,
            elbo=elbo,
            klds=klds,
            log_prob=log_prob,
            z=z,
            z_sl=[z_sl] * self._n_stacks,
            enc_mus=mu_q,
            prior_mus=mu_p,
            params=params,
            y=y,
            reconstructions=reconstructions,
            reconstructions_mode=reconstructions_mode,
        )
        return loss, mets, outputs

    def generate(
        self,
        n_samples: int = 1,
        max_timesteps: int = 100,
        use_mode_observations: bool = False,
        x: Optional[jnp.ndarray] = None,
        fast: bool = True,
    ):
        """Ancestral sampling — capability ADDED over the reference, whose
        ``STCN.generate`` raises ``NotImplementedError`` (``stcn.py:435-442``).

        ``fast=True`` (default): Fast-WaveNet-style per-block circular history
        buffers as the ``lax.scan`` carry for BOTH conv stacks — the dilated
        encoder (buffers of size ``dilation``) and the non-dilated decode
        stack (buffers of one column) — so each emitted frame costs
        O(n_blocks·C²) instead of a full receptive-field window re-scan
        (O(rf·n_blocks·C²), the round-3 path measured below real time at
        14k frames/s). Same keys, same contractions, same sample stream as
        the windowed oracle (equality-tested). Falls back to the windowed
        scan for stacked-frame or k≠2 configs.

        Per emitted stack-frame column: a receptive-field window forward
        through the encoder stack (FIFO window, one ``lax.scan`` over columns
        — the WaveNet naive-oracle pattern, cheap here because the STCN rf is
        ~150 frames vs WaveNet's ~5k), top-down PRIOR-only latent sampling
        (same head wiring as ``infer`` with the posterior branch dropped), an
        ``out_rf``-window decode through the dense stack, and a likelihood
        sample (or mode) that becomes the next input column.

        Args mirror the reference stub's signature. ``x`` (B, T) optionally
        primes the window with real audio (zeros otherwise — matching the
        forward's receptive-field zero padding). Returns
        ``((x, x_sl), outputs)`` like the other generating families.
        """
        s = self.n_stack_frames
        rf = self.receptive_field
        n = self._n_latents
        dtype = jnp.bfloat16 if self.bf16 else None

        if fast and self.kernel_size == 2 and s == 1:
            return self._generate_fast(n_samples, max_timesteps, use_mode_observations, x)

        if x is None:
            window = jnp.zeros((n_samples, rf, s), jnp.float32)
        else:
            if x.shape[0] == 1 and n_samples > 1:
                x = jnp.repeat(x, n_samples, axis=0)
            if s > 1:
                x, _ = stack_tensor(x, s, axis=1)
            if x.ndim == 2:
                x = x[..., None]
            pad = max(0, rf - x.shape[1])
            window = jnp.pad(x[:, -rf:], ((0, 0), (pad, 0), (0, 0)))
        B = window.shape[0]

        # the encoder only needs the skips that feed latents (same dead-skip
        # mask as the training forward)
        n_blocks = self.n_layers * self._n_stacks
        used = set(list(range(n - 1, n_blocks, n))[:n])
        skip_mask = [i in used for i in range(n_blocks)]
        order = list(reversed(range(n))) if self.top_down else list(range(n))

        z_window0 = jnp.zeros((B, self._out_rf, sum(self.latent_size)), jnp.float32)
        key = self.make_rng("sample")

        def step(carry, step_key):
            window, z_window = carry
            k_z, k_x = jax.random.split(step_key)

            # ---- encoder window -> one conditioning column per latent level
            out = self.causal(window, pad_causal=False)
            skips = self.res_stack(out, skip_size=1, skip_mask=skip_mask)
            d = skips[n - 1 :: n][:n]  # (B, 1, C) each — the d_p column at t

            # ---- top-down prior sampling (infer's prior branch only)
            z = [None] * n
            for i, l in enumerate(order):
                if i == 0:
                    in_p = d[l]
                else:
                    l_cond = l + 1 if self.top_down else l - 1
                    in_p = jnp.concatenate([d[l], z[l_cond].astype(d[l].dtype)], axis=-1)
                mu_p, sd_p = self.priors[l](in_p)
                z[l] = rsample_gaussian(jax.random.fold_in(k_z, l), mu_p, sd_p)
            z_col = jnp.concatenate(z, axis=-1) if self.dense else z[0]  # (B, 1, Ztot)
            z_window = jnp.concatenate([z_window[:, 1:], z_col], axis=1)

            # ---- decode the out_rf z-window to one likelihood column
            z_dec = z_window.astype(dtype) if self.bf16 else z_window
            skip_logits = self.out_transform(z_dec, skip_size=1)
            logits = sum(at_least_f32(sl) for sl in skip_logits) * self.inv_std
            logits = self.out_upsample(logits)  # (B, 1, D*s)
            if s > 1:
                D = self._likelihood_out_features()
                logits = logits.reshape(B, s, D)
            params = self.likelihood_module(logits)
            if use_mode_observations:
                pred = self.likelihood_module.mode(params)  # (B, s)
            else:
                pred = self.likelihood_module.rsample(k_x, params)
            new_col = pred.reshape(B, 1, s)
            window = jnp.concatenate([window[:, 1:], new_col], axis=1)
            return (window, z_window), pred

        n_steps = max(1, max_timesteps // s) if s > 1 else max_timesteps
        _, preds = jax.lax.scan(step, (window, z_window0), jax.random.split(key, n_steps))
        x_out = jnp.moveaxis(preds, 0, 1).reshape(B, -1)  # (B, n_steps*s)
        x_sl = jnp.full((B,), x_out.shape[1], jnp.int32)
        return (x_out, x_sl), SimpleNamespace()

    def _generate_fast(self, n_samples, max_timesteps, use_mode_observations, x):
        """Circular-buffer ancestral sampling (the Fast-WaveNet recipe applied
        to both STCN stacks; ``wavenet.py:_generate_fast`` is the template).

        Priming: ONE windowed forward of the encoder over the rf history
        window seeds the dilated blocks' circular buffers (``collect_tails``)
        and yields frame 0's conditioning columns; one windowed forward of the
        decode stack over the all-zero initial z-window seeds its buffers —
        the windowed oracle decodes ``[z_window0[1:], z0]`` at step 0, which
        is exactly what feeding ``z0`` after priming on ``z_window0``
        computes. Key schedule mirrors the oracle step for step (split per
        frame, ``fold_in`` per latent level), so the sample stream is
        identical.
        """
        rf = self.receptive_field
        n = self._n_latents
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32

        if x is None:
            window = jnp.zeros((n_samples, rf, self.in_channels), jnp.float32)
        else:
            if x.shape[0] == 1 and n_samples > 1:
                x = jnp.repeat(x, n_samples, axis=0)
            if x.ndim == 2:
                x = x[..., None]
            pad = max(0, rf - x.shape[1])
            window = jnp.pad(x[:, -rf:], ((0, 0), (pad, 0), (0, 0)))
        B = window.shape[0]

        n_blocks = self.n_layers * self._n_stacks
        used = list(range(n - 1, n_blocks, n))[:n]
        skip_mask = [i in set(used) for i in range(n_blocks)]
        order = list(reversed(range(n))) if self.top_down else list(range(n))

        key = self.make_rng("sample")
        step_keys = jax.random.split(key, max_timesteps)

        def sample_z(d_cols, k_z):
            z = [None] * n
            for i, l in enumerate(order):
                if i == 0:
                    in_p = d_cols[l]
                else:
                    l_cond = l + 1 if self.top_down else l - 1
                    in_p = jnp.concatenate([d_cols[l], z[l_cond].astype(d_cols[l].dtype)], axis=-1)
                mu_p, sd_p = self.priors[l](in_p)
                z[l] = rsample_gaussian(jax.random.fold_in(k_z, l), mu_p, sd_p)
            return jnp.concatenate(z, axis=-1) if self.dense else z[0]

        # ---- prime the ENCODER: windowed forward, collect per-block tails ----
        enc_out = self.causal(window, pad_causal=False)
        skips, enc_tails = self.res_stack(enc_out, 1, collect_tails=True, skip_mask=skip_mask)
        d_cols0 = skips[n - 1 :: n][:n]

        # ---- prime the DECODE stack on the all-zero initial z-window ---------
        z_window0 = jnp.zeros((B, self._out_rf, sum(self.latent_size)), jnp.float32)
        z_dec0 = z_window0.astype(dtype) if self.bf16 else z_window0
        _, dec_tails = self.out_transform(z_dec0, 1, collect_tails=True)

        # ---- stack per-block params on a leading block axis -------------------
        inv_std_block = math.sqrt(0.5)
        R = self.res_channels

        def pack(rs_params, blocks):
            per = [rs_params[f"Conv1dResidualGLU_{i}"] for i in range(blocks)]

            def stacked(name):
                return jnp.stack([b[name] for b in per]).astype(dtype)

            w_t, w_s = stacked("gate_kernel_t"), stacked("gate_kernel_s")
            b_t, b_s = stacked("gate_bias_t"), stacked("gate_bias_s")
            w_old = jnp.concatenate([w_t[:, 0], w_s[:, 0]], axis=-1)  # (L, C, 2*half)
            w_cur = jnp.concatenate([w_t[:, 1], w_s[:, 1]], axis=-1)
            # both taps as ONE dot: [old | h] @ [[w_old], [w_cur]] — the step
            # is issue-bound, so one (2C, 2*half) dot beats two (C, 2*half)
            w_oc = jnp.concatenate([w_old, w_cur], axis=1)  # (L, 2C, 2*half)
            b_gate = jnp.concatenate([b_t, b_s], axis=-1)
            w_rs, b_rs = stacked("rs_kernel"), stacked("rs_bias")
            in_k = rs_params["Conv1d_0"]["kernel"].astype(dtype)
            in_b = rs_params["Conv1d_0"]["bias"].astype(dtype)
            half = w_t.shape[-1]
            return (w_oc, b_gate, w_rs, b_rs), in_k, in_b, half

        enc_rs = self.res_stack.variables["params"]
        dec_rs = self.out_transform.variables["params"]
        enc_w, enc_in_k, enc_in_b, enc_half = pack(enc_rs, n_blocks)
        dec_w, dec_in_k, dec_in_b, dec_half = pack(dec_rs, self.n_layers)

        causal_params = self.causal.variables["params"]["Conv1d_0"]
        ck, cb = causal_params["kernel"], causal_params["bias"]

        dilations = ResidualStack.build_dilations(self.n_layers, self._n_stacks, self.base_dilation)
        max_d = max(dilations)
        dil_arr = jnp.asarray(dilations, jnp.int32)
        enc_bufs0 = jnp.stack(
            [jnp.pad(t.astype(dtype), ((0, 0), (0, max_d - d), (0, 0))) for t, d in zip(enc_tails, dilations)]
        )
        dec_bufs0 = jnp.stack([t.astype(dtype) for t in dec_tails])  # (L_dec, B, 1, C)
        used_arr = used  # static python ints

        def enc_block_step(h, xs):
            woc, bg, wrs, brs, buf, slot = xs
            old = jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=1)
            new_buf = jax.lax.dynamic_update_slice_in_dim(buf, h, slot, axis=1)
            gate = jnp.concatenate([old, h], axis=-1) @ woc + bg
            act = jnp.tanh(gate[..., :enc_half]) * jax.nn.sigmoid(gate[..., enc_half:])
            rs = act @ wrs[0] + brs
            r, s_ = rs[..., :R], rs[..., R:]
            return (h + r) * inv_std_block, (new_buf, s_)

        def dec_block_step(carry, xs):
            h, acc = carry
            woc, bg, wrs, brs, buf = xs
            old = buf  # non-dilated: the previous column IS the buffer
            gate = jnp.concatenate([old, h], axis=-1) @ woc + bg
            act = jnp.tanh(gate[..., :dec_half]) * jax.nn.sigmoid(gate[..., dec_half:])
            rs = act @ wrs[0] + brs
            r, s_ = rs[..., :R], rs[..., R:]
            # skip accumulation in block order (matches the windowed
            # ``sum(at_least_f32(sl) for sl in skip_logits)``)
            return ((h + r) * inv_std_block, acc + at_least_f32(s_)), h

        def decode_step(z_col, dec_bufs, k_x):
            z_in = z_col.astype(dtype) if self.bf16 else z_col
            h0 = z_in.astype(dtype) @ dec_in_k[0] + dec_in_b
            acc0 = jnp.zeros((B, 1, R), jnp.float32)
            (_, acc), new_bufs = jax.lax.scan(dec_block_step, (h0, acc0), (*dec_w, dec_bufs), unroll=True)
            logits = self.out_upsample(acc * self.inv_std)  # (B, 1, D)
            params = self.likelihood_module(logits)
            if use_mode_observations:
                pred = self.likelihood_module.mode(params)
            else:
                pred = self.likelihood_module.rsample(k_x, params)
            return pred, new_bufs

        # ---- frame 0: conditioning from the prime, decode via the fast step --
        k_z0, k_x0 = jax.random.split(step_keys[0])
        z0 = sample_z(d_cols0, k_z0)
        pred0, dec_bufs1 = decode_step(z0, dec_bufs0, k_x0)

        def step(carry, step_key):
            prev2, prev1, enc_bufs, dec_bufs, idx = carry
            k_z, k_x = jax.random.split(step_key)
            c = prev2 @ ck[0] + prev1 @ ck[1] + cb  # causal k=2 conv column
            h0 = c.astype(dtype) @ enc_in_k[0] + enc_in_b
            slots = jax.lax.rem(idx, dil_arr)
            _, (new_enc_bufs, s_all) = jax.lax.scan(
                enc_block_step, h0, (*enc_w, enc_bufs, slots), unroll=_BLOCK_UNROLL
            )
            d_cols = [s_all[g] for g in used_arr]
            z_col = sample_z(d_cols, k_z)
            pred, new_dec_bufs = decode_step(z_col, dec_bufs, k_x)
            return (prev1, pred.reshape(B, 1, 1), new_enc_bufs, new_dec_bufs, idx + 1), pred

        carry0 = (window[:, -1:], pred0.reshape(B, 1, 1), enc_bufs0, dec_bufs1, jnp.int32(0))
        _, preds = jax.lax.scan(step, carry0, step_keys[1:])
        x_out = jnp.concatenate([pred0.reshape(B, -1), jnp.moveaxis(preds, 0, 1).reshape(B, -1)], axis=1)
        x_sl = jnp.full((B,), x_out.shape[1], jnp.int32)
        return (x_out, x_sl), SimpleNamespace()

    def build_metrics(self, mets: dict):
        """Per-layer KL decomposition in nats/bpz/bpx (reference ``stcn.py:222-254``)."""
        mets = drop_padded_rows(mets)
        loss, elbo, log_prob, kld, klds, x_sl = (
            mets["loss"],
            mets["elbo"],
            mets["log_prob"],
            mets["kld"],
            mets["klds"],
            mets["x_sl"],
        )
        z_sl = np.asarray(x_sl) // self.n_stack_frames
        n = len(self.latent_size)
        ln2 = math.log(2)

        klds_nats = [KLMetric(klds[l], name=f"kl_{l} (nats)", log_to_console=False) for l in range(n)]
        klds_bpz = [KLMetric(np.asarray(klds[l]) / ln2, name=f"kl_{l} (bpz)", reduce_by=z_sl) for l in range(n)]
        klds_bpx = [KLMetric(np.asarray(klds[l]) / ln2, name=f"kl_{l} (bpx)", reduce_by=x_sl) for l in range(n)]

        return [
            LossMetric(loss, weight_by=int(np.asarray(elbo).size)),
            BitsPerDimMetric(elbo, name="elbo (bpx)", reduce_by=x_sl),
            LLMetric(elbo, name="elbo (nats)"),
            LatestMeanMetric(float(mets["beta"]), name="beta"),
            LatestMeanMetric(float(mets["free_nats"]), name="free_nats"),
            LLMetric(log_prob, name="rec (nats)", log_to_console=False),
            BitsPerDimMetric(log_prob, name="rec (bpx)", reduce_by=x_sl),
            KLMetric(kld, name="kl (nats)", log_to_console=False),
            KLMetric(np.asarray(kld) / ln2, name="kl (bpz)", reduce_by=z_sl),
            *klds_nats,
            *klds_bpz,
            *klds_bpx,
        ]

    def split_sequence(self, x, x_sl, length: int):
        """Chunk a long sequence for memory-constrained forward (WaveNet
        pattern: overlap = the receptive field consumed by pad-free chunks).
        The reference STCN raises NotImplementedError here (stcn.py:328) —
        chunked STCN eval is a capability added beyond the reference."""
        from blvm_tpu.ops.padding import get_modulo_length
        from blvm_tpu.ops.sequence import split_sequence

        overlap = self.receptive_field * self.n_stack_frames
        length = get_modulo_length(length, stride=self.n_stack_frames)
        mode = "extend" if overlap >= length else "consume"
        # extend mode: chunk 0 stays unpadded (first-chunk rf padding supplies
        # the empty history); later chunks carry their overlap context — see
        # WaveNet.split_sequence for why the reference's left-pad is a bug
        return split_sequence(x, x_sl, length=length, overlap=overlap, mode=mode)

    def forward_split(self, x, x_sl, i_split: int, y=None):
        return self(x, x_sl, y=y, pad_receptive_field=(i_split == 0))

    def example_inputs(self):
        T = (self.receptive_field + 8) * self.n_stack_frames
        return (jnp.zeros((1, T), jnp.float32), jnp.full((1,), T, jnp.int32)), {"sample": None}


class _UpsampleHead(nn.Module):
    """Linear + ReLU upsample to likelihood-parameter channels (reference
    ``stcn.py:215-218``)."""

    out_features: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(Dense(self.out_features)(x))
