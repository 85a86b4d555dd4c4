"""Clockwork-VAE — hierarchical temporal VAE (Saxena et al. 2021, audio).

Rebuild of reference ``blvm/models/clockwork_vae/clockwork_vae.py``. Levels run
top-down; each level is a time loop of its RSSM cell at stride
``prod(strides[:l])``, with context = the decoder-upsampled ``[z, h]`` of the
level above. Per-level same-padding bookkeeping keeps encoder/decoder lengths
aligned; chunked evaluation carries per-level ``(z, h)`` states extracted at
each example's true stop index.

TPU mapping: each level's Python time loop (reference
``clockwork_vae.py:272-281``) is an ``nn.scan`` over the level's RSSM cell —
the model compiles to ``num_levels`` nested-free sequential scans plus
feed-forward conv coders. State resets on parent ticks are a mask input to the
scan rather than Python control flow.
"""

import math
from types import SimpleNamespace
from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blvm_tpu.evaluation.metrics import (
    BitsPerDimMetric,
    EMAMetric,
    drop_padded_rows,
    KLMetric,
    LLMetric,
    LatestMeanMetric,
    LossMetric,
)
from blvm_tpu.models.base import BaseModel
from blvm_tpu.models.clockwork_vae.conv_coders import ConvCoder1d
from blvm_tpu.modules.distributions import (
    DiagonalGaussianDense,
    DiagonalGaussianMixtureDense,
    DiscretizedLogisticMixtureDense,
)
from blvm_tpu.modules.rssm import RSSMCell
from blvm_tpu.ops.likelihoods import at_least_f32
from blvm_tpu.ops.padding import get_modulo_length, get_same_padding, pad_modulo
from blvm_tpu.ops.sequence import sequence_mask, split_sequence
from blvm_tpu.ops.variational import discount_free_nats, kl_divergence_gaussian


class CWVAE(nn.Module):
    z_size: Sequence[int]
    h_size: Sequence[int]
    strides: Sequence[int]
    encoder: ConvCoder1d
    decoder: ConvCoder1d
    likelihood: nn.Module
    g_size: int = 0
    residual_posterior: bool = False
    precision_posterior: bool = False
    with_resets: bool = False
    unroll: int = 1  # level-scan unroll factor (TPU scheduling knob, same math)

    def setup(self):
        self.num_levels = len(self.strides)
        self.overall_strides = np.cumprod(self.strides)
        self.overall_stride = int(self.overall_strides[-1])
        self.overall_receptive_field = self.encoder.overall_receptive_field
        self.overall_receptive_fields = self.encoder.overall_receptive_fields
        self.receptive_fields = self.encoder.receptive_fields

        self.e_size = self.encoder.e_size
        # context size per level: decoder hidden of the level above; top has none
        self.c_size = list(self.decoder.e_size[1:]) + [0]

        self.cells = [
            RSSMCell(
                h_dim=h,
                z_dim=z,
                c_dim=c,
                e_dim=e,
                residual_posterior=self.residual_posterior,
                precision_posterior=self.precision_posterior,
                name=f"cell_{l}",
            )
            for l, (h, z, c, e) in enumerate(zip(self.h_size, self.z_size, self.c_size, self.e_size))
        ]

    # ------------------------------------------------------------------ losses

    def compute_elbo(self, y, seq_mask, level_masks, x_sl, parameters, kld_layerwise, beta=1.0, free_nats=0.0):
        log_prob_twise = self.likelihood.log_prob(y, parameters, reduce_dim=-1) * seq_mask
        log_prob = log_prob_twise.reshape(y.shape[0], -1).sum(axis=1)  # (B,)

        kld_l, klds_fn = [], []
        for l in range(self.num_levels):
            mask = level_masks[l][..., None]
            # free-nats budget scales with the level's stride relative to the bottom z
            fn = free_nats * self.overall_strides[l] / self.overall_strides[0]
            kld_l.append((kld_layerwise[l] * mask).sum(axis=(1, 2)))
            klds_fn.append((discount_free_nats(kld_layerwise[l], fn, shared_dims=-1) * mask).sum(axis=(1, 2)))

        kld, kld_fn = sum(kld_l), sum(klds_fn)
        elbo = log_prob - kld
        loss = -(log_prob - beta * kld_fn).sum() / x_sl.sum()
        return loss, elbo, log_prob, kld, kld_l

    # ----------------------------------------------------------------- chunking

    def split_sequence(self, x, x_sl, length: int):
        """Chunks overlap by ``rf − stride`` (the overlap a non-split conv would
        have) and are wholly strideable (reference ``clockwork_vae.py:163-174``)."""
        length = get_modulo_length(length, self.overall_stride, self.overall_receptive_field)
        overlap = self.overall_receptive_field - self.overall_stride
        return split_sequence(x, x_sl, length=length, overlap=overlap)

    def forward_split(self, x, x_sl, is_last_split: bool, state0=None, beta=1.0, free_nats=0.0, y=None):
        return self(
            x, x_sl, state0=state0, beta=beta, free_nats=free_nats, y=y,
            pad_strideable=False, pad_same=is_last_split,
        )

    # ------------------------------------------------------------------ forward

    def _run_level(self, l: int, encodings_l, context, states_l, B: int):
        """Scan the level-l RSSM cell over time with optional parent-tick resets."""
        T_l = context.shape[1]
        cell = self.cells[l]

        if self.with_resets and l < self.num_levels - 1:
            t_idx = np.arange(T_l)
            resets = jnp.asarray((t_idx % self.strides[l + 1]) == 0)
        else:
            resets = jnp.zeros((T_l,), bool)

        z0 = jnp.zeros((B, self.z_size[l]))
        h0 = jnp.zeros((B, self.h_size[l]))

        def body(mdl, carry, xs):
            enc_t, ctx_t, reset_t = xs
            z, h = carry
            if mdl.with_resets and l < mdl.num_levels - 1:
                z = jnp.where(reset_t[:, None], jnp.zeros_like(z), z)
                h = jnp.where(reset_t[:, None], jnp.zeros_like(h), h)
            key = mdl.make_rng("sample")
            state, dists = mdl.cells[l](enc_t, (z, h), ctx_t, key)
            outs = dict(z=state[0], h=state[1], **{k: v for k, v in dists.items() if k != "z"})
            return state, outs

        # unroll: the per-level RSSM scans are per-iteration-latency bound like
        # the VRNN/SRNN cells; unroll=8 measured 16.1 -> 14.1 ms on the
        # flagship step (roofline_scan.py lever family)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )
        state_n, outs = scan(self, states_l, (encodings_l, context, resets[None, :].repeat(B, 0)))
        return state_n, outs

    def __call__(
        self,
        x,
        x_sl,
        state0: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
        beta=1.0,
        free_nats=0.0,
        y=None,
        pad_strideable: bool = False,
        pad_same: bool = True,
        use_mode_global: bool = False,
    ):
        if x.ndim == 2:
            x = x[..., None]

        if pad_strideable and not pad_same:
            x = pad_modulo(x, self.overall_stride, self.overall_receptive_field, axis=1)

        if y is None:
            y = jax.lax.stop_gradient(x)

        if not pad_same:
            # without same padding the convs consume the tail of x
            same_padding = get_same_padding(x.shape[1], self.overall_stride, self.overall_receptive_field)
            x_sl = jnp.clip(x_sl - same_padding, 0)
            if same_padding:
                y = y[:, :-same_padding]

        B = x.shape[0]
        seq_mask = sequence_mask(x_sl, max_len=y.shape[1], dtype=jnp.float32)

        # per-level same paddings (static ints from static shapes)
        same_paddings = []
        for l in range(self.num_levels):
            input_length = math.ceil(x.shape[1] / self.strides[l - 1]) if l > 0 else x.shape[1]
            padding = get_same_padding(input_length, kernel_size=self.receptive_fields[l], stride=self.strides[l])
            same_paddings.append(padding)

        encoder_right_pad = same_paddings if pad_same else [0] * self.num_levels
        encodings = self.encoder(x, pad_right=encoder_right_pad)  # list of (B, T_l, C)
        # RSSM scans and the likelihood stay at least f32 regardless of coder dtype
        encodings = [at_least_f32(e) for e in encodings]

        state_dtype = encodings[0].dtype
        states = (
            [
                (jnp.zeros((B, self.z_size[l]), state_dtype), jnp.zeros((B, self.h_size[l]), state_dtype))
                for l in range(self.num_levels)
            ]
            if state0 is None
            else state0
        )

        context = jnp.zeros((B, encodings[-1].shape[1], 0))

        kld_l = [None] * self.num_levels
        mc_kld_l = [None] * self.num_levels
        latents = [None] * self.num_levels
        enc_mus = [None] * self.num_levels
        prior_mus = [None] * self.num_levels
        level_masks = [None] * self.num_levels
        level_sl = [None] * self.num_levels
        next_state0 = [None] * self.num_levels

        for l in range(self.num_levels - 1, -1, -1):
            T_l = encodings[l].shape[1] if pad_same else context.shape[1]
            enc_l = encodings[l][:, :T_l]
            ctx_l = context[:, :T_l]

            _, outs = self._run_level(l, enc_l, ctx_l, states[l], B)

            z_seq, h_seq = outs["z"], outs["h"]  # (B, T_l, ·)

            # extract per-example state at its true stop index for chunk carry
            sl_l = jnp.ceil(x_sl / self.overall_strides[l]).astype(jnp.int32)
            stop_idx = jnp.clip(sl_l - 1, 0, T_l - 1)
            gather = lambda s: jnp.take_along_axis(s, stop_idx[:, None, None], axis=1)[:, 0]
            next_state0[l] = (gather(z_seq), gather(h_seq))

            level_sl[l] = sl_l
            level_masks[l] = sequence_mask(sl_l, max_len=T_l, dtype=jnp.float32)

            latents[l] = z_seq
            enc_mus[l] = outs["enc_mu"]
            prior_mus[l] = outs["prior_mu"]
            kld_l[l] = kl_divergence_gaussian(outs["enc_mu"], outs["enc_sd"], outs["prior_mu"], outs["prior_sd"])
            from blvm_tpu.ops.variational import kl_divergence_gaussian_mc

            mc_kld_l[l] = (
                kl_divergence_gaussian_mc(
                    outs["enc_mu"], outs["enc_sd"], outs["prior_mu"], outs["prior_sd"], z_seq
                )
                * level_masks[l][..., None]
            ).sum(axis=(1, 2))

            # context for the level below: decoder-upsampled [z, h]
            context_cat = jnp.concatenate([z_seq, h_seq], axis=-1)
            _, context = self.decoder.forward_level(context_cat, level=l, pad_right=same_paddings[l])
            context = at_least_f32(context)

        dec = context[:, : y.shape[1]]
        parameters = self.likelihood(dec)
        reconstruction = self.likelihood.sample(self.make_rng("sample"), parameters)
        reconstruction_mode = self.likelihood.mode(parameters)

        loss, elbo, log_prob, kld, kld_l = self.compute_elbo(
            y, seq_mask, level_masks, x_sl, parameters, kld_l, beta, free_nats
        )

        mets = dict(
            loss=loss,
            elbo=elbo,
            log_prob=log_prob,
            kld=kld,
            kld_l=kld_l,
            mc_kl=sum(mc_kld_l),
            x_sl=x_sl,
            beta=jnp.asarray(beta),
            free_nats=jnp.asarray(free_nats),
        )
        outputs = SimpleNamespace(
            elbo=elbo,
            log_prob=log_prob,
            kld=kld,
            y=y,
            seq_mask=seq_mask,
            z=latents,
            z_sl=level_sl,
            enc_mus=enc_mus,
            prior_mus=prior_mus,
            reconstructions=reconstruction,
            reconstructions_mode=reconstruction_mode,
            reconstructions_parameters=parameters,
            state_n=next_state0,
        )
        return loss, mets, outputs

    def build_metrics(self, mets: dict):
        """Reference metric set incl. EMA bits/frame (``clockwork_vae.py:106-128``)."""
        mets = drop_padded_rows(mets)
        loss, elbo, log_prob, kld, kld_l, x_sl = (
            mets["loss"],
            mets["elbo"],
            mets["log_prob"],
            mets["kld"],
            mets["kld_l"],
            mets["x_sl"],
        )
        x_sl = np.asarray(x_sl)
        ln2 = math.log(2)

        kld_nats = [KLMetric(kld_l[l], name=f"kl_{l} (nats)", log_to_console=False) for l in range(self.num_levels)]
        kld_bpd = [
            KLMetric(np.asarray(kld_l[l]) / ln2, name=f"kl_{l} (bpt)", reduce_by=x_sl / self.overall_strides[l])
            for l in range(self.num_levels)
        ]

        return [
            LossMetric(loss, weight_by=int(np.asarray(elbo).size)),
            EMAMetric(-np.asarray(elbo) / ln2, name="elbo ema (bpt)", reduce_by=x_sl, weight_by=0.97),
            LLMetric(elbo, name="elbo (nats)"),
            BitsPerDimMetric(elbo, name="elbo (bpt)", reduce_by=x_sl),
            LLMetric(log_prob, name="rec (nats)", log_to_console=False),
            BitsPerDimMetric(log_prob, name="rec (bpt)", reduce_by=x_sl),
            KLMetric(kld, name="kl (nats)", log_to_console=False),
            KLMetric(np.asarray(kld) / ln2, name="kl (bpt)", reduce_by=x_sl / self.overall_strides[0]),
            *kld_nats,
            *kld_bpd,
            LatestMeanMetric(float(mets["beta"]), name="beta"),
            LatestMeanMetric(float(mets["free_nats"]), name="free_nats"),
        ]

    def generate(self, n_samples: int = 1, max_timesteps: int = 100, use_mode_observations: bool = False, state0=None):
        """Top-down prior rollout through all levels (reference
        ``clockwork_vae.py:340-393``)."""
        B = n_samples
        states = (
            [(jnp.zeros((B, self.z_size[l])), jnp.zeros((B, self.h_size[l]))) for l in range(self.num_levels)]
            if state0 is None
            else state0
        )

        same_paddings = []
        for l in range(self.num_levels):
            input_length = math.ceil(max_timesteps / self.strides[l - 1]) if l > 0 else max_timesteps
            same_paddings.append(get_same_padding(input_length, self.receptive_fields[l], self.strides[l]))

        T_top = max_timesteps // int(self.overall_strides[-1])
        context = jnp.zeros((B, T_top, 0))

        for l in range(self.num_levels - 1, -1, -1):
            T_l = context.shape[1]

            def body(mdl, carry, xs):
                ctx_t = xs
                key = mdl.make_rng("sample")
                state, dists = mdl.cells[l].generate(carry, ctx_t, key)
                return state, dict(z=state[0], h=state[1])

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False, "sample": True},
                in_axes=1,
                out_axes=1,
                unroll=self.unroll,  # same scheduling knob as training (same math)
            )
            _, outs = scan(self, states[l], context[:, :T_l])

            context_cat = jnp.concatenate([outs["z"], outs["h"]], axis=-1)
            _, context = self.decoder.forward_level(context_cat, level=l, pad_right=same_paddings[l])
            context = context.astype(jnp.float32)

        parameters = self.likelihood(context[:, :max_timesteps])
        x_sample = self.likelihood.sample(self.make_rng("sample"), parameters)
        x_mode = self.likelihood.mode(parameters)
        x = x_mode if use_mode_observations else x_sample
        x_sl = jnp.full((n_samples,), max_timesteps, jnp.int32)
        return (x, x_sl), SimpleNamespace()


class CWVAEAudio(BaseModel):
    """Clockwork-VAE over raw waveforms (reference ``clockwork_vae.py:396-529``)."""

    z_size: Union[int, Sequence[int]] = 64
    h_size: Union[int, Sequence[int]] = 128
    g_size: int = 0
    strides: Sequence[int] = (64, 16, 16)
    residual_posterior: bool = False
    precision_posterior: bool = False
    with_resets: bool = False
    num_level_layers: int = 3
    stride_per_layer: int = 4
    likelihood: str = "DMoL"
    num_mix: int = 10
    num_bins: int = 256
    bf16: bool = False
    unroll: int = 1  # level-scan unroll factor (TPU scheduling knob, same math)

    def setup(self):
        num_levels = len(self.strides)
        z_size = [self.z_size] * num_levels if isinstance(self.z_size, int) else list(self.z_size)
        h_size_list = [self.h_size] * num_levels if isinstance(self.h_size, int) else list(self.h_size)
        c_size = [h + z + self.g_size for h, z in zip(h_size_list, z_size)]
        assert all(h_size_list[0] == hs for hs in h_size_list)
        h_size = h_size_list[0]

        likelihood_module = self._make_likelihood()

        coder_dtype = jnp.bfloat16 if self.bf16 else None
        encoder = ConvCoder1d(
            strides=tuple(self.strides),
            channels_in=1,
            channels=h_size,
            kernel_size=5,
            num_blocks=self.num_level_layers,
            stride_per_block=self.stride_per_layer,
            transposed=False,
            block_type="BlockSeparable",
            dtype=coder_dtype,
        )
        decoder = ConvCoder1d(
            strides=tuple(self.strides),
            channels_in=tuple(c_size),
            channels=h_size,
            channels_out=(h_size,) + (None,) * (num_levels - 1),
            kernel_size=5,
            num_blocks=self.num_level_layers,
            stride_per_block=self.stride_per_layer,
            transposed=True,
            block_type="BlockSeparable",
            dtype=coder_dtype,
        )

        self.cwvae = CWVAE(
            encoder=encoder,
            decoder=decoder,
            likelihood=likelihood_module,
            z_size=tuple(z_size),
            h_size=tuple(h_size_list),
            strides=tuple(self.strides),
            residual_posterior=self.residual_posterior,
            precision_posterior=self.precision_posterior,
            with_resets=self.with_resets,
            g_size=self.g_size,
            unroll=self.unroll,
        )

    def _make_likelihood(self):
        if self.likelihood == "DMoL":
            return DiscretizedLogisticMixtureDense(y_dim=1, num_mix=self.num_mix, num_bins=self.num_bins)
        if self.likelihood == "Gaussian":
            return DiagonalGaussianDense(y_dim=1, epsilon=1e-2)
        if self.likelihood == "GMM":
            return DiagonalGaussianMixtureDense(y_dim=1, num_mix=self.num_mix, initial_sd=1, epsilon=1e-2)
        raise ValueError(f"Unknown likelihood type {self.likelihood}")

    @property
    def overall_receptive_field(self):
        return ConvCoder1d.level_geometry(tuple(self.strides), 5, self.stride_per_layer, self.num_level_layers)[2][-1]

    @property
    def overall_stride(self):
        return int(np.prod(self.strides))

    def split_sequence(self, x, x_sl, length: int):
        length = get_modulo_length(length, self.overall_stride, self.overall_receptive_field)
        overlap = self.overall_receptive_field - self.overall_stride
        return split_sequence(x, x_sl, length=length, overlap=overlap)

    def __call__(
        self,
        x,
        x_sl,
        state0=None,
        beta=1.0,
        free_nats=0.0,
        pad_strideable: bool = True,
        pad_same: bool = True,
        y=None,
    ):
        return self.cwvae(x, x_sl, state0, beta, free_nats, y, pad_strideable, pad_same)

    def forward_split(self, x, x_sl, is_last_split: bool, state0=None, beta=1.0, free_nats=0.0, y=None):
        return self.cwvae.forward_split(x, x_sl, is_last_split, state0, beta, free_nats, y)

    def build_metrics(self, mets: dict):
        return self.cwvae_build_metrics(mets)

    def cwvae_build_metrics(self, mets: dict):
        """Host-side metric construction mirroring CWVAE.build_metrics without
        needing a bound module."""
        num_levels = len(self.strides)
        overall_strides = np.cumprod(self.strides)
        mets = drop_padded_rows(mets)
        loss, elbo, log_prob, kld, kld_l, x_sl = (
            mets["loss"],
            mets["elbo"],
            mets["log_prob"],
            mets["kld"],
            mets["kld_l"],
            mets["x_sl"],
        )
        x_sl = np.asarray(x_sl)
        ln2 = math.log(2)

        kld_nats = [KLMetric(kld_l[l], name=f"kl_{l} (nats)", log_to_console=False) for l in range(num_levels)]
        kld_bpd = [
            KLMetric(np.asarray(kld_l[l]) / ln2, name=f"kl_{l} (bpt)", reduce_by=x_sl / overall_strides[l])
            for l in range(num_levels)
        ]

        return [
            LossMetric(loss, weight_by=int(np.asarray(elbo).size)),
            EMAMetric(-np.asarray(elbo) / ln2, name="elbo ema (bpt)", reduce_by=x_sl, weight_by=0.97),
            LLMetric(elbo, name="elbo (nats)"),
            BitsPerDimMetric(elbo, name="elbo (bpt)", reduce_by=x_sl),
            LLMetric(log_prob, name="rec (nats)", log_to_console=False),
            BitsPerDimMetric(log_prob, name="rec (bpt)", reduce_by=x_sl),
            KLMetric(kld, name="kl (nats)", log_to_console=False),
            KLMetric(np.asarray(kld) / ln2, name="kl (bpt)", reduce_by=x_sl / overall_strides[0]),
            *kld_nats,
            *kld_bpd,
            LatestMeanMetric(float(mets["beta"]), name="beta"),
            LatestMeanMetric(float(mets["free_nats"]), name="free_nats"),
        ]

    def generate(self, n_samples: int = 1, max_timesteps: int = 100, use_mode_observations: bool = False, state0=None):
        return self.cwvae.generate(
            n_samples=n_samples,
            max_timesteps=max_timesteps,
            use_mode_observations=use_mode_observations,
            state0=state0,
        )

    def example_inputs(self):
        T = 2 * self.overall_stride
        return (jnp.zeros((1, T), jnp.float32), jnp.full((1,), T, jnp.int32)), {"sample": None}
