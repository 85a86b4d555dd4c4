"""SRNN — Stochastic Recurrent Neural Network (Fraccaro et al. 2016).

Rebuild of reference ``blvm/models/srnn.py``. Structure (identical):
  * deterministic forward GRU ``d`` over the shifted input encoding
    (``u_t = enc(x_{t-1})``, zeros at t=0 — ``srnn.py:192-197``); the d
    sequence is shifted to prepend the initial state and drop the last.
  * smoothing: backward GRU ``a`` over the padding-preserving reverse of
    ``[x_enc, d]`` (``srnn.py:202-206``), or a filtering MLP.
  * per-step latent chain (``srnn.py:224-253``): prior on ``[d_t, z_{t-1}]``,
    posterior on ``[a_t, z_{t-1}]`` (optionally GRU-gated stochastic transfer,
    optionally residual posterior), reparameterized z — here one ``lax.scan``
    whose only sequential work is the small latent MLP chain; the two GRUs
    run as time-parallel-projection scans.
  * decoder on ``[z, d]``; same ELBO as VRNN.
"""

import math
from types import SimpleNamespace
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blvm_tpu.evaluation.metrics import BitsPerDimMetric, drop_padded_rows, KLMetric, LatestMeanMetric, LLMetric, LossMetric
from blvm_tpu.models.base import BaseModel
from blvm_tpu.models.elbo import compute_sequence_elbo
from blvm_tpu.models.vrnn import _StackedEncoder, _UnstackingDecoder
from blvm_tpu.modules.common import MLP
from blvm_tpu.modules.distributions import (
    DiagonalGaussianDense,
    DiagonalGaussianMixtureDense,
    DiscretizedLogisticMixtureDense,
)
from blvm_tpu.modules.recurrent import GRU, GRUCell
from blvm_tpu.ops.padding import get_modulo_length
from blvm_tpu.ops.sequence import reverse_sequences, sequence_mask, split_sequence
from blvm_tpu.ops.variational import kl_divergence_gaussian, rsample_gaussian


def _leaky_relu(v):
    return nn.leaky_relu(v, 0.01)


class _SRNNStep(nn.Module):
    """Per-step latent chain: ((z, h_p, h_q), (d_t, a_t)) → next carry + stats."""

    h_dim: int
    z_dim: int
    r_dim: int
    use_phi_z: bool
    gated_stochastic_transfer: bool
    residual_posterior: bool

    def setup(self):
        self.prior_net = nn.Sequential(
            [MLP([self.h_dim] * 3, activation=_leaky_relu, activate_final=True), DiagonalGaussianDense(y_dim=self.z_dim)]
        )
        self.posterior_net = nn.Sequential(
            [MLP([self.h_dim] * 3, activation=_leaky_relu, activate_final=True), DiagonalGaussianDense(y_dim=self.z_dim)]
        )
        if self.use_phi_z:
            self.phi_z = MLP([self.h_dim] * 4, activation=_leaky_relu, activate_final=True)
        if self.gated_stochastic_transfer:
            self.gru_cell = GRUCell(hidden_size=self.r_dim)

    def __call__(self, carry, inputs):
        # carry is (z, h_p, h_q) when gated (GRU states are real carries) and
        # just (z,) otherwise — in the ungated mode h_p/h_q are recomputed
        # concatenations, not state (reference srnn.py:229-234)
        if self.gated_stochastic_transfer:
            z_t, h_p, h_q = carry
        else:
            (z_t,) = carry
        d_t, a_t = inputs

        z_feat = self.phi_z(z_t) if self.use_phi_z else z_t

        if self.gated_stochastic_transfer:
            h_p = self.gru_cell(jnp.concatenate([d_t, z_feat], axis=-1), h_p)
            h_q = self.gru_cell(jnp.concatenate([a_t, z_feat], axis=-1), h_q)
        else:
            h_p = jnp.concatenate([d_t, z_feat], axis=-1)
            h_q = jnp.concatenate([a_t, z_feat], axis=-1)

        prior_mu, prior_sd = self.prior_net(h_p)
        enc_mu, enc_sd = self.posterior_net(h_q)
        if self.residual_posterior:
            enc_mu = enc_mu + prior_mu

        z_t = rsample_gaussian(self.make_rng("sample"), enc_mu, enc_sd)

        outs = dict(z=z_t, enc_mu=enc_mu, enc_sd=enc_sd, prior_mu=prior_mu, prior_sd=prior_sd, h_p=h_p, h_q=h_q)
        new_carry = (z_t, h_p, h_q) if self.gated_stochastic_transfer else (z_t,)
        return new_carry, outs

    def prior_step(self, carry, d_t, key, use_mode=False):
        """Prior-only step for generation."""
        z_t, h_p = carry
        z_feat = self.phi_z(z_t) if self.use_phi_z else z_t
        if self.gated_stochastic_transfer:
            h_p = self.gru_cell(jnp.concatenate([d_t, z_feat], axis=-1), h_p)
        else:
            h_p = jnp.concatenate([d_t, z_feat], axis=-1)
        prior_mu, prior_sd = self.prior_net(h_p)
        z_t = prior_mu if use_mode else rsample_gaussian(key, prior_mu, prior_sd)
        return z_t, h_p


class SRNN(nn.Module):
    encoder: nn.Module
    decoder: nn.Module
    likelihood: nn.Module
    x_dim: int
    h_dim: int
    z_dim: int
    r_dim: Optional[int] = None
    gated_stochastic_transfer: bool = False
    use_phi_z: bool = False
    dropout: float = 0.0
    residual_posterior: bool = False
    smoothing: bool = True
    unroll: int = 1  # scan unroll for both GRUs + latent chain (TPU knob, same math)

    def setup(self):
        self._r_dim = 2 * self.h_dim if self.r_dim is None else self.r_dim
        self.d_forward_recurrent = GRU(hidden_size=self._r_dim, unroll=self.unroll)
        if self.smoothing:
            self.a_backward_recurrent = GRU(hidden_size=self._r_dim, unroll=self.unroll)
        else:
            self.a_mlp = MLP([self._r_dim, self._r_dim], activation=_leaky_relu, activate_final=True)
        self.step = _SRNNStep(
            h_dim=self.h_dim,
            z_dim=self.z_dim,
            r_dim=self._r_dim,
            use_phi_z=self.use_phi_z,
            gated_stochastic_transfer=self.gated_stochastic_transfer,
            residual_posterior=self.residual_posterior,
        )

    def __call__(
        self,
        x,
        x_sl,
        u=None,
        d_0=None,
        a_0=None,
        z_0=None,
        h_p_0=None,
        h_q_0=None,
        beta=1.0,
        free_nats=0.0,
    ):
        if x.ndim == 2:
            x = x[..., None]
        B = x.shape[0]

        y = jax.lax.stop_gradient(x)

        x_encoding = self.encoder(x)  # (B, T', D)
        stride = math.ceil(x.shape[1] / x_encoding.shape[1])
        x_sl_strided = jnp.ceil(x_sl / stride).astype(jnp.int32)
        Ts = x_encoding.shape[1]

        # u features: shifted encoding (u_t = enc(x_{t-1}), zeros first)
        if u is None:
            u_encoding = jnp.concatenate([jnp.zeros_like(x_encoding[:, :1]), x_encoding[:, :-1]], axis=1)
        else:
            u_encoding = u

        mask_strided = sequence_mask(x_sl_strided, max_len=Ts)

        d_0 = jnp.zeros((B, self._r_dim), x.dtype) if d_0 is None else d_0
        d_out, d_n = self.d_forward_recurrent(u_encoding, mask=mask_strided, initial_state=d_0)
        # shift: prepend initial state, drop last output (reference srnn.py:197)
        d = jnp.concatenate([d_0[:, None], d_out[:, :-1]], axis=1)  # (B, T', r)

        concat = jnp.concatenate([x_encoding, d], axis=-1)
        if self.smoothing:
            # Padding-preserving reversal WITHOUT per-example gathers: a full
            # flip puts each example's valid frames at [T-sl, T) with the
            # (flipped) mask zero over the left padding, so the masked GRU
            # holds a_0 until the valid region starts and then runs exactly
            # over the reversed sequence; flipping the outputs back aligns
            # them at [0, sl). Valid-region numerics are identical to
            # reverse_sequences, but gather's scatter-add backward — measured
            # 35.6 ms vs the GRU's own 2.4 ms on v5e — disappears (positions
            # ≥ sl are zeros instead of stale padding; all consumers mask).
            concat_flip = jnp.flip(concat, axis=1)
            mask_flip = jnp.flip(mask_strided, axis=1)
            a_0 = jnp.zeros((B, self._r_dim), x.dtype) if a_0 is None else a_0
            a_flip, a_n = self.a_backward_recurrent(concat_flip, mask=mask_flip, initial_state=a_0)
            a = jnp.flip(a_flip, axis=1)
        else:
            a = self.a_mlp(concat)
            a_n = None

        z_0 = jnp.zeros((B, self.z_dim), x.dtype) if z_0 is None else z_0
        if self.gated_stochastic_transfer:
            h_p0 = jnp.zeros((B, self._r_dim), x.dtype) if h_p_0 is None else h_p_0
            h_q0 = jnp.zeros((B, self._r_dim), x.dtype) if h_q_0 is None else h_q_0
            carry0 = (z_0, h_p0, h_q0)
        else:
            carry0 = (z_0,)

        def body(mdl, carry, inputs):
            return mdl.step(carry, inputs)

        # unroll: the three serial scans (d-GRU, a-GRU, latent chain) are
        # per-iteration-latency bound on TPU; unroll=8 measured 8.95 -> 6.81 ms
        # on the flagship step (roofline_scan.py)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )
        carry_n, outs = scan(self, carry0, (d, a))
        z_n = carry_n[0]
        h_p_n = outs["h_p"][:, -1]
        h_q_n = outs["h_q"][:, -1]

        z = outs["z"]  # (B, T', z)
        dec = self.decoder(jnp.concatenate([z, d], axis=-1))
        dec = dec[:, : y.shape[1], :]
        if self.dropout:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, dec.shape)
            dec = jnp.where(keep, dec / (1.0 - self.dropout), 0.0)

        parameters = self.likelihood(dec)
        reconstructions = self.likelihood.sample(self.make_rng("sample"), parameters)
        reconstructions_mode = self.likelihood.mode(parameters)

        kld = kl_divergence_gaussian(outs["enc_mu"], outs["enc_sd"], outs["prior_mu"], outs["prior_sd"])

        # the reference SRNN reports the TRUE KL, not the discounted one
        # (srnn.py:153-160) — unlike its VRNN
        loss, elbo, log_prob, kl, _, seq_mask = compute_sequence_elbo(
            self.likelihood, y, parameters, kld, x_sl, stride, beta, free_nats
        )

        # per-sample MC KL for importance-weighted bounds (evaluation/bounds.py)
        from blvm_tpu.models.elbo import masked_strided_sum
        from blvm_tpu.ops.variational import kl_divergence_gaussian_mc

        mc_kld = kl_divergence_gaussian_mc(
            outs["enc_mu"], outs["enc_sd"], outs["prior_mu"], outs["prior_sd"], outs["z"]
        )
        mc_kl = masked_strided_sum(mc_kld, x_sl, y.shape[1], stride)

        mets = dict(
            loss=loss,
            elbo=elbo,
            log_prob=log_prob,
            kl=kl,
            mc_kl=mc_kl,
            x_sl=x_sl,
            beta=jnp.asarray(beta),
            free_nats=jnp.asarray(free_nats),
        )
        outputs = SimpleNamespace(
            elbo=elbo,
            log_prob=log_prob,
            kl=kl,
            y=y,
            parameters=parameters,
            seq_mask=seq_mask,
            z=z,
            z_sl=x_sl_strided,
            d_n=d_n,
            a_n=a_n,
            z_n=z_n,
            h_p_n=h_p_n,
            h_q_n=h_q_n,
            reconstructions=reconstructions,
            reconstructions_mode=reconstructions_mode,
            reconstructions_parameters=parameters,
        )
        return loss, mets, outputs


class SRNNAudio(BaseModel):
    """SRNN over raw waveforms with frame stacking (reference ``srnn.py:406-536``)."""

    likelihood: str = "DMoL"
    input_size: int = 200
    hidden_size: int = 256
    latent_size: int = 64
    dropout: float = 0.0
    residual_posterior: bool = False
    smoothing: bool = True
    num_mix: int = 10
    num_bins: int = 256
    unroll: int = 1  # time-scan unroll factor (TPU scheduling knob, same math)

    def setup(self):
        likelihood_module = self._make_likelihood()
        encoder = _StackedEncoder(input_size=self.input_size, hidden_size=self.hidden_size)
        decoder = _UnstackingDecoder(
            hidden_size=self.hidden_size,
            input_size=self.input_size,
            out_features=self._likelihood_out_features(),
        )
        self.srnn = SRNN(
            encoder=encoder,
            decoder=decoder,
            likelihood=likelihood_module,
            x_dim=self.hidden_size,
            h_dim=self.hidden_size,
            z_dim=self.latent_size,
            dropout=self.dropout,
            residual_posterior=self.residual_posterior,
            smoothing=self.smoothing,
            unroll=self.unroll,
        )

    def _make_likelihood(self):
        if self.likelihood == "DMoL":
            return DiscretizedLogisticMixtureDense(y_dim=1, num_mix=10, num_bins=2**16)
        if self.likelihood == "GMM":
            return DiagonalGaussianMixtureDense(y_dim=1, num_mix=self.num_mix, initial_sd=1, epsilon=1e-4)
        if self.likelihood == "Gaussian":
            return DiagonalGaussianDense(y_dim=1, epsilon=1e-4)
        raise ValueError(f"Unknown likelihood type {self.likelihood}")

    def _likelihood_out_features(self) -> int:
        if self.likelihood == "DMoL":
            return 30
        if self.likelihood == "GMM":
            return self.num_mix * 3
        if self.likelihood == "Gaussian":
            return 2
        raise ValueError(self.likelihood)

    def split_sequence(self, x, x_sl, length: int):
        """No overlap (no observation overlap in SRNN); lengths made wholly
        strideable by the stack size (reference ``srnn.py:489-499``)."""
        length = get_modulo_length(length, self.input_size, kernel_size=self.input_size)
        return split_sequence(x, x_sl, length=length, overlap=0)

    def __call__(self, x, x_sl, beta=1.0, free_nats=0.0, d_0=None, a_0=None, z_0=None):
        loss, mets, outputs = self.srnn(x=x, x_sl=x_sl, d_0=d_0, a_0=a_0, z_0=z_0, beta=beta, free_nats=free_nats)
        outputs.x_hat = outputs.reconstructions
        return loss, mets, outputs

    forward_split = __call__

    @staticmethod
    def build_metrics(mets: dict):
        mets = drop_padded_rows(mets)
        elbo, log_prob, kl, x_sl = mets["elbo"], mets["log_prob"], mets["kl"], mets["x_sl"]
        return [
            LossMetric(mets["loss"], weight_by=int(np.asarray(elbo).size)),
            LLMetric(elbo, name="elbo"),
            LLMetric(log_prob, name="rec"),
            KLMetric(kl),
            KLMetric(np.asarray(kl) / math.log(2), name="kl (bpt)", reduce_by=x_sl),
            BitsPerDimMetric(elbo, reduce_by=x_sl),
            LatestMeanMetric(float(mets["beta"]), name="beta"),
            LatestMeanMetric(float(mets["free_nats"]), name="free_nats"),
        ]

    def generate(self, n_samples: int = 1, max_timesteps: int = 100, use_mode: bool = False, x=None, d_0=None, z_0=None):
        """Unconditional prior rollout as a ``lax.scan`` over stacks
        (reference loops in Python — ``srnn.py:341-398``)."""
        S = self.input_size
        if x is None:
            x = jnp.zeros((n_samples, 1, S), jnp.float32)

        B = x.shape[0]
        r_dim = 2 * self.hidden_size
        d_t = jnp.zeros((B, r_dim), jnp.float32) if d_0 is None else d_0
        z_t = jnp.zeros((B, self.latent_size), jnp.float32) if z_0 is None else z_0
        key = self.make_rng("sample")

        def body(mdl, carry, step_key):
            x_in, d_in, z_in = carry
            k_z, k_x = jax.random.split(step_key)
            u_enc = mdl.srnn.encoder(x_in.reshape(B, S, 1))  # (B, 1, H)
            d_seq, d_new = mdl.srnn.d_forward_recurrent(u_enc, initial_state=d_in)
            d_step = d_seq[:, 0]

            z_new, _ = mdl.srnn.step.prior_step((z_in, d_in), d_step, k_z, use_mode=use_mode)

            dec = mdl.srnn.decoder(jnp.concatenate([z_new, d_step], axis=-1)[:, None, :])
            params = mdl.srnn.likelihood(dec)
            x_next = mdl.srnn.likelihood.mode(params) if use_mode else mdl.srnn.likelihood.rsample(k_x, params)
            x_next = x_next.reshape(B, -1)[:, :S]
            return (x_next, d_new, z_new), x_next

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=0,
            out_axes=0,
            unroll=self.unroll,  # same scheduling knob as training (same math)
        )
        _, frames = scan(self, (x.reshape(B, -1)[:, :S], d_t, z_t), jax.random.split(key, max_timesteps))
        x_out = jnp.moveaxis(frames, 0, 1).reshape(B, -1, 1)
        x_sl = jnp.full((B,), x_out.shape[1], jnp.int32)
        return (x_out, x_sl), SimpleNamespace()

    def example_inputs(self):
        T = 2 * self.input_size
        return (jnp.zeros((1, T), jnp.float32), jnp.full((1,), T, jnp.int32)), {"sample": None}
