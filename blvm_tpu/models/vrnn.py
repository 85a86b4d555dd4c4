"""VRNN — Variational Recurrent Neural Network (Chung et al. 2015).

Rebuild of reference ``blvm/models/vrnn.py``. The reference's per-timestep
Python loop over a TorchScript cell (``vrnn.py:306-308``) becomes an
``nn.scan`` over the shared cell: parameters broadcast across time, the
'sample' PRNG stream split per step (explicit key threading replaces torch
global RNG — SURVEY §7 "RNG discipline"), and the whole sequence compiles to a
single fused XLA while-loop.

Model structure (identical to reference):
  * cell: prior MLP(h) → N(µ,σ); posterior MLP([h, x]) → N(µ,σ) (optionally
    residual on the prior mean); reparameterized z; phi_z 4-layer MLP;
    GRUCell([x, phi_z], h) with orthogonal recurrent init.
  * ELBO with stride-aware KL mask, free-nats, beta (``vrnn.py:255-279``).
  * ``VRNNAudio``: frame-stacking LeakyReLU encoder, 3-layer LeakyReLU decoder
    on [phi_z, h], DMoL(num_bins=2**16)/GMM/Gaussian likelihood from a string
    (``vrnn.py:437-545`` — note the 2**16 bins, not the 256 default).
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
from blvm_tpu.modules.common import MLP
from blvm_tpu.modules.distributions import (
    DiagonalGaussianDense,
    DiagonalGaussianMixtureDense,
    DiscretizedLogisticMixtureDense,
)
from blvm_tpu.modules.recurrent import GRUCell
from blvm_tpu.ops.sequence import stack_tensor
from blvm_tpu.ops.variational import kl_divergence_gaussian, rsample_gaussian


def _leaky_relu(v):
    return nn.leaky_relu(v, 0.01)


class VRNNCell(nn.Module):
    """One VRNN timestep: (h, x_t) → (h', step outputs). Submodules are
    setup-defined so generation can reuse them piecewise (prior-only path)."""

    x_dim: int
    h_dim: int
    z_dim: int
    r_dim: Optional[int] = None
    condition_h_on_x: bool = True
    residual_posterior: bool = False

    def setup(self):
        self.prior_mlp = MLP([self.h_dim] * 3, activation=nn.relu, activate_final=True)
        self.prior_head = DiagonalGaussianDense(y_dim=self.z_dim)
        self.posterior_mlp = MLP([self.h_dim] * 3, activation=nn.relu, activate_final=True)
        self.posterior_head = DiagonalGaussianDense(y_dim=self.z_dim)
        self.phi_z_net = MLP([self.h_dim] * 4, activation=nn.relu, activate_final=True)
        self.gru = GRUCell(hidden_size=self.r_dim or 2 * self.h_dim, orthogonal_hh=True)

    def prior_params(self, h):
        return self.prior_head(self.prior_mlp(h))

    def posterior_params(self, h, x):
        return self.posterior_head(self.posterior_mlp(jnp.concatenate([h, x], axis=-1)))

    def phi_z_features(self, z):
        return self.phi_z_net(z)

    def gru_step(self, inputs, h):
        return self.gru(inputs, h)

    def __call__(self, h, x):
        prior_mu, prior_sd = self.prior_params(h)
        enc_mu, enc_sd = self.posterior_params(h, x)
        if self.residual_posterior:
            enc_mu = enc_mu + prior_mu

        z = rsample_gaussian(self.make_rng("sample"), enc_mu, enc_sd)
        phi_z = self.phi_z_features(z)

        if self.condition_h_on_x:
            h = self.gru_step(jnp.concatenate([x, phi_z], axis=-1), h)
        else:
            h = self.gru_step(phi_z, h)

        outputs = dict(h=h, z=z, enc_mu=enc_mu, enc_sd=enc_sd, prior_mu=prior_mu, prior_sd=prior_sd, phi_z=phi_z)
        return h, outputs

    def generate_step(self, h, x, key, use_mode: bool = False):
        """Prior-only step (reference ``vrnn.py:143-164``)."""
        prior_mu, prior_sd = self.prior_params(h)
        z = prior_mu if use_mode else rsample_gaussian(key, prior_mu, prior_sd)
        phi_z = self.phi_z_features(z)
        if self.condition_h_on_x:
            h = self.gru_step(jnp.concatenate([x, phi_z], axis=-1), h)
        else:
            h = self.gru_step(phi_z, h)
        return h, dict(h=h, z=z, phi_z=phi_z)


class VRNN(nn.Module):
    """Sequence-level VRNN with pluggable encoder/decoder/likelihood modules."""

    encoder: nn.Module
    decoder: nn.Module
    likelihood: nn.Module
    x_dim: int
    h_dim: int
    z_dim: int
    r_dim: Optional[int] = None
    residual_posterior: bool = False
    condition_h_on_x: bool = True
    condition_x_on_h: bool = True
    dropout: float = 0.0
    unroll: int = 1  # time-scan unroll factor (TPU scheduling knob, same math)

    def setup(self):
        self.cell = VRNNCell(
            x_dim=self.x_dim,
            h_dim=self.h_dim,
            z_dim=self.z_dim,
            r_dim=self.r_dim,
            condition_h_on_x=self.condition_h_on_x,
            residual_posterior=self.residual_posterior,
        )
        self._r_dim = self.r_dim or 2 * self.h_dim

    def compute_elbo(self, y, parameters, kld_twise, x_sl, stride: int, beta=1.0, free_nats=0.0):
        """Loss + per-example ELBO decomposition (reference ``vrnn.py:255-279``)."""
        from blvm_tpu.models.elbo import compute_sequence_elbo

        return compute_sequence_elbo(self.likelihood, y, parameters, kld_twise, x_sl, stride, beta, free_nats)

    def __call__(self, x, x_sl, beta=1.0, free_nats=0.0, h0=None):
        if x.ndim == 2:
            x = x[..., None]

        y = jax.lax.stop_gradient(x)

        encoding = self.encoder(x)  # (B, T', D)
        stride = math.ceil(x.shape[1] / encoding.shape[1])

        B = x.shape[0]
        h = jnp.zeros((B, self._r_dim), x.dtype) if h0 is None else h0

        # scan the shared cell over time (params broadcast, per-step sample rng)
        def body(mdl, carry, x_t):
            return mdl.cell(carry, x_t)

        # unroll: on v5e the scan is per-iteration-latency bound; unroll=8
        # measured 9.87 -> 6.93 ms on the flagship step (roofline_scan.py)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )
        _, outs = scan(self, h, encoding)

        # h sequence shifted: include initial h, drop last (reference vrnn.py:310-311)
        all_h = jnp.concatenate([h[:, None], outs["h"][:, :-1]], axis=1)  # (B, T', r_dim)
        phi_z = outs["phi_z"]

        if self.condition_x_on_h:
            dec = self.decoder(jnp.concatenate([phi_z, all_h], axis=-1))
        else:
            dec = self.decoder(phi_z)

        # static truncation to the target length (reference truncates to
        # max(x_sl), which equals T under exact padding — vrnn.py:328)
        dec = dec[:, : y.shape[1], :]
        if self.dropout:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, dec.shape)
            dec = jnp.where(keep, dec / (1.0 - self.dropout), 0.0)

        parameters = self.likelihood(dec)
        reconstruction = self.likelihood.sample(self.make_rng("sample"), parameters)
        reconstruction_mode = self.likelihood.mode(parameters)

        kld = kl_divergence_gaussian(outs["enc_mu"], outs["enc_sd"], outs["prior_mu"], outs["prior_sd"])

        # the reference VRNN reports the free-nats-discounted KL (vrnn.py:272-278)
        loss, elbo, log_prob, _, kl, seq_mask = self.compute_elbo(y, parameters, kld, x_sl, stride, beta, free_nats)

        # MC form of the KL at the drawn z — the per-sample log-weight term for
        # importance-weighted bounds (evaluation/bounds.py)
        from blvm_tpu.models.elbo import masked_strided_sum
        from blvm_tpu.ops.variational import kl_divergence_gaussian_mc

        mc_kld = kl_divergence_gaussian_mc(
            outs["enc_mu"], outs["enc_sd"], outs["prior_mu"], outs["prior_sd"], outs["z"]
        )
        mc_kl = masked_strided_sum(mc_kld, x_sl, y.shape[1], stride)

        z = outs["z"]
        z_sl = jnp.ceil(x_sl / stride).astype(jnp.int32)
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
            seq_mask=seq_mask,
            z=z,
            z_sl=z_sl,
            reconstructions=reconstruction,
            reconstructions_mode=reconstruction_mode,
            reconstructions_parameters=parameters,
            # reference quirk kept for split-eval parity: h_n is the h INPUT of
            # the final step (all_h[-1] after the pop at vrnn.py:310-311), i.e.
            # one update stale, not the post-step state
            h_n=all_h[:, -1],
        )
        return loss, mets, outputs


class VRNNAudio(BaseModel):
    """VRNN over raw waveforms with frame stacking (reference ``vrnn.py:437-545``).

    ``r_dim`` (GRU state size, default ``2*hidden_size``) is exposed here
    unlike the reference's audio wrapper — its VRNN core takes it but
    VRNNAudio never forwards it (vrnn.py:437-449).
    """

    likelihood: str = "DMoL"
    input_size: int = 200
    hidden_size: int = 256
    latent_size: int = 64
    r_dim: Optional[int] = None
    residual_posterior: bool = False
    condition_h_on_x: bool = True
    condition_x_on_h: bool = True
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
        self.vrnn = VRNN(
            encoder=encoder,
            decoder=decoder,
            likelihood=likelihood_module,
            x_dim=self.hidden_size,
            h_dim=self.hidden_size,
            z_dim=self.latent_size,
            r_dim=self.r_dim,
            residual_posterior=self.residual_posterior,
            condition_h_on_x=self.condition_h_on_x,
            condition_x_on_h=self.condition_x_on_h,
            unroll=self.unroll,
        )

    def _make_likelihood(self):
        if self.likelihood == "DMoL":
            # note: 2**16 bins here, not self.num_bins (reference vrnn.py:468)
            return DiscretizedLogisticMixtureDense(y_dim=1, num_mix=10, num_bins=2**16)
        if self.likelihood == "GMM":
            return DiagonalGaussianMixtureDense(y_dim=1, num_mix=self.num_mix, initial_sd=1, epsilon=1e-4)
        if self.likelihood == "Gaussian":
            return DiagonalGaussianDense(y_dim=1, epsilon=1e-4)
        raise ValueError(f"Unknown likelihood type {self.likelihood}")

    def _likelihood_out_features(self) -> int:
        if self.likelihood == "DMoL":
            return 10 * (2 * 1 + 1)
        if self.likelihood == "GMM":
            return self.num_mix * (2 * 1 + 1)
        if self.likelihood == "Gaussian":
            return 2
        raise ValueError(self.likelihood)

    def __call__(self, x, x_sl, beta=1.0, free_nats=0.0, h0=None):
        return self.vrnn(x, x_sl, beta, free_nats, h0)

    @staticmethod
    def build_metrics(mets: dict):
        """Reference metric set (``vrnn.py:346-355``)."""
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

    def generate(self, n_samples: int = 1, max_timesteps: int = 100, use_mode: bool = False, x=None, h0=None):
        """Prior rollout: encode current frame-stack, prior-sample z, decode the
        next stack, feed it back — one ``lax.scan`` over stacks (the reference
        loops in Python, ``vrnn.py:397-428``)."""
        S = self.input_size
        if x is None:
            x = jnp.zeros((n_samples, S, 1), jnp.float32)
        elif x.shape[0] == 1 and n_samples > 1:
            x = jnp.repeat(x, n_samples, axis=0)

        B = x.shape[0]
        r_dim = self.vrnn.r_dim or 2 * self.vrnn.h_dim  # same rule as training (VRNN.setup)
        h = jnp.zeros((B, r_dim), jnp.float32) if h0 is None else h0
        key = self.make_rng("sample")

        def body(mdl, carry, step_key):
            x_in, h_in = carry
            k_z, k_x = jax.random.split(step_key)
            enc = mdl.vrnn.encoder(x_in)[:, 0, :]  # one stack → one step
            h_new, outs = mdl.vrnn.cell.generate_step(h_in, enc, k_z, use_mode=use_mode)

            if mdl.condition_x_on_h:
                dec = mdl.vrnn.decoder(jnp.concatenate([outs["phi_z"], h_new], axis=-1)[:, None, :])
            else:
                dec = mdl.vrnn.decoder(outs["phi_z"][:, None, :])
            params = mdl.vrnn.likelihood(dec)
            x_next = mdl.vrnn.likelihood.mode(params) if use_mode else mdl.vrnn.likelihood.rsample(k_x, params)
            if x_next.ndim == 2:
                x_next = x_next[..., None]
            return (x_next, h_new), x_next

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=0,
            out_axes=0,
            unroll=self.unroll,  # same scheduling knob as training (same math)
        )
        (_, _), frames = scan(self, (x, h), jax.random.split(key, max_timesteps))
        frames = jnp.moveaxis(frames, 0, 1)  # (B, T', S, 1)
        x_out = frames.reshape(B, -1, 1)
        x_sl = jnp.full((B,), x_out.shape[1], jnp.int32)
        return (x_out, x_sl), SimpleNamespace()

    def example_inputs(self):
        T = 2 * self.input_size
        return (jnp.zeros((1, T), jnp.float32), jnp.full((1,), T, jnp.int32)), {"sample": None}


class _StackedEncoder(nn.Module):
    """(B, T, 1) → stack frames → 3-layer LeakyReLU MLP → (B, T/S, H)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)  # (B, T)
        x, _ = stack_tensor(x, self.input_size, axis=1)  # (B, T/S, S)
        return MLP([self.hidden_size] * 3, activation=_leaky_relu, activate_final=True)(x)


class _UnstackingDecoder(nn.Module):
    """(B, T', 3H) → 3-layer LeakyReLU MLP to S*D → (B, T'*S, D)."""

    hidden_size: int
    input_size: int
    out_features: int

    @nn.compact
    def __call__(self, d):
        d = MLP(
            [self.hidden_size, self.hidden_size, self.input_size * self.out_features],
            activation=_leaky_relu,
            activate_final=True,
        )(d)
        B, Ts, _ = d.shape
        return d.reshape(B, Ts * self.input_size, self.out_features)
