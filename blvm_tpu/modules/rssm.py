"""RSSM cell — the per-level recurrent core of the Clockwork-VAE.

Rebuild of reference ``blvm/modules/rssm.py:18-123``: GRUCell state transition
on ``ReLU(Linear([z, context]))``, 3-layer MLP prior and posterior heads
(posterior sees ``[h_new, enc]``), optional residual or precision-weighted
posterior. Sampling takes an explicit PRNG key.
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from blvm_tpu.modules.common import MLP, Dense
from blvm_tpu.modules.distributions import DiagonalGaussianDense
from blvm_tpu.modules.recurrent import GRUCell
from blvm_tpu.ops.variational import precision_weighted_gaussian, rsample_gaussian


class RSSMCell(nn.Module):
    z_dim: int
    h_dim: int
    c_dim: int
    e_dim: int
    residual_posterior: bool = False
    precision_posterior: bool = False

    def setup(self):
        self.gru_in = Dense(self.h_dim)
        self.gru_cell = GRUCell(hidden_size=self.h_dim)
        self.prior_mlp = MLP([self.h_dim] * 3, activation=nn.relu, activate_final=True)
        self.prior_head = DiagonalGaussianDense(y_dim=self.z_dim)
        self.posterior_mlp = MLP([self.h_dim] * 3, activation=nn.relu, activate_final=True)
        self.posterior_head = DiagonalGaussianDense(y_dim=self.z_dim)

    def initial_state(self, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (jnp.zeros((batch_size, self.z_dim)), jnp.zeros((batch_size, self.h_dim)))

    def empty_context(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, 0))

    def _transition(self, z, h, context):
        gru_input = nn.relu(self.gru_in(jnp.concatenate([z, context], axis=-1)))
        return self.gru_cell(gru_input, h)

    def __call__(self, enc_inputs, state, context, key, use_mode: bool = False):
        """Posterior step: returns ``((z_new, h_new), distributions)``."""
        z, h = state
        h_new = self._transition(z, h, context)

        enc_mu, enc_sd = self.posterior_head(self.posterior_mlp(jnp.concatenate([h_new, enc_inputs], axis=-1)))
        prior_mu, prior_sd = self.prior_head(self.prior_mlp(h_new))

        if self.residual_posterior:
            enc_mu = enc_mu + prior_mu
        elif self.precision_posterior:
            enc_mu, enc_sd = precision_weighted_gaussian(enc_mu, enc_sd, prior_mu, prior_sd)

        z_new = enc_mu if use_mode else rsample_gaussian(key, enc_mu, enc_sd)

        distributions = dict(z=z_new, enc_mu=enc_mu, enc_sd=enc_sd, prior_mu=prior_mu, prior_sd=prior_sd)
        return (z_new, h_new), distributions

    def generate(self, state, context, key, use_mode: bool = False):
        """Prior-only step."""
        z, h = state
        h_new = self._transition(z, h, context)
        prior_mu, prior_sd = self.prior_head(self.prior_mlp(h_new))
        z_new = prior_mu if use_mode else rsample_gaussian(key, prior_mu, prior_sd)
        distributions = dict(z=z_new, prior_mu=prior_mu, prior_sd=prior_sd)
        return (z_new, h_new), distributions
