"""Dense-parameterized conditional distribution heads (flax).

Rebuild of reference ``blvm/modules/distributions.py:28-387`` with the uniform
interface: ``head(x) -> params`` inside ``apply``, and pure
``log_prob(y, params)`` / ``rsample(key, params)`` / ``sample(key, params)`` /
``mode(params)`` callable anywhere (they only use dataclass config, not
variables). Sampling takes an explicit PRNG key.

Calibrated sd activation: ``softplus_beta(x) + eps`` with
``beta = log 2 / (initial_sd − eps)`` so that sd(0) == initial_sd
(reference ``distributions.py:69-74``).
"""

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from blvm_tpu.modules.common import Dense
from blvm_tpu.ops.likelihoods import (
    bernoulli_ll,
    categorical_ll,
    discretized_logistic_ll,
    discretized_logistic_mixture_ll,
    gaussian_ll,
    gaussian_mixture_ll,
)
from blvm_tpu.ops.variational import (
    rsample_discretized_logistic,
    rsample_discretized_logistic_mixture,
    rsample_gaussian,
    rsample_gaussian_mixture,
)


def softplus_beta(x, beta: float):
    """(1/beta) * softplus(beta * x) — torch's Softplus(beta=...)."""
    return jax.nn.softplus(beta * x) / beta


def _sd_beta(initial_sd: float, epsilon: float) -> float:
    return math.log(2.0) / (initial_sd - epsilon)


class ConditionalDistribution(nn.Module):
    """ABC: forward returns params; log_prob/sample/rsample/mode are pure."""

    def log_prob(self, y, params, reduce_dim: Optional[int] = None):
        raise NotImplementedError()

    def rsample(self, key, params):
        raise NotImplementedError()

    def sample(self, key, params):
        return jax.lax.stop_gradient(self.rsample(key, params))

    def mode(self, params):
        raise NotImplementedError()


class IsotropicGaussianDense(ConditionalDistribution):
    """Gaussian with a single (scalar per position) learned sd."""

    y_dim: int
    initial_sd: float = 1.0
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        params = Dense(self.y_dim + 1)(x)
        mu, log_sd = params[..., :-1], params[..., -1:]
        sd = softplus_beta(log_sd, _sd_beta(self.initial_sd, self.epsilon))
        if self.epsilon > 0:
            sd = sd + self.epsilon
        return mu, sd

    def log_prob(self, y, params, reduce_dim: Optional[int] = None):
        lp = gaussian_ll(y, params[0], params[1], epsilon=0, reduce_dim=None)
        return lp.sum(reduce_dim) if reduce_dim is not None else lp

    def rsample(self, key, params):
        return rsample_gaussian(key, params[0], params[1])

    def mode(self, params):
        return params[0]


class DiagonalGaussianDense(ConditionalDistribution):
    """Gaussian with diagonal covariance (the standard latent head)."""

    y_dim: int
    initial_sd: float = 1.0
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        params = Dense(2 * self.y_dim)(x)
        mu, log_sd = jnp.split(params, 2, axis=-1)
        sd = softplus_beta(log_sd, _sd_beta(self.initial_sd, self.epsilon))
        if self.epsilon > 0:
            sd = sd + self.epsilon
        return mu, sd

    def log_prob(self, y, params, reduce_dim: Optional[int] = None):
        return gaussian_ll(y, params[0], params[1], epsilon=0, reduce_dim=reduce_dim)

    def rsample(self, key, params):
        return rsample_gaussian(key, params[0], params[1])

    def mode(self, params):
        return params[0]


# Alias fixing the reference's stale test import (`tests/.../test_wavenet.py:11`
# imports GaussianDense which does not exist there).
GaussianDense = DiagonalGaussianDense


class DiagonalGaussianMixtureDense(ConditionalDistribution):
    y_dim: int
    num_mix: int
    initial_sd: float = 1.0
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        """Returns (logit_probs (*, M), mu (*, D, M), sd (*, D, M))."""
        params = Dense(self.num_mix * (2 * self.y_dim + 1))(x)
        logit_probs = params[..., : self.num_mix]
        mu_log_sd = params[..., self.num_mix :].reshape(*params.shape[:-1], self.y_dim, 2 * self.num_mix)
        mu, log_sd = jnp.split(mu_log_sd, 2, axis=-1)
        # reference uses beta = log2/initial_sd in the eps>0 branch here
        # (distributions.py:169) — preserved for parity
        beta = math.log(2.0) / self.initial_sd if self.epsilon > 0 else _sd_beta(self.initial_sd, self.epsilon)
        sd = softplus_beta(log_sd, beta)
        if self.epsilon > 0:
            sd = sd + self.epsilon
        return logit_probs, mu, sd

    def log_prob(self, y, params, reduce_dim: int = -1):
        return gaussian_mixture_ll(y, params[0], params[1], params[2], epsilon=0, reduce_dim=reduce_dim)

    def rsample(self, key, params):
        return rsample_gaussian_mixture(key, params[0], params[1], params[2])

    def mode(self, params):
        """Mean of the most probable component."""
        mode_component = jnp.argmax(params[0], axis=-1, keepdims=True)[..., None, :]
        mode_component = jnp.broadcast_to(mode_component, params[1].shape[:-1] + (1,))
        return jnp.take_along_axis(params[1], mode_component, axis=-1)[..., 0]


class CategoricalDense(ConditionalDistribution):
    y_dim: int

    @nn.compact
    def __call__(self, x):
        return Dense(self.y_dim)(x)

    def log_prob(self, y, logits, reduce_dim: Optional[int] = -1):
        return categorical_ll(y, logits, reduce_dim=reduce_dim)

    def rsample(self, key, logits):
        return jax.random.categorical(key, logits, axis=-1)

    def sample(self, key, logits):
        return jax.random.categorical(key, logits, axis=-1)

    def mode(self, logits, axis: int = -1):
        return jnp.argmax(logits, axis=axis)


class BernoulliDense(ConditionalDistribution):
    y_dim: int

    @nn.compact
    def __call__(self, x):
        return Dense(self.y_dim)(x)

    def log_prob(self, y, logits, reduce_dim: Optional[int] = None):
        lp = bernoulli_ll(y, logits, reduce_dim=None)
        return lp.sum(reduce_dim) if reduce_dim is not None else lp

    def sample(self, key, logits):
        return jax.random.bernoulli(key, jax.nn.sigmoid(logits)).astype(jnp.float32)

    def mode(self, logits):
        # elementwise mode (the reference's argmax over a nonexistent attr is a
        # bug — `distributions.py:258-259`; fixed)
        return (logits > 0).astype(jnp.float32)


class DiscretizedLogisticDense(ConditionalDistribution):
    y_dim: int
    num_bins: int = 256
    log_epsilon: float = -7.0

    @nn.compact
    def __call__(self, x):
        params = Dense(self.y_dim * 2)(x)
        mu, log_scale = jnp.split(params, 2, axis=-1)
        log_scale = jnp.maximum(log_scale, self.log_epsilon)
        return mu, log_scale

    def log_prob(self, y, params, reduce_dim: Optional[int] = None):
        return discretized_logistic_ll(y, params[0], params[1], num_bins=self.num_bins, reduce_dim=reduce_dim)

    def rsample(self, key, params):
        return rsample_discretized_logistic(key, params[0], params[1])

    def mode(self, params):
        return params[0]


class DiscretizedLogisticMixtureDense(ConditionalDistribution):
    """DMoL head: ``out_features = num_mix * (2*y_dim + 1)`` — the default
    likelihood head everywhere (reference ``distributions.py:310-387``)."""

    y_dim: int
    num_mix: int = 10
    num_bins: int = 256
    log_epsilon: float = -7.0

    @nn.compact
    def __call__(self, x):
        """Returns (logit_probs (*, M), locs (*, D, M), log_scales (*, D, M))."""
        params = Dense(self.num_mix * (2 * self.y_dim + 1))(x)
        logit_probs = params[..., : self.num_mix]
        locs_log_scales = params[..., self.num_mix :].reshape(*params.shape[:-1], self.y_dim, 2 * self.num_mix)
        locs, log_scales = jnp.split(locs_log_scales, 2, axis=-1)
        log_scales = jnp.maximum(log_scales, self.log_epsilon)
        return logit_probs, locs, log_scales

    def log_prob(self, y, params, reduce_dim: int = -1):
        return discretized_logistic_mixture_ll(
            y, params[0], params[1], params[2], num_bins=self.num_bins, reduce_dim=reduce_dim
        )

    def rsample(self, key, params):
        return rsample_discretized_logistic_mixture(key, params[0], params[1], params[2])

    def mode(self, params):
        """Mean (≈ mode) of the most probable component."""
        mode_component = jnp.argmax(params[0], axis=-1, keepdims=True)[..., None, :]
        mode_component = jnp.broadcast_to(mode_component, params[1].shape[:-1] + (1,))
        return jnp.take_along_axis(params[1], mode_component, axis=-1)[..., 0]


def get_likelihood_head(name: str, y_dim: int, num_mix: int = 10, num_bins: int = 256, **kwargs) -> ConditionalDistribution:
    """Build a likelihood head from its string name ("DMoL"/"GMM"/"Gaussian"...),
    mirroring the reference's string-dispatch in the audio model configs
    (``vrnn.py:466-486``)."""
    name_l = name.lower()
    if name_l in ("dmol", "discretized_logistic_mixture"):
        return DiscretizedLogisticMixtureDense(y_dim=y_dim, num_mix=num_mix, num_bins=num_bins, **kwargs)
    if name_l in ("dl", "discretized_logistic"):
        return DiscretizedLogisticDense(y_dim=y_dim, num_bins=num_bins, **kwargs)
    if name_l in ("gmm", "gaussian_mixture"):
        return DiagonalGaussianMixtureDense(y_dim=y_dim, num_mix=num_mix, **kwargs)
    if name_l == "gaussian":
        return DiagonalGaussianDense(y_dim=y_dim, **kwargs)
    if name_l == "categorical":
        return CategoricalDense(y_dim=num_bins, **kwargs)
    if name_l == "bernoulli":
        return BernoulliDense(y_dim=y_dim, **kwargs)
    raise ValueError(f"Unknown likelihood {name!r}")
