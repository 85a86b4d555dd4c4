"""Variational math: KL divergences, free nats, reparameterized samplers (JAX).

Rebuild of the reference variational toolkit (``blvm/utils/variational.py``)
with explicit PRNG key threading — every sampler takes a ``jax.random`` key as
its first argument instead of mutating global RNG state. This is both the JAX
requirement and a reproducibility upgrade over the reference.

All samplers are reparameterized (pathwise gradients flow through ``mu``/``sd``).
"""

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from blvm_tpu.ops.likelihoods import gaussian_ll


def kl_divergence_gaussian(mu_q, sd_q, mu_p, sd_p):
    """Elementwise analytic KL(q||p) between diagonal Gaussians (no reduction).

    Matches reference ``variational.py:67-70``.
    """
    return (
        jnp.log(sd_p)
        - jnp.log(sd_q)
        + (sd_q**2 + (mu_q - mu_p) ** 2) / (2.0 * sd_p**2)
        - 0.5
    )


def kl_divergence_gaussian_mc(mu_q, sd_q, mu_p, sd_p, z, epsilon: float = 0.0, reduce_dim: Optional[int] = None):
    """Elementwise single-sample MC estimate of KL(q||p) between Gaussians."""
    return gaussian_ll(z, mu_q, sd_q, epsilon, reduce_dim) - gaussian_ll(z, mu_p, sd_p, epsilon, reduce_dim)


def discount_free_nats(
    kld: jnp.ndarray,
    free_nats: Optional[float] = None,
    shared_dims: Union[Sequence[int], int, None] = None,
) -> jnp.ndarray:
    """Free-bits (free nats): elementwise ``max(kld, budget_per_element)``.

    If ``shared_dims`` is given, the ``free_nats`` budget is split equally over
    the product of those dimensions' sizes (reference ``variational.py:86-122``).
    """
    # short-circuit only for concrete zeros — free_nats may be a traced scalar
    # (annealed per step inside jit)
    if free_nats is None or (isinstance(free_nats, (int, float)) and free_nats == 0):
        return kld

    if isinstance(shared_dims, int):
        shared_dims = (shared_dims,)

    if shared_dims is not None:
        n_elements = math.prod(kld.shape[d] for d in shared_dims)
        min_kl_per_dim = free_nats / n_elements
    else:
        min_kl_per_dim = free_nats

    return jnp.maximum(kld, jnp.asarray(min_kl_per_dim, dtype=kld.dtype))


def precision_weighted_gaussian(mu_1, sd_1, mu_2, sd_2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse two Gaussians by precision weighting (Bayesian posterior update)."""
    pr_1 = sd_1**-2
    pr_2 = sd_2**-2
    va_w = 1.0 / (pr_1 + pr_2)
    mu_w = va_w * (mu_1 * pr_1 + mu_2 * pr_2)
    sd_w = jnp.sqrt(va_w)
    return mu_w, sd_w


def rsample_gaussian(key, mu, sd):
    """Reparameterized Gaussian sample: ``mu + sd * eps``, ``eps ~ N(0, I)``."""
    return mu + sd * jax.random.normal(key, jnp.shape(mu), dtype=jnp.result_type(mu))


def _gumbel_argmax(key, logits, eps: float):
    """Gumbel-max categorical pick: argmax(logits + G), with the same
    bounded-uniform Gumbel construction the reference uses."""
    u = jax.random.uniform(key, jnp.shape(logits), minval=eps, maxval=1.0 - eps)
    gumbel = -jnp.log(-jnp.log(u))
    return jnp.argmax(logits + gumbel, axis=-1, keepdims=True)


def rsample_gaussian_mixture(key, logits, mu, sd, eps: float = 1e-6, rsample_categorical: bool = False, tau: float = 1.0):
    """Sample a GMM: Gumbel-max component pick, then Gaussian rsample.

    Args:
        logits: ``(*, num_mix)``; mu/sd: ``(*, D, num_mix)``. Returns ``(*, D)``.
    """
    key_cat, key_normal = jax.random.split(key)
    if rsample_categorical:
        argmax = rsample_gumbel_softmax(key_cat, logits, hard=True, tau=tau, return_argmax=True)
    else:
        argmax = _gumbel_argmax(key_cat, logits, eps)

    argmax = jnp.broadcast_to(argmax, argmax.shape[:-1] + (mu.shape[-2],))[..., None]  # (*, D, 1)
    mu = jnp.take_along_axis(mu, argmax, axis=-1)[..., 0]
    sd = jnp.take_along_axis(sd, argmax, axis=-1)[..., 0]
    return rsample_gaussian(key_normal, mu, sd)


def rsample_gumbel(key, mean, scale, eps: float = 1e-10):
    """Reparameterized Gumbel(mean, scale) via inverse CDF of bounded uniform."""
    u = jax.random.uniform(key, jnp.shape(mean), minval=eps, maxval=1.0 - eps)
    return mean + scale * -jnp.log(-jnp.log(u))


def rsample_gumbel_softmax(
    key,
    logits,
    tau: float = 1.0,
    hard: bool = False,
    return_argmax: bool = False,
    eps: float = 1e-10,
    axis: int = -1,
):
    """Gumbel-softmax sample; with ``hard=True`` uses the straight-through trick
    ``y_hard + (y_soft - stop_grad(y_soft))`` (reference ``variational.py:220-279``)."""
    u = jax.random.uniform(key, jnp.shape(logits), minval=eps, maxval=1.0 - eps)
    gumbels = -jnp.log(-jnp.log(u))
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)

    if not hard:
        return y_soft

    index = jnp.argmax(y_soft, axis=axis, keepdims=True)
    if return_argmax:
        return index

    y_hard = jax.nn.one_hot(index[..., 0], logits.shape[axis], dtype=y_soft.dtype)
    return y_hard + (y_soft - jax.lax.stop_gradient(y_soft))


def rsample_logistic(key, mu, log_scale, eps: float = 1e-8):
    """Reparameterized logistic sample: ``mu + s * (log u - log(1-u))``."""
    u = jax.random.uniform(key, jnp.shape(mu), minval=eps, maxval=1.0 - eps)
    return mu + jnp.exp(log_scale) * (jnp.log(u) - jnp.log(1.0 - u))


def rsample_discretized_logistic(key, mu, log_scale, eps: float = 1e-8):
    """Continuous logistic sample clamped to [-1, 1] (no further quantization)."""
    return jnp.clip(rsample_logistic(key, mu, log_scale, eps), -1.0, 1.0)


def rsample_discretized_logistic_mixture(
    key, logit_probs, locs, log_scales, eps: float = 1e-5, rsample_categorical: bool = False, tau: float = 1.0
):
    """Sample a DMoL: Gumbel-max component pick, then clamped logistic sample.

    Args:
        logit_probs: ``(*, num_mix)``; locs/log_scales: ``(*, D, num_mix)``.
    Returns ``(*, D)``.
    """
    key_cat, key_logistic = jax.random.split(key)
    if rsample_categorical:
        argmax = rsample_gumbel_softmax(key_cat, logit_probs, hard=True, tau=tau, return_argmax=True)
    else:
        argmax = _gumbel_argmax(key_cat, logit_probs, eps)

    argmax = jnp.broadcast_to(argmax, argmax.shape[:-1] + (locs.shape[-2],))[..., None]
    locs = jnp.take_along_axis(locs, argmax, axis=-1)[..., 0]
    log_scales = jnp.take_along_axis(log_scales, argmax, axis=-1)[..., 0]
    return rsample_discretized_logistic(key_logistic, locs, log_scales)
