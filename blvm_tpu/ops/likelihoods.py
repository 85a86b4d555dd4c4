"""Elementwise log-likelihoods (JAX).

TPU-native rebuild of the likelihood math defined by the reference
(``blvm/utils/log_likelihoods.py:17-231``): same distributions, same edge-case
handling and the same reduction convention, re-derived for JAX. All math is done
in float32 regardless of input dtype — likelihoods are the bits/frame
parity-critical surface, so they must not silently run in bf16.

Conventions:
  * ``reduce_dim`` sums over one dimension; if that dimension has size 1 it is
    squeezed instead (matching reference ``reduce``, ``log_likelihoods.py:10``).
  * All functions are pure and jit/vmap/grad-safe; no data-dependent control flow.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def reduce(x: jnp.ndarray, dim: int, operation=jnp.sum) -> jnp.ndarray:
    """Reduce along ``dim``; squeeze instead when that axis has size 1."""
    if x.shape[dim] == 1:
        return jnp.squeeze(x, axis=dim)
    return operation(x, axis=dim)


def at_least_f32(x):
    """Promote to at least float32 (bf16 → f32; f32 → f32; f64 stays f64).

    The likelihood surface must never run below f32 (bits/frame parity), but
    pinning exactly f32 would silently truncate f64 runs (e.g. the x64
    train-step parity suite) — promote, don't pin.
    """
    x = jnp.asarray(x)
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def _f32(*xs):
    return tuple(at_least_f32(x) for x in xs)


def gaussian_ll(y, mu, sd, epsilon: float = 1e-6, reduce_dim: Optional[int] = -1):
    """Elementwise Gaussian log-likelihood.

    The standard deviation is clamped at ``epsilon`` with a straight-through
    gradient (the clamp does not affect gradients), matching the reference's
    ``no_grad`` clamp (``log_likelihoods.py:34-36``).
    """
    y, mu, sd = _f32(y, mu, sd)
    if epsilon:
        sd = sd + jax.lax.stop_gradient(jnp.maximum(sd, epsilon) - sd)
    log_scale = jnp.log(sd)
    log_prob = -((y - mu) ** 2) / (2.0 * sd**2) - log_scale - 0.5 * math.log(2.0 * math.pi)
    return reduce(log_prob, reduce_dim) if reduce_dim else log_prob


def gaussian_mixture_ll(y, logits, mu, sd, epsilon: float = 1e-6, reduce_dim: int = -1):
    """Gaussian mixture log-likelihood.

    Args:
        y: targets ``(*, D)``.
        logits: unnormalized mixture log-weights ``(*, num_mix)``.
        mu, sd: component parameters ``(*, D, num_mix)``.

    Returns ``(*,)`` after reducing D inside each component then logsumexp over
    components (reference ``log_likelihoods.py:42-60``).
    """
    y, logits, mu, sd = _f32(y, logits, mu, sd)
    log_prob_y = gaussian_ll(y[..., None], mu, sd, epsilon=epsilon, reduce_dim=reduce_dim - 1)
    log_prob_mix = jax.nn.log_softmax(logits, axis=-1)
    return jax.nn.logsumexp(log_prob_y + log_prob_mix, axis=-1)


def categorical_ll(y, logits, reduce_dim: Optional[int] = -1):
    """Categorical log-likelihood via gather on normalized logits.

    Args:
        y: integer targets of any shape ``(*,)``.
        logits: unnormalized log-probabilities ``(*, C)``.
    """
    logits = at_least_f32(logits)
    logits = jax.nn.log_softmax(logits, axis=-1)
    y = jnp.asarray(y, jnp.int32)
    log_prob = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    return reduce(log_prob, reduce_dim) if reduce_dim else log_prob


def bernoulli_ll(y, logits, reduce_dim: Optional[int] = -1):
    """Bernoulli log-likelihood from logits (stable: -softplus formulation)."""
    y, logits = _f32(y, logits)
    # log p = y*log(sigmoid(l)) + (1-y)*log(1-sigmoid(l)) = l*y - softplus(l)  ... stable split by sign
    log_prob = -(jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return reduce(log_prob, reduce_dim) if reduce_dim else log_prob


def _dmol_elementwise(y, loc, log_scale, num_bins: int):
    """Shared per-element discretized-logistic log-mass with the PixelCNN++ edge cases.

    Data is assumed quantized to ``num_bins`` equal bins on [-1, 1]; the CDF of
    the logistic is the sigmoid, so the mass of a bin is the sigmoid difference
    across half a bin width ``1/(num_bins-1)`` on each side (reference
    ``log_likelihoods.py:136-166``). Three cases:
      * lowest bin  (y < 2/num_bins − 1):  log CDF(y + half-bin)
      * highest bin (y > 1 − 2/num_bins):  log(1 − CDF(y − half-bin))
      * tiny mass   (cdf_delta ≤ 1e-5):    midpoint PDF approximation
    """
    centered_y = y - loc
    inv_stdv = jnp.exp(-log_scale)

    half_bin = 1.0 / (num_bins - 1)
    plus_in = inv_stdv * (centered_y + half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    minus_in = inv_stdv * (centered_y - half_bin)
    cdf_minus = jax.nn.sigmoid(minus_in)
    cdf_delta = cdf_plus - cdf_minus

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_minus = -jax.nn.softplus(minus_in)

    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scale - 2.0 * jax.nn.softplus(mid_in)
    log_prob_mid_safe = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, min=1e-10)),
        log_pdf_mid - math.log(num_bins / 2.0),
    )

    log_prob = jnp.where(y < 2.0 / num_bins - 1.0, log_cdf_plus, log_prob_mid_safe)
    log_prob = jnp.where(y > 1.0 - 2.0 / num_bins, log_one_minus_cdf_minus, log_prob)
    return log_prob


def discretized_logistic_ll(y, loc, log_scale, num_bins: int = 256, reduce_dim: Optional[int] = -1):
    """Discretized logistic log-mass of targets in [-1, 1] (single component)."""
    y, loc, log_scale = _f32(y, loc, log_scale)
    log_prob = _dmol_elementwise(y, loc, log_scale, num_bins)
    return reduce(log_prob, reduce_dim) if reduce_dim else log_prob


def discretized_logistic_mixture_ll(
    y, logit_probs, locs, log_scales, num_bins: int = 256, reduce_dim: int = -1
):
    """Discretized mixture-of-logistics (DMoL) log-mass.

    All data dimensions are independent (no RGB channel conditioning). The data
    dimension is reduced per component, then the mixture is normalized in
    log-space (reference ``log_likelihoods.py:170-231``).

    Args:
        y: targets ``(*, D)`` in [-1, 1].
        logit_probs: mixture logits ``(*, num_mix)``.
        locs, log_scales: component parameters ``(*, D, num_mix)``.
    """
    y, logit_probs, locs, log_scales = _f32(y, logit_probs, locs, log_scales)
    y = jnp.broadcast_to(y[..., None], y.shape + (logit_probs.shape[-1],))
    log_prob = _dmol_elementwise(y, locs, log_scales, num_bins)
    log_prob = reduce(log_prob, reduce_dim - 1)  # reduce data dim per component
    log_prob = log_prob + jax.nn.log_softmax(logit_probs, axis=-1)
    return jax.nn.logsumexp(log_prob, axis=-1)
