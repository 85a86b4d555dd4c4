"""Importance-weighted bound estimation (IWAE, Burda et al. 2015).

Not present in the reference; added per the rebuild north star (BASELINE.json):
tighter-than-ELBO likelihood bounds for the latent-variable models,

    log p(x) >= E[ log (1/K) Σ_k w_k ],   w_k = p(x, z_k) / q(z_k | x)

with ``log w_k = log p(x|z_k) − (log q(z_k|x) − log p(z_k))`` — the MC form of
the KL, which every LVM here exposes as ``mets["mc_kl"]`` (models with exact
likelihoods have no latents: the bound equals the log-likelihood).

The K forward passes run under ``lax.map`` (sequential, memory-bounded) inside
one jit — no per-sample dispatch.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def importance_weighted_bound(
    log_weight_fn: Callable,
    key,
    num_samples: int,
    batch_size: Optional[int] = None,
):
    """Estimate the IW bound from ``log_weight_fn(key) -> (B,) log weights``.

    Returns per-example bounds ``(B,)``: ``logsumexp_k(log w_k) − log K``.
    """
    keys = jax.random.split(key, num_samples)
    logws = jax.lax.map(log_weight_fn, keys)  # (K, B)
    return jax.nn.logsumexp(logws, axis=0) - jnp.log(num_samples)


def model_iw_bound(model, params, x, x_sl, key, num_samples: int, **model_kwargs):
    """IW bound for any blvm_tpu LVM following the forward contract.

    Uses ``mets["log_prob"] − mets["mc_kl"]`` as the per-sample log weight;
    models without latents (mc_kl absent) reduce to their exact log-likelihood.
    """

    def log_weight(k):
        _, mets, _ = model.apply({"params": params}, x, x_sl, rngs={"sample": k}, **model_kwargs)
        logw = mets["log_prob"]
        if "mc_kl" in mets:
            logw = logw - mets["mc_kl"]
        return logw

    return importance_weighted_bound(log_weight, key, num_samples)
