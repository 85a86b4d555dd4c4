"""Shared sequence-ELBO computation for the recurrent LVMs.

The identical loss shape used by VRNN and SRNN (reference ``vrnn.py:255-279``,
``srnn.py:137-160``): masked log-likelihood summed over time, KL masked at the
encoder stride, free-nats floor shared across the latent dim, loss
``-(log p − β·KL_fn) / Σ x_sl``.
"""

import jax.numpy as jnp

from blvm_tpu.ops.sequence import sequence_mask
from blvm_tpu.ops.variational import discount_free_nats


def compute_sequence_elbo(likelihood, y, parameters, kld_twise, x_sl, stride: int, beta=1.0, free_nats=0.0):
    """Returns ``(loss, elbo, log_prob, kld, kld_fn, seq_mask)`` with per-example
    arrays; ``kld`` is the true KL, ``kld_fn`` the free-nats-discounted KL used
    in the loss. The reference is inconsistent about which one its models report
    as "kl": VRNN rebinds and returns the discounted value (vrnn.py:272-278),
    SRNN returns the true one (srnn.py:153-160) — callers pick theirs."""
    T = y.shape[1]
    seq_mask = sequence_mask(x_sl, max_len=T, dtype=jnp.float32)

    log_prob_twise = likelihood.log_prob(y, parameters, reduce_dim=-1) * seq_mask  # (B, T)
    log_prob = log_prob_twise.reshape(y.shape[0], -1).sum(axis=1)  # (B,)

    seq_mask_kl = seq_mask[:, ::stride, None][:, : kld_twise.shape[1]]  # (B, T', 1)
    kld = (kld_twise * seq_mask_kl).sum(axis=(1, 2))  # (B,)
    elbo = log_prob - kld

    kld_twise_fn = discount_free_nats(kld_twise, free_nats, shared_dims=-1)
    kld_fn = (kld_twise_fn * seq_mask_kl).sum(axis=(1, 2))
    loss = -(log_prob - beta * kld_fn).sum() / x_sl.sum()

    return loss, elbo, log_prob, kld, kld_fn, seq_mask


def masked_strided_sum(kld_twise, x_sl, max_len: int, stride: int):
    """Sum an elementwise latent quantity over time (at encoder stride) and
    latent dims with the same mask the ELBO's KL term uses. Returns (B,)."""
    seq_mask = sequence_mask(x_sl, max_len=max_len, dtype=jnp.float32)
    seq_mask_kl = seq_mask[:, ::stride, None][:, : kld_twise.shape[1]]
    return (kld_twise * seq_mask_kl).sum(axis=(1, 2))
