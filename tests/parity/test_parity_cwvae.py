"""End-to-end numerical parity: reference torch CWVAEAudio vs blvm_tpu CWVAEAudio.

Stochasticity is removed identically on both sides by patching the Gaussian
rsampler to return the posterior mean (the sampler itself is unit-tested in
tests/ops/test_variational.py). The remaining forward pass — multi-level
strided separable-conv encoder, top-down per-level RSSM recurrence with
decoder-upsampled context, DMoL likelihood, level-masked ELBO with per-level
free-nats scaling — is then deterministic and must match the reference
(blvm/models/clockwork_vae/clockwork_vae.py:200-338) after weight transplant.

The reference scripts its RSSM cells with torch.jit.script at construction
(CWVAE jit_compile=True default), so the sampler patch must be installed on
blvm.modules.distributions BEFORE the model is built (TorchScript binds the
module global at scripting time).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.parity import reference_loader as ref  # noqa: E402

try:
    ref.load_reference()
    HAVE_REFERENCE = True
except ImportError:
    HAVE_REFERENCE = False

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout unavailable")

# stride 4 = 2 blocks of stride 2; stride 2 = strides (2, 1); kernel 5 fixed by
# the reference CWVAEAudio. overall stride 8, overall receptive field 61.
# likelihood must be spelled "DMoL": the reference's own default "dmol" raises
# in its constructor (clockwork_vae.py:408,436-458).
KW = dict(z_size=4, h_size=8, strides=[4, 2], num_level_layers=2, stride_per_layer=2, num_mix=2, likelihood="DMoL")


def block_params(sd, prefix):
    """Reference BlockSeparable -> our BlockSeparable params.

    Reference layout (convolutional_coders.py:48-61): Sequential(Conv1d 1x1,
    ReLU, GroupNorm, ConvDepthwiseSeparable1d) inside a TemporalResidual.
    """
    return {
        "Conv1d_0": ref.conv1d_params(sd, f"{prefix}.block.module.0"),
        "GroupNorm_0": {
            "scale": ref.t2n(sd[f"{prefix}.block.module.2.weight"]),
            "bias": ref.t2n(sd[f"{prefix}.block.module.2.bias"]),
        },
        "_DepthwiseSeparable_0": {
            "depthwise_kernel": ref.t2n(sd[f"{prefix}.block.module.3.depthwise_conv.weight"]).transpose(2, 1, 0),
            "depthwise_bias": ref.t2n(sd[f"{prefix}.block.module.3.depthwise_conv.bias"]),
            "GroupNorm_0": {
                "scale": ref.t2n(sd[f"{prefix}.block.module.3.norm.weight"]),
                "bias": ref.t2n(sd[f"{prefix}.block.module.3.norm.bias"]),
            },
            "Conv1d_0": {
                "kernel": ref.t2n(sd[f"{prefix}.block.module.3.pointwise_conv.weight"]).transpose(2, 1, 0)
            },
        },
    }


def coder_params(sd, prefix, num_levels, num_blocks):
    """Reference ConvCoder1d -> our ConvCoder1d params (block order already
    mirrored identically on both sides for transposed coders)."""
    params = {}
    for l in range(num_levels):
        for b in range(num_blocks):
            params[f"levels_{l}_{b}"] = block_params(sd, f"{prefix}.levels.{l}.{b}")
        if f"{prefix}.in_projs.{l}.0.weight" in sd:
            params[f"in_proj_{l}"] = ref.conv1d_params(sd, f"{prefix}.in_projs.{l}.0")
        if f"{prefix}.out_projs.{l}.0.weight" in sd:
            params[f"out_proj_{l}"] = ref.conv1d_params(sd, f"{prefix}.out_projs.{l}.0")
    return params


def cell_params(sd, prefix):
    """Reference RSSMCell (rssm.py:18-104) -> our RSSMCell."""
    return {
        "gru_in": ref.linear_params(sd, f"{prefix}.gru_in.0"),
        "gru_cell": ref.gru_cell_params(sd, f"{prefix}.gru_cell"),
        "prior_mlp": ref.mlp_params(sd, f"{prefix}.prior", (0, 2, 4)),
        "prior_head": {"Dense_0": ref.linear_params(sd, f"{prefix}.prior.6.params")},
        "posterior_mlp": ref.mlp_params(sd, f"{prefix}.posterior", (0, 2, 4)),
        "posterior_head": {"Dense_0": ref.linear_params(sd, f"{prefix}.posterior.6.params")},
    }


def transplant(sd, num_levels=2, num_blocks=2):
    """torch CWVAEAudio state_dict -> flax params (reused by train-step parity)."""
    return {
        "cwvae": {
            "encoder": coder_params(sd, "cwvae.encoder", num_levels, num_blocks),
            "decoder": coder_params(sd, "cwvae.decoder", num_levels, num_blocks),
            "likelihood": {"Dense_0": ref.linear_params(sd, "cwvae.likelihood.params")},
            **{f"cell_{l}": cell_params(sd, f"cwvae.cells.{l}") for l in range(num_levels)},
        }
    }


def build_pair(monkeypatch, **overrides):
    import torch

    import blvm.modules.distributions as ref_dists
    import blvm.models.clockwork_vae.clockwork_vae as ref_cwvae_mod

    import blvm_tpu.modules.rssm as my_rssm_mod
    from blvm_tpu.models import CWVAEAudio

    def _mean_rsample_torch(mu: torch.Tensor, sd: torch.Tensor) -> torch.Tensor:
        return mu

    monkeypatch.setattr(ref_dists, "rsample_gaussian", _mean_rsample_torch)
    monkeypatch.setattr(my_rssm_mod, "rsample_gaussian", lambda key, mu, sd: mu)

    kw = {**KW, **overrides}
    torch.manual_seed(0)
    ref_model = ref_cwvae_mod.CWVAEAudio(**kw).eval()

    params = transplant(ref_model.state_dict(), num_levels=len(kw["strides"]), num_blocks=kw["num_level_layers"])
    model = CWVAEAudio(**{**kw, "strides": tuple(kw["strides"])})
    return ref_model, model, params


VARIANTS = [
    dict(),
    dict(residual_posterior=True),
    dict(precision_posterior=True),
]


@pytest.mark.parametrize("overrides", VARIANTS, ids=["plain", "residual", "precision"])
@pytest.mark.parametrize("beta,free_nats", [(1.0, 0.0), (0.7, 2.0)])
def test_cwvae_audio_forward_parity(monkeypatch, overrides, beta, free_nats):
    import torch

    ref_model, model, params = build_pair(monkeypatch, **overrides)

    lengths = (64, 41)
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0

    with torch.no_grad():
        ref_loss, _, ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(np.asarray(lengths)), beta=beta, free_nats=free_nats
        )

    loss, mets, out = jax.jit(
        lambda p, x, x_sl: model.apply(
            {"params": p}, x, x_sl, beta=beta, free_nats=free_nats, rngs={"sample": jax.random.PRNGKey(0)}
        ),
        static_argnums=(),
    )(params, jnp.asarray(x), jnp.asarray(np.asarray(lengths, np.int32)))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mets["elbo"]), ref_out.elbo.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mets["log_prob"]), ref_out.log_prob.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mets["kld"]), ref_out.kld.numpy(), rtol=1e-4, atol=1e-4)

    # chunk-carry states extracted at each example's true stop index per level
    for l, (ref_z, ref_h) in enumerate(ref_out.state_n):
        my_z, my_h = out.state_n[l]
        # f32 recurrence accumulates ~1e-5-scale fusion-order noise over T steps
        np.testing.assert_allclose(np.asarray(my_z), ref_z.numpy(), rtol=1e-4, atol=1e-4, err_msg=f"z level {l}")
        np.testing.assert_allclose(np.asarray(my_h), ref_h.numpy(), rtol=1e-4, atol=1e-4, err_msg=f"h level {l}")
