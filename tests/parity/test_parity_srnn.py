"""End-to-end numerical parity: reference torch SRNNAudio vs blvm_tpu SRNNAudio.

Same approach as the VRNN test: patch the reparameterized sampler to return
the posterior mean on both sides, transplant weights, and assert forward
equality — covering the stacked encoder, forward GRU (d), smoothing reverse
GRU (a) with ragged-length reversal, prior/posterior transition, decoder, and
ELBO (reference blvm/models/srnn.py:137-302).
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

INPUT_SIZE, HIDDEN, LATENT = 8, 16, 4


def transplant(sd, smoothing=True):
    """torch SRNNAudio state_dict -> flax params (reused by train-step parity)."""
    srnn = {
        "encoder": {"MLP_0": ref.mlp_params(sd, "srnn.encoder", (2, 4, 6))},
        "decoder": {"MLP_0": ref.mlp_params(sd, "srnn.decoder", (0, 2, 4))},
        "likelihood": {"Dense_0": ref.linear_params(sd, "srnn.likelihood.params")},
        "d_forward_recurrent": ref.gru_params(sd, "srnn.d_forward_recurrent"),
        "step": {
            "prior_net": {
                "layers_0": ref.mlp_params(sd, "srnn.prior", (0, 2, 4)),
                "layers_1": {"Dense_0": ref.linear_params(sd, "srnn.prior.6.params")},
            },
            "posterior_net": {
                "layers_0": ref.mlp_params(sd, "srnn.posterior", (0, 2, 4)),
                "layers_1": {"Dense_0": ref.linear_params(sd, "srnn.posterior.6.params")},
            },
        },
    }
    if smoothing:
        srnn["a_backward_recurrent"] = ref.gru_params(sd, "srnn.a_backward_recurrent")
    else:
        srnn["a_mlp"] = {
            "Dense_0": ref.linear_params(sd, "srnn.a_mlp.0"),
            "Dense_1": ref.linear_params(sd, "srnn.a_mlp.2"),
        }
    return {"srnn": srnn}


def build_pair(monkeypatch, likelihood, smoothing):
    import torch

    import blvm.models.srnn as ref_srnn_mod

    import blvm_tpu.models.srnn as my_srnn_mod
    from blvm_tpu.models import SRNNAudio

    def _mean_rsample_torch(mu: torch.Tensor, sd: torch.Tensor) -> torch.Tensor:
        return mu

    monkeypatch.setattr(ref_srnn_mod, "rsample_gaussian", _mean_rsample_torch)
    monkeypatch.setattr(my_srnn_mod, "rsample_gaussian", lambda key, mu, sd: mu)

    torch.manual_seed(0)
    ref_model = ref_srnn_mod.SRNNAudio(
        likelihood=likelihood,
        input_size=INPUT_SIZE,
        hidden_size=HIDDEN,
        latent_size=LATENT,
        smoothing=smoothing,
    ).eval()

    params = transplant(ref_model.state_dict(), smoothing)
    model = SRNNAudio(
        likelihood=likelihood,
        input_size=INPUT_SIZE,
        hidden_size=HIDDEN,
        latent_size=LATENT,
        smoothing=smoothing,
    )
    return ref_model, model, params


@pytest.mark.parametrize("smoothing", [True, False])
@pytest.mark.parametrize("likelihood", ["GMM", "DMoL"])
def test_srnn_audio_forward_parity(monkeypatch, likelihood, smoothing):
    import torch

    ref_model, model, params = build_pair(monkeypatch, likelihood, smoothing)

    lengths = (64, 43)
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(23)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0
    beta, free_nats = 0.8, 1.0

    with torch.no_grad():
        ref_loss, _, ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(np.asarray(lengths)), beta=beta, free_nats=free_nats
        )

    loss, mets, _ = jax.jit(
        lambda p, x, x_sl: model.apply(
            {"params": p}, x, x_sl, beta=beta, free_nats=free_nats, rngs={"sample": jax.random.PRNGKey(0)}
        )
    )(params, jnp.asarray(x), jnp.asarray(np.asarray(lengths, np.int32)))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mets["elbo"]), ref_out.elbo.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mets["log_prob"]), ref_out.log_prob.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mets["kl"]), ref_out.kl.numpy(), rtol=1e-4, atol=1e-4)
