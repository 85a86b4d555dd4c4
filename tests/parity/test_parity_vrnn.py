"""End-to-end numerical parity: reference torch VRNNAudio vs blvm_tpu VRNNAudio.

Stochasticity is removed identically on both sides by patching the
reparameterized sampler to return the posterior mean (the sampler itself is
unit-tested in tests/ops/test_variational.py) — the remaining forward pass
(stacked encoder, prior/posterior heads, GRU recurrence, decoder, likelihood,
ELBO with beta/free-nats) is then deterministic and must match the reference
(blvm/models/vrnn.py:255-369) after weight transplant.

The reference scripts its cell with torch.jit.script at construction time, so
the sampler patch must be installed BEFORE the model is built (TorchScript
binds the module global at scripting time).
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


def transplant(sd):
    """torch VRNNAudio state_dict -> flax params (reused by train-step parity)."""
    cell = {
        "prior_mlp": ref.mlp_params(sd, "vrnn.vrnn_cell.prior", (0, 2, 4)),
        "prior_head": {"Dense_0": ref.linear_params(sd, "vrnn.vrnn_cell.prior.6.params")},
        "posterior_mlp": ref.mlp_params(sd, "vrnn.vrnn_cell.posterior", (0, 2, 4)),
        "posterior_head": {"Dense_0": ref.linear_params(sd, "vrnn.vrnn_cell.posterior.6.params")},
        "phi_z_net": ref.mlp_params(sd, "vrnn.vrnn_cell.phi_z", (0, 2, 4, 6)),
        "gru": ref.gru_cell_params(sd, "vrnn.vrnn_cell.gru_cell"),
    }
    return {
        "vrnn": {
            "cell": cell,
            "encoder": {"MLP_0": ref.mlp_params(sd, "vrnn.encoder", (2, 4, 6))},
            "decoder": {"MLP_0": ref.mlp_params(sd, "vrnn.decoder", (0, 2, 4))},
            "likelihood": {"Dense_0": ref.linear_params(sd, "vrnn.likelihood.params")},
        }
    }


def build_pair(monkeypatch, likelihood):
    import torch

    import blvm.models.vrnn as ref_vrnn_mod

    import blvm_tpu.models.vrnn as my_vrnn_mod
    from blvm_tpu.models import VRNNAudio

    def _mean_rsample_torch(mu: torch.Tensor, sd: torch.Tensor) -> torch.Tensor:
        return mu

    monkeypatch.setattr(ref_vrnn_mod, "rsample_gaussian", _mean_rsample_torch)
    monkeypatch.setattr(my_vrnn_mod, "rsample_gaussian", lambda key, mu, sd: mu)

    torch.manual_seed(0)
    ref_model = ref_vrnn_mod.VRNNAudio(
        likelihood=likelihood, input_size=INPUT_SIZE, hidden_size=HIDDEN, latent_size=LATENT
    ).eval()

    params = transplant(ref_model.state_dict())
    model = VRNNAudio(likelihood=likelihood, input_size=INPUT_SIZE, hidden_size=HIDDEN, latent_size=LATENT)
    return ref_model, model, params


# "Gaussian" is omitted: the reference's own Gaussian path crashes in
# compute_elbo (log_prob keeps the y_dim channel, mask is (B, T) —
# blvm/models/vrnn.py:268), so there is no behavior to be parity with.
@pytest.mark.parametrize("likelihood", ["GMM", "DMoL"])
@pytest.mark.parametrize("beta,free_nats", [(1.0, 0.0), (0.7, 2.0)])
def test_vrnn_audio_forward_parity(monkeypatch, likelihood, beta, free_nats):
    import torch

    ref_model, model, params = build_pair(monkeypatch, likelihood)

    lengths = (64, 43)
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0

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
