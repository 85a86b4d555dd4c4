"""End-to-end numerical parity: reference torch STCN vs blvm_tpu STCN.

Covers the time-shifted prior/posterior inference off the dilated skip stack,
precision-weighted posterior, top-down (analytic KL) and bottom-up (MC KL)
orders, the dilation-1 output stack, and the per-layer KL decomposition
(reference blvm/models/stcn/stcn.py:256-434). Samplers patched to the
posterior mean on both sides.
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

N_LAYERS, LATENTS, RES = 2, (8, 4), 16


def glu_stack_params(sd, prefix, n_blocks):
    params = {"Conv1d_0": ref.conv1d_params(sd, f"{prefix}.in_transform")}
    for i in range(n_blocks):
        params[f"Conv1dResidualGLU_{i}"] = ref.residual_glu_params(sd, f"{prefix}.res_blocks.{i}")
    return params


def transplant(sd, n_layers=N_LAYERS, latents=LATENTS, n_stacks=None):
    """torch STCN state_dict -> flax params (reused by train-step parity and
    the convergence harness, which passes its own architecture)."""
    n_latents = len(latents)
    params = {
        "causal": {"Conv1d_0": ref.conv1d_params(sd, "causal.conv")},
        "res_stack": glu_stack_params(sd, "res_stack", n_layers * (n_stacks or n_latents)),
        "out_transform": glu_stack_params(sd, "out_transform", n_layers),
        "out_upsample": {"Dense_0": ref.linear_params(sd, "out_upsample.0")},
        "likelihood_module": {"Dense_0": ref.linear_params(sd, "likelihood_module.params")},
    }
    for l in range(n_latents):
        for name in ("prior", "posterior"):
            params[f"{name}_{l}"] = {
                "MLP_0": ref.mlp_params(sd, f"{name}.{l}.transform_mu", (0, 2, 4)),
                "MLP_1": ref.mlp_params(sd, f"{name}.{l}.transform_sd", (0, 2, 4)),
            }
    return params


def build_pair(monkeypatch, likelihood, top_down):
    import torch

    import blvm.models.stcn.stcn as ref_stcn_mod

    import blvm_tpu.models.stcn.stcn as my_stcn_mod
    from blvm_tpu.models import STCN

    def _mean_rsample_torch(mu: torch.Tensor, sd: torch.Tensor) -> torch.Tensor:
        return mu

    monkeypatch.setattr(ref_stcn_mod, "rsample_gaussian", _mean_rsample_torch)
    monkeypatch.setattr(my_stcn_mod, "rsample_gaussian", lambda key, mu, sd: mu)

    torch.manual_seed(0)
    ref_model = ref_stcn_mod.STCN(
        likelihood=likelihood,
        n_layers=N_LAYERS,
        latent_size=list(LATENTS),
        res_channels=RES,
        top_down=top_down,
    ).eval()

    params = transplant(ref_model.state_dict())
    model = STCN(
        likelihood=likelihood,
        n_layers=N_LAYERS,
        latent_size=LATENTS,
        res_channels=RES,
        top_down=top_down,
    )
    return ref_model, model, params


@pytest.mark.parametrize("top_down", [True, False])
@pytest.mark.parametrize("likelihood", ["GMM", "DMoL"])
def test_stcn_forward_parity(monkeypatch, likelihood, top_down):
    import torch

    ref_model, model, params = build_pair(monkeypatch, likelihood, top_down)

    lengths = (64, 43)
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(31)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0
    beta, free_nats = 0.9, 0.5

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
    for l, ref_kl in enumerate(ref_out.klds):
        np.testing.assert_allclose(
            np.asarray(mets["klds"])[l], ref_kl.numpy(), rtol=1e-4, atol=1e-4, err_msg=f"layer {l}"
        )
