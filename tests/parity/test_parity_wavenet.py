"""End-to-end numerical parity: reference torch WaveNet vs blvm_tpu WaveNet.

Transplants reference weights (causal conv, always-applied in_transform,
dilated residual-GLU blocks, pointwise head, DMoL) and asserts forward parity
(loss + per-example log_prob) for both pad_receptive_field modes and ragged
lengths (reference blvm/models/wavenet/wavenet.py:148-230).
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

N_LAYERS, N_STACKS, RES, NUM_MIX, NUM_BINS = 3, 2, 8, 3, 256


def transplant(sd, n_layers=None, n_stacks=None):
    """torch WaveNet state_dict -> flax params (reused by train-step parity
    and the convergence harness, which passes its own architecture)."""
    n_blocks = (n_layers or N_LAYERS) * (n_stacks or N_STACKS)
    res_stack = {"Conv1d_0": ref.conv1d_params(sd, "res_stack.in_transform")}
    for i in range(n_blocks):
        res_stack[f"Conv1dResidualGLU_{i}"] = ref.residual_glu_params(sd, f"res_stack.res_blocks.{i}")
    return {
        "causal": {"Conv1d_0": ref.conv1d_params(sd, "causal.conv")},
        "res_stack": res_stack,
        "out_transform": {"Dense_0": ref.linear_params(sd, "out_transform.linear")},
        "likelihood_head": {"Dense_0": ref.linear_params(sd, "likelihood.params")},
    }


def build_pair():
    import torch

    from blvm.models.wavenet.wavenet import WaveNet as RefWaveNet
    from blvm.modules.distributions import DiscretizedLogisticMixtureDense as RefDMoL

    from blvm_tpu.models import WaveNet

    torch.manual_seed(0)
    likelihood = RefDMoL(x_dim=RES, y_dim=1, num_mix=NUM_MIX, num_bins=NUM_BINS)
    ref_model = RefWaveNet(
        likelihood=likelihood, n_layers=N_LAYERS, n_stacks=N_STACKS, res_channels=RES, num_bins=NUM_BINS
    ).eval()

    params = transplant(ref_model.state_dict())
    model = WaveNet(
        n_layers=N_LAYERS, n_stacks=N_STACKS, res_channels=RES, num_mix=NUM_MIX, num_bins=NUM_BINS
    )
    return ref_model, model, params


@pytest.mark.parametrize("pad_receptive_field", [True, False])
def test_wavenet_forward_parity(pad_receptive_field):
    import torch

    ref_model, model, params = build_pair()
    rf = model.receptive_field
    assert rf == ref_model.receptive_field

    lengths = (rf + 40, rf + 17)
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0
    x_sl = np.asarray(lengths, np.int64)

    with torch.no_grad():
        ref_loss, _, ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(x_sl), pad_receptive_field=pad_receptive_field
        )

    loss, mets, _ = jax.jit(
        lambda p, x, x_sl: model.apply(
            {"params": p},
            x,
            x_sl,
            pad_receptive_field=pad_receptive_field,
            rngs={"sample": jax.random.PRNGKey(0)},
        ),
        static_argnames=(),
    )(params, jnp.asarray(x), jnp.asarray(x_sl.astype(np.int32)))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mets["log_prob"]), ref_out.log_prob.numpy(), rtol=1e-4, atol=1e-3
    )
