"""End-to-end numerical parity: reference torch LSTMAudio vs blvm_tpu LSTMAudio.

Transplants the reference model's weights into the flax model and asserts the
full forward pass (loss + per-example log_prob) matches on seeded synthetic
batches with ragged lengths. This validates the whole chain — frame stacking,
MLP embed, packed-LSTM-equivalent masking, decode, DMoL likelihood, masked
normalization (reference blvm/models/lstm.py:72-131).
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


def transplant(sd, num_layers=2):
    """torch LSTMAudio state_dict -> flax params (reused by train-step parity)."""
    return {
        "embedding": ref.mlp_params(sd, "embedding"),
        "decoder": ref.mlp_params(sd, "decoder"),
        "lstm": ref.lstm_params(sd, "lstm", num_layers=num_layers),
        "likelihood": {"Dense_0": ref.linear_params(sd, "likelihood.params")},
    }


def build_pair(stack_size=8, hidden_size=16, num_layers=2, num_mix=3, num_bins=256):
    import torch

    from blvm.models.lstm import LSTMAudio as RefLSTMAudio

    from blvm_tpu.models import LSTMAudio

    torch.manual_seed(0)
    ref_model = RefLSTMAudio(
        stack_size=stack_size,
        hidden_size=hidden_size,
        num_layers=num_layers,
        num_mix=num_mix,
        num_bins=num_bins,
    ).eval()

    params = transplant(ref_model.state_dict(), num_layers=num_layers)
    model = LSTMAudio(
        stack_size=stack_size,
        hidden_size=hidden_size,
        num_layers=num_layers,
        num_mix=num_mix,
        num_bins=num_bins,
    )
    return ref_model, model, params


@pytest.mark.parametrize("lengths", [(256, 256, 256), (256, 192, 100)])
def test_lstm_audio_forward_parity(lengths):
    import torch

    ref_model, model, params = build_pair()

    B = len(lengths)
    T = max(lengths)
    rng = np.random.default_rng(42)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0
    x_sl = np.asarray(lengths, np.int32)  # descending (pack_padded_sequence)

    with torch.no_grad():
        ref_loss, _, ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(np.asarray(lengths)))

    loss, mets, outputs = jax.jit(
        lambda p, x, x_sl: model.apply(
            {"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)}
        )
    )(params, jnp.asarray(x), jnp.asarray(x_sl))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mets["log_prob"]), ref_out.ll.numpy(), rtol=1e-4, atol=1e-3
    )


def test_lstm_audio_final_state_parity():
    """Packed-sequence final state vs masked-scan frozen state (split-eval carry)."""
    import torch

    ref_model, model, params = build_pair()
    lengths = (256, 160)
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0

    with torch.no_grad():
        _, _, ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(np.asarray(lengths)))
    ref_h, ref_c = ref_out.s_n  # (L, B, H)

    _, _, outputs = jax.jit(
        lambda p, x, x_sl: model.apply(
            {"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)}
        )
    )(params, jnp.asarray(x), jnp.asarray(np.asarray(lengths, np.int32)))
    h_n, c_n = outputs.s_n

    np.testing.assert_allclose(np.asarray(h_n), ref_h.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_n), ref_c.numpy(), rtol=1e-4, atol=1e-5)
