"""Chunked-evaluation (split_sequence + forward_split + state carry) parity
vs the reference.

This is the path that produces the paper's long-utterance numbers
(experiment_*_audio.py split-eval loops). Covered here:
  * WaveNet: receptive-field-overlap chunking, first-chunk-only rf padding
    (reference wavenet.py:230-253). The reference drops finished examples from
    later chunks (drop_inactive=True); our TPU version keeps static shapes
    with zero-length rows — losses are identical because both sides'
    normalization is Σ log p / Σ x_sl over active frames.
  * SRNN: modulo-strideable chunking with carried (d_n, a_n, z_n) states
    (reference srnn.py:487-499, experiment_srnn_audio.py:262-269). Tested on
    full-length batches: on RAGGED batches the reference's unmasked GRUs run
    through right padding, so its carried states are padding-polluted — our
    masked state freeze at each example's true length is a deliberate
    deviation required for bucket-shape invariance on TPU (NOTES.md).
CWVAE is excluded: the reference's own chunked path crashes (see
tests/models/test_cwvae.py::test_forward_split_chain_with_state_carry).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.parity import reference_loader as ref  # noqa: E402
from tests.parity import test_parity_srnn, test_parity_vrnn, test_parity_wavenet  # noqa: E402

try:
    ref.load_reference()
    HAVE_REFERENCE = True
except ImportError:
    HAVE_REFERENCE = False

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout unavailable")


def make_batch(seed, lengths, T):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (len(lengths), T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0
    return x


def test_wavenet_split_eval_parity():
    import torch

    ref_model, model, params = test_parity_wavenet.build_pair()
    rf = model.receptive_field
    lengths = (3 * rf + 20, 2 * rf + 5)
    T = max(lengths)
    x = make_batch(17, lengths, T)
    x_sl = np.asarray(lengths, np.int64)
    length = rf + 24  # chunk size for split_sequence

    with torch.no_grad():
        ref_splits, ref_sls = ref_model.split_sequence(
            torch.from_numpy(x).unsqueeze(-1), torch.from_numpy(x_sl), length=length
        )
    my_splits, my_sls = model.split_sequence(x[..., None], x_sl.astype(np.int32), length=length)

    # same number of chunks; our chunks keep all rows (static shapes, inactive
    # rows at zero length), the reference's keep only active rows
    assert len(my_splits) == len(ref_splits)

    fwd = jax.jit(
        lambda p, xs, xs_sl, first: model.apply(
            {"params": p}, xs, xs_sl, pad_causal=True, pad_receptive_field=first,
            rngs={"sample": jax.random.PRNGKey(0)}
        ),
        static_argnums=(3,),
    )

    for i, (rxs, rsl, mxs, msl) in enumerate(zip(ref_splits, ref_sls, my_splits, my_sls)):
        msl = np.asarray(msl)
        active = msl > 0
        assert active.sum() == rxs.shape[0], f"chunk {i}: active row count"
        np.testing.assert_array_equal(msl[active], rsl.numpy())
        with torch.no_grad():
            ref_loss, _, ref_out = ref_model.forward_split(rxs, rsl, i_split=i)
        loss, mets, _ = fwd(params, jnp.asarray(np.asarray(mxs)), jnp.asarray(msl, jnp.int32), i == 0)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6, err_msg=f"chunk {i}")
        np.testing.assert_allclose(
            np.asarray(mets["log_prob"])[active], ref_out.log_prob.numpy(), rtol=1e-4, atol=1e-3,
            err_msg=f"chunk {i}",
        )


def test_vrnn_split_eval_state_carry_parity(monkeypatch):
    """Reference VRNN driver split-eval: raw split_sequence chunks (overlap 0,
    drop_inactive=False) with h0 = previous chunk's h_n
    (experiment_vrnn_audio.py:252-257). The carried h_n is the reference's
    one-step-stale final state (vrnn.py:310-311,367) — quirk kept."""
    import torch

    from blvm.utils.operations import split_sequence as ref_split

    from blvm_tpu.ops.sequence import split_sequence as my_split

    ref_model, model, params = test_parity_vrnn.build_pair(monkeypatch, "DMoL")

    lengths = (96, 96)  # full-length: unmasked recurrences match trivially
    T = max(lengths)
    x = make_batch(41, lengths, T)
    x_sl = np.asarray(lengths, np.int64)
    length = 32
    beta, free_nats = 0.9, 0.5

    ref_splits, ref_sls = ref_split(
        torch.from_numpy(x).unsqueeze(-1), torch.from_numpy(x_sl), length=length, overlap=0, drop_inactive=False
    )
    my_splits, my_sls = my_split(x[..., None], x_sl.astype(np.int32), length=length)
    assert len(my_splits) == len(ref_splits) >= 2

    fwd = jax.jit(
        lambda p, xs, xs_sl, h0: model.apply(
            {"params": p}, xs, xs_sl, h0=h0, beta=beta, free_nats=free_nats,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
    )

    ref_h0, my_h0 = None, None
    for i, (rxs, rsl, mxs, msl) in enumerate(zip(ref_splits, ref_sls, my_splits, my_sls)):
        with torch.no_grad():
            ref_loss, _, ref_out = ref_model(rxs, rsl, h0=ref_h0, beta=beta, free_nats=free_nats)
        loss, mets, out = fwd(params, jnp.asarray(np.asarray(mxs)), jnp.asarray(np.asarray(msl), jnp.int32), my_h0)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6, err_msg=f"chunk {i}")
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]), ref_out.elbo.numpy(), rtol=1e-4, atol=1e-3, err_msg=f"chunk {i}"
        )
        ref_h0, my_h0 = ref_out.h_n, out.h_n
        np.testing.assert_allclose(
            np.asarray(my_h0), ref_h0.numpy(), rtol=1e-4, atol=1e-4, err_msg=f"h_n chunk {i}"
        )


def test_srnn_split_eval_state_carry_parity(monkeypatch):
    import torch

    ref_model, model, params = test_parity_srnn.build_pair(monkeypatch, "DMoL", smoothing=True)

    lengths = (144, 144)  # full-length: carried states are padding-free on both sides
    T = max(lengths)
    x = make_batch(29, lengths, T)
    x_sl = np.asarray(lengths, np.int64)
    length = 48

    with torch.no_grad():
        ref_splits, ref_sls = ref_model.split_sequence(
            torch.from_numpy(x).unsqueeze(-1), torch.from_numpy(x_sl), length=length
        )
    my_splits, my_sls = model.split_sequence(x[..., None], x_sl.astype(np.int32), length=length)
    assert len(my_splits) == len(ref_splits) >= 2

    fwd = jax.jit(
        lambda p, xs, xs_sl, d0, a0, z0: model.apply(
            {"params": p}, xs, xs_sl, d_0=d0, a_0=a0, z_0=z0, rngs={"sample": jax.random.PRNGKey(0)}
        )
    )

    ref_d0 = ref_a0 = ref_z0 = None
    my_d0 = my_a0 = my_z0 = None
    for i, (rxs, rsl, mxs, msl) in enumerate(zip(ref_splits, ref_sls, my_splits, my_sls)):
        with torch.no_grad():
            ref_loss, _, ref_out = ref_model.forward_split(rxs, rsl, d_0=ref_d0, a_0=ref_a0, z_0=ref_z0)
        loss, mets, out = fwd(
            params, jnp.asarray(np.asarray(mxs)), jnp.asarray(np.asarray(msl), jnp.int32), my_d0, my_a0, my_z0
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6, err_msg=f"chunk {i}")
        np.testing.assert_allclose(
            np.asarray(mets["elbo"]), ref_out.elbo.numpy(), rtol=1e-4, atol=1e-3, err_msg=f"chunk {i}"
        )
        # torch nn.GRU returns (num_layers, B, H) states; ours are (B, H)
        ref_d0, ref_a0, ref_z0 = ref_out.d_n, ref_out.a_n, ref_out.z_n
        my_d0, my_a0, my_z0 = out.d_n, out.a_n, out.z_n
        np.testing.assert_allclose(
            np.asarray(my_d0), ref_d0.numpy().reshape(np.asarray(my_d0).shape), rtol=1e-4, atol=1e-4,
            err_msg=f"d_n chunk {i}",
        )
        np.testing.assert_allclose(np.asarray(my_z0), ref_z0.numpy(), rtol=1e-4, atol=1e-4, err_msg=f"z_n chunk {i}")
        ref_d0, ref_a0 = ref_out.d_n, ref_out.a_n
