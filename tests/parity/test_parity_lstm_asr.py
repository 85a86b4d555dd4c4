"""End-to-end numerical parity: reference torch SimpleLSTMASR vs ours.

The reference model (``blvm/models/lstm_asr.py:14-84``) is LSTMBlock (stacked
torch ``nn.LSTM`` layers, optionally bidirectional) → Linear → log-softmax →
``nn.CTCLoss`` (sum over examples / Σ y_sl) plus greedy-CTC WER/CER. Ours is
the fused-scan LSTMBlock (``blvm_tpu/modules/lstm_block.py``) → Dense →
``optax.ctc_loss``. The CTC op itself is oracle-tested in
tests/models/test_lstm_asr.py; this module pins the full forward after weight
transplant — the surface the convergence harness (scripts/parity) relies on.

Dropout is off: torch and jax PRNGs cannot produce identical masks.
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


def transplant(sd, num_layers=1, bidirectional=False):
    """torch SimpleLSTMASR state_dict -> flax params.

    Reference LSTMBlock owns one single-layer ``nn.LSTM`` per stacked layer
    (``lstm.lstm_layers.{i}``, torch i,f,g,o gate order — same as our scan
    cell); bidirectional weights carry the ``_reverse`` suffix and map to our
    ``bwd_{i}`` submodules.
    """
    lstm = {}
    for idx in range(num_layers):
        p = f"lstm.lstm_layers.{idx}"

        def direction(suffix):
            return {
                "w_ih_0": ref.t2n(sd[f"{p}.weight_ih_l0{suffix}"]).T,
                "w_hh_0": ref.t2n(sd[f"{p}.weight_hh_l0{suffix}"]).T,
                "b_ih_0": ref.t2n(sd[f"{p}.bias_ih_l0{suffix}"]),
                "b_hh_0": ref.t2n(sd[f"{p}.bias_hh_l0{suffix}"]),
            }

        lstm[f"fwd_{idx}"] = direction("")
        if bidirectional:
            lstm[f"bwd_{idx}"] = direction("_reverse")
    return {"lstm": lstm, "output": ref.linear_params(sd, "output")}


def build_pair(num_layers=2, bidirectional=True, hidden_size=16, input_size=8, **overrides):
    import torch

    from blvm.data.token_map import TokenMap as RefTokenMap
    from blvm.data.tokens import TIMIT_PHONESET as REF_PHONESET
    from blvm.models.lstm_asr import SimpleLSTMASR as RefASR

    from blvm_tpu.data.token_map import TokenMap
    from blvm_tpu.data.tokens import TIMIT_PHONESET
    from blvm_tpu.models.lstm_asr import SimpleLSTMASR

    tokens = list(TIMIT_PHONESET[:12])
    assert tokens == list(REF_PHONESET[:12])
    kw = dict(
        input_size=input_size,
        hidden_size=hidden_size,
        num_layers=num_layers,
        bidirectional=bidirectional,
        dropout_prob=0.0,
        **overrides,
    )
    torch.manual_seed(0)
    ref_model = RefASR(token_map=RefTokenMap(tokens=tokens, add_blank=True), **kw).eval()
    params = transplant(ref_model.state_dict(), num_layers=num_layers, bidirectional=bidirectional)
    model = SimpleLSTMASR.from_token_map(TokenMap(tokens=tokens, add_blank=True), **kw)
    return ref_model, model, params


@pytest.mark.parametrize("num_layers,bidirectional", [(1, False), (2, True)])
def test_lstm_asr_forward_parity(num_layers, bidirectional):
    import torch

    ref_model, model, params = build_pair(num_layers=num_layers, bidirectional=bidirectional)

    B, T, D, N = 3, 50, 8, 7
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    x_sl = np.asarray([50, 37, 22])
    for i, sl in enumerate(x_sl):
        x[i, sl:] = 0.0
    y = rng.integers(1, 13, (B, N)).astype(np.int64)  # 0 is blank
    y_sl = np.asarray([7, 5, 3])
    for i, sl in enumerate(y_sl):
        y[i, sl:] = 0

    with torch.no_grad():
        # reference layout: (B, D, T)
        ref_loss, ref_metrics, ref_out = ref_model(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(x_sl),
            torch.from_numpy(y),
            torch.from_numpy(y_sl),
        )

    loss, mets, out = jax.jit(
        lambda p: model.apply(
            {"params": p}, jnp.asarray(x), jnp.asarray(x_sl), jnp.asarray(y), jnp.asarray(y_sl)
        )
    )(params)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)

    # logits along the valid frames (padded frames differ by design: the
    # reference zeroes packed-sequence padding, we mask the scan carry)
    ref_logits = ref_out.logits.numpy()  # (B, T, O)
    my_logits = np.asarray(out.logits)
    for i, sl in enumerate(x_sl):
        np.testing.assert_allclose(my_logits[i, :sl], ref_logits[i, :sl], rtol=1e-4, atol=1e-4)

    # greedy decode (and therefore WER/CER inputs) identical
    metrics, hyps, refs = model.build_metrics(jax.device_get(mets))
    assert hyps == ref_out.hyps
    assert refs == ref_out.refs
