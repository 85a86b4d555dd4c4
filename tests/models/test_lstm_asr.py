"""SimpleLSTMASR tests: CTC loss vs torch oracle, decode, WER/CER, training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.data.token_map import TokenMap
from blvm_tpu.data.tokens import ENGLISH_STANDARD
from blvm_tpu.models.lstm_asr import SimpleLSTMASR
from blvm_tpu.utils.decoding import greedy_ctc, greedy_standard


@pytest.fixture(scope="module")
def token_map():
    return TokenMap(list("abc "), add_blank=True)


@pytest.fixture(scope="module")
def model(token_map):
    return SimpleLSTMASR.from_token_map(token_map, input_size=8, hidden_size=16, bidirectional=True)


class TestGreedyCTC:
    def test_collapse_and_blank_removal(self):
        # argmax sequence: [1, 1, 0, 1, 2, 2, 0] → collapse → [1, 0, 1, 2, 0] → drop blank → [1, 1, 2]
        T, C = 7, 3
        ids = [1, 1, 0, 1, 2, 2, 0]
        logits = np.full((1, T, C), -10.0)
        for t, i in enumerate(ids):
            logits[0, t, i] = 10.0
        out = greedy_ctc(logits, np.array([T]))
        assert out == [[1, 1, 2]]

    def test_respects_seq_len(self):
        logits = np.zeros((1, 5, 3))
        logits[:, :, 1] = 1.0
        out = greedy_ctc(logits, np.array([2]))
        assert out == [[1]]

    def test_greedy_standard(self):
        logits = np.zeros((1, 3, 4))
        logits[0, :, 2] = 1
        assert greedy_standard(logits, np.array([3])) == [[2, 2, 2]]


class TestForward:
    def test_contract(self, model, token_map):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 12, 8)), jnp.float32)
        x_sl = jnp.array([12, 9])
        y = jnp.asarray(rng.integers(1, 5, size=(2, 4)), jnp.int32)
        y_sl = jnp.array([4, 3])

        variables = model.init(jax.random.PRNGKey(0), x, x_sl, y, y_sl)
        loss, mets, out = model.apply(variables, x, x_sl, y, y_sl)
        assert np.isfinite(loss)
        assert out.logits.shape == (2, 12, len(token_map))

        metrics, hyps, refs = model.build_metrics(jax.device_get(mets))
        assert [m.name for m in metrics] == ["loss", "wer", "cer"]
        assert len(hyps) == 2 and len(refs) == 2

    def test_ctc_matches_torch(self, model):
        """Cross-check optax.ctc_loss against torch.nn.CTCLoss (oracle)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        B, T, C, N = 2, 10, 5, 4
        logits = rng.normal(size=(B, T, C)).astype(np.float32)
        y = rng.integers(1, C, size=(B, N)).astype(np.int64)
        z_sl = np.array([10, 8])
        y_sl = np.array([4, 2])

        import optax

        logit_paddings = (np.arange(T)[None, :] >= z_sl[:, None]).astype(np.float32)
        label_paddings = (np.arange(N)[None, :] >= y_sl[:, None]).astype(np.float32)
        got = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_paddings), jnp.asarray(y), jnp.asarray(label_paddings), blank_id=0)

        t_logp = torch.tensor(logits).log_softmax(-1).permute(1, 0, 2)  # (T, B, C)
        t_loss = torch.nn.CTCLoss(blank=0, reduction="none")(
            t_logp, torch.tensor(y), torch.tensor(z_sl), torch.tensor(y_sl)
        )
        np.testing.assert_allclose(np.asarray(got), t_loss.numpy(), rtol=1e-4)


class TestTraining:
    def test_learns_trivial_mapping(self, token_map):
        """Repetitive input with a single target token becomes decodable."""
        model = SimpleLSTMASR.from_token_map(token_map, input_size=4, hidden_size=16)
        rng = np.random.default_rng(2)
        B, T = 4, 12
        x = jnp.asarray(np.tile(np.eye(4)[0], (B, T, 1)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        y = jnp.full((B, 1), 2, jnp.int32)  # target token index 2
        y_sl = jnp.ones((B,), jnp.int32)

        variables = model.init(jax.random.PRNGKey(0), x, x_sl, y, y_sl)

        import optax

        tx = optax.adam(1e-2)
        params = variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                loss, _, _ = model.apply({"params": p}, x, x_sl, y, y_sl)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(250):
            params, opt_state, loss = step(params, opt_state)

        _, mets, _ = model.apply({"params": params}, x, x_sl, y, y_sl)
        metrics, hyps, refs = model.build_metrics(jax.device_get(mets))
        wer = [m for m in metrics if m.name == "wer"][0]
        assert wer.value == 0.0, f"hyps={hyps} refs={refs}"
