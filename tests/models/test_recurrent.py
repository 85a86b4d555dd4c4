"""Cross-validate the scan-based LSTM/GRU cores against torch's cuDNN-math
reference implementations (torch CPU is available in the image — used as an
independent oracle only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from blvm_tpu.modules.recurrent import GRU, GRUCell, LSTM


def _copy_lstm_weights_to_torch(params, t_lstm, num_layers):
    for layer in range(num_layers):
        p = params
        getattr(t_lstm, f"weight_ih_l{layer}").data = torch.tensor(np.asarray(p[f"w_ih_{layer}"]).T)
        getattr(t_lstm, f"weight_hh_l{layer}").data = torch.tensor(np.asarray(p[f"w_hh_{layer}"]).T)
        getattr(t_lstm, f"bias_ih_l{layer}").data = torch.tensor(np.asarray(p[f"b_ih_{layer}"]))
        getattr(t_lstm, f"bias_hh_l{layer}").data = torch.tensor(np.asarray(p[f"b_hh_{layer}"]))


class TestLSTMAgainstTorch:
    @pytest.mark.parametrize("num_layers", [1, 2])
    def test_full_length_outputs_match(self, num_layers):
        B, T, D, H = 3, 11, 5, 8
        rng = np.random.default_rng(0)
        x = rng.normal(size=(B, T, D)).astype(np.float32)

        model = LSTM(hidden_size=H, num_layers=num_layers)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out, (h_n, c_n) = model.apply(variables, jnp.asarray(x))

        t_lstm = torch.nn.LSTM(D, H, num_layers=num_layers, batch_first=True)
        _copy_lstm_weights_to_torch(variables["params"], t_lstm, num_layers)
        with torch.no_grad():
            t_out, (t_h, t_c) = t_lstm(torch.tensor(x))

        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_n), t_h.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_n), t_c.numpy(), atol=1e-5)

    def test_masked_final_state_matches_packed(self):
        B, T, D, H = 2, 10, 4, 6
        rng = np.random.default_rng(1)
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        lens = np.array([10, 6])

        model = LSTM(hidden_size=H)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        mask = jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None]
        out, (h_n, c_n) = model.apply(variables, jnp.asarray(x), mask=mask)

        t_lstm = torch.nn.LSTM(D, H, batch_first=True)
        _copy_lstm_weights_to_torch(variables["params"], t_lstm, 1)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.tensor(x), torch.tensor(lens), batch_first=True, enforce_sorted=True
        )
        with torch.no_grad():
            t_out_packed, (t_h, t_c) = t_lstm(packed)
            t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(t_out_packed, batch_first=True)

        np.testing.assert_allclose(np.asarray(h_n), t_h.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_n), t_c.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)  # zeros beyond length


class TestGRUAgainstTorch:
    def test_cell_matches(self):
        B, D, H = 4, 3, 5
        rng = np.random.default_rng(2)
        x = rng.normal(size=(B, D)).astype(np.float32)
        h = rng.normal(size=(B, H)).astype(np.float32)

        cell = GRUCell(hidden_size=H)
        variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))
        out = cell.apply(variables, jnp.asarray(x), jnp.asarray(h))

        t_cell = torch.nn.GRUCell(D, H)
        p = variables["params"]
        t_cell.weight_ih.data = torch.tensor(np.asarray(p["w_ih"]).T)
        t_cell.weight_hh.data = torch.tensor(np.asarray(p["w_hh"]).T)
        t_cell.bias_ih.data = torch.tensor(np.asarray(p["b_ih"]))
        t_cell.bias_hh.data = torch.tensor(np.asarray(p["b_hh"]))
        with torch.no_grad():
            t_out = t_cell(torch.tensor(x), torch.tensor(h))

        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)

    def test_sequence_gru_matches_torch(self):
        B, T, D, H = 2, 7, 3, 4
        rng = np.random.default_rng(3)
        x = rng.normal(size=(B, T, D)).astype(np.float32)

        model = GRU(hidden_size=H)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out, h_n = model.apply(variables, jnp.asarray(x))

        t_gru = torch.nn.GRU(D, H, batch_first=True)
        p = variables["params"]
        t_gru.weight_ih_l0.data = torch.tensor(np.asarray(p["w_ih"]).T)
        t_gru.weight_hh_l0.data = torch.tensor(np.asarray(p["w_hh"]).T)
        t_gru.bias_ih_l0.data = torch.tensor(np.asarray(p["b_ih"]))
        t_gru.bias_hh_l0.data = torch.tensor(np.asarray(p["b_hh"]))
        with torch.no_grad():
            t_out, t_h = t_gru(torch.tensor(x))

        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_n), t_h.numpy()[0], atol=1e-5)
