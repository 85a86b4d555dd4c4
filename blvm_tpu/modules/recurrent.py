"""Recurrent cores as ``lax.scan`` over fused cell matmuls.

TPU-native replacement for cuDNN LSTM/GRU (reference uses ``nn.LSTM``/
``GRUCell`` — e.g. ``blvm/models/lstm.py:46``, ``blvm/models/vrnn.py:136``).
Design (SURVEY §7 design mapping):

  * The input projection ``x @ W_ih`` for ALL timesteps is computed as one big
    time-parallel matmul (folds (B, T) into the MXU's leading dim) — only the
    small ``h @ W_hh`` recurrence runs inside ``lax.scan``.
  * Variable lengths are handled by masking the carry (state freezes after the
    sequence ends), which reproduces packed-sequence final-state semantics
    under static shapes.
  * Gate math matches torch exactly (gate order i,f,g,o for LSTM; r,z,n for
    GRU; GRU's ``r * (W_hn h + b_hn)`` placement) so configurations transfer.

Weights use torch's U(-1/sqrt(H), 1/sqrt(H)) initialization.

``unroll`` passes through to ``lax.scan``: on TPU the serial scan is
per-iteration-latency bound (~6 us/iter on v5e regardless of body size up to
~4 dependent matmuls — `scripts/perf/roofline_scan.py --calibrate`), and
unrolling lets XLA overlap weight loads and fuse across iterations. It is a
pure scheduling knob: the iteration math and order are unchanged.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _rnn_uniform_init(hidden_size: int):
    bound = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTM(nn.Module):
    """Stacked unidirectional LSTM over (B, T, D) with per-example lengths.

    Returns ``(outputs (B, T, H), (h_n, c_n))`` with ``h_n/c_n`` of shape
    ``(num_layers, B, H)`` — the state at each sequence's true end. Outputs
    beyond a sequence's length are zeroed (pad_packed_sequence semantics).
    """

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    unroll: int = 1  # lax.scan unroll factor — pure scheduling knob, same math

    @nn.compact
    def __call__(self, x, mask=None, initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None, deterministic: bool = True):
        B, T = x.shape[0], x.shape[1]
        H = self.hidden_size
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if initial_state is None:
            h_0 = jnp.zeros((self.num_layers, B, H), x.dtype)
            c_0 = jnp.zeros((self.num_layers, B, H), x.dtype)
        else:
            h_0, c_0 = initial_state
            h_0 = h_0.astype(x.dtype)
            c_0 = c_0.astype(x.dtype)

        if mask is None:
            mask_t = jnp.ones((T, B, 1), x.dtype)
        else:
            mask_t = jnp.transpose(mask.astype(x.dtype), (1, 0))[..., None]  # (T, B, 1)

        init = _rnn_uniform_init(H)
        h_ns, c_ns = [], []
        layer_in = x
        for layer in range(self.num_layers):
            in_features = layer_in.shape[-1]
            w_ih = self.param(f"w_ih_{layer}", init, (in_features, 4 * H))
            b_ih = self.param(f"b_ih_{layer}", init, (4 * H,))
            w_hh = self.param(f"w_hh_{layer}", init, (H, 4 * H))
            b_hh = self.param(f"b_hh_{layer}", init, (4 * H,))
            if self.dtype is not None:
                w_ih, b_ih = w_ih.astype(self.dtype), b_ih.astype(self.dtype)
                w_hh, b_hh = w_hh.astype(self.dtype), b_hh.astype(self.dtype)

            # time-parallel input projection: one (B*T, D) @ (D, 4H) matmul
            xw = layer_in @ w_ih + b_ih  # (B, T, 4H)
            xw_t = jnp.transpose(xw, (1, 0, 2))  # (T, B, 4H)

            def step(carry, inputs, w_hh=w_hh, b_hh=b_hh):
                h, c = carry
                xw_i, m = inputs
                gates = xw_i + h @ w_hh + b_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                # freeze state after sequence end
                h = m * h_new + (1 - m) * h
                c = m * c_new + (1 - m) * c
                return (h, c), h_new * m

            (h_n, c_n), out_t = jax.lax.scan(step, (h_0[layer], c_0[layer]), (xw_t, mask_t), unroll=self.unroll)
            h_ns.append(h_n)
            c_ns.append(c_n)
            layer_in = jnp.transpose(out_t, (1, 0, 2))  # (B, T, H)

            if self.dropout > 0 and layer < self.num_layers - 1 and not deterministic:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1.0 - self.dropout, layer_in.shape)
                layer_in = jnp.where(keep, layer_in / (1.0 - self.dropout), 0.0)

        return layer_in, (jnp.stack(h_ns), jnp.stack(c_ns))


class GRUCell(nn.Module):
    """Single-step GRU cell with torch gate math (for per-step use inside
    model-level scans; for full sequences prefer :class:`GRU`).

    ``orthogonal_hh`` applies orthogonal init to the recurrent weight, as the
    VRNN/SRNN cells do (reference ``vrnn.py:99-100``, ``srnn.py:130``).
    """

    hidden_size: int
    orthogonal_hh: bool = False

    @nn.compact
    def __call__(self, x, h):
        H = self.hidden_size
        init = _rnn_uniform_init(H)
        hh_init = jax.nn.initializers.orthogonal() if self.orthogonal_hh else init
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H))
        b_ih = self.param("b_ih", init, (3 * H,))
        w_hh = self.param("w_hh", hh_init, (H, 3 * H))
        b_hh = self.param("b_hh", init, (3 * H,))

        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class GRU(nn.Module):
    """Unidirectional GRU over (B, T, D) with time-parallel input projection.

    Returns ``(outputs (B, T, H), h_n (B, H))``.
    """

    hidden_size: int
    unroll: int = 1  # lax.scan unroll factor — pure scheduling knob, same math

    @nn.compact
    def __call__(self, x, mask=None, initial_state: Optional[jnp.ndarray] = None):
        B, T = x.shape[0], x.shape[1]
        H = self.hidden_size

        h_0 = jnp.zeros((B, H), x.dtype) if initial_state is None else initial_state
        if mask is None:
            mask_t = jnp.ones((T, B, 1), x.dtype)
        else:
            mask_t = jnp.transpose(mask.astype(x.dtype), (1, 0))[..., None]

        init = _rnn_uniform_init(H)
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H))
        b_ih = self.param("b_ih", init, (3 * H,))
        w_hh = self.param("w_hh", init, (H, 3 * H))
        b_hh = self.param("b_hh", init, (3 * H,))

        gi = x @ w_ih + b_ih  # (B, T, 3H) — time-parallel
        gi_t = jnp.transpose(gi, (1, 0, 2))

        def step(h, inputs):
            gi_i, m = inputs
            gh = h @ w_hh + b_hh
            i_r, i_z, i_n = jnp.split(gi_i, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h
            h = m * h_new + (1 - m) * h
            return h, h_new * m

        h_n, out_t = jax.lax.scan(step, h_0, (gi_t, mask_t), unroll=self.unroll)
        return jnp.transpose(out_t, (1, 0, 2)), h_n
