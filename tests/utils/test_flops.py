"""Tests for the jaxpr-walking MXU FLOP counter (utils/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blvm_tpu.utils.flops import count_flops


class TestCountFlops:
    def test_matmul_exact(self):
        x, w = jnp.ones((8, 64)), jnp.ones((64, 32))
        assert count_flops(lambda a, b: a @ b, x, w) == 2 * 8 * 64 * 32

    def test_scan_multiplies_trip_count(self):
        """The whole point: XLA's post-compile cost model counts a scan body
        once; this counter multiplies by the trip count."""
        w = jnp.ones((64, 64))
        x = jnp.ones((8, 64))

        def f(x, w):
            def body(c, _):
                return c @ w, None

            c, _ = jax.lax.scan(body, x, None, length=100)
            return c.sum()

        assert count_flops(f, x, w) == 100 * 2 * 8 * 64 * 64

    def test_conv1d_exact(self):
        # NWC conv: B=4, T=100, Cin=16 -> Cout=32, k=3, VALID -> T_out=98
        x = jnp.ones((4, 100, 16))
        k = jnp.ones((3, 16, 32))

        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
            )

        assert count_flops(f, x, k) == 2 * 4 * 98 * 32 * 16 * 3

    def test_depthwise_conv_groups(self):
        # depthwise: feature_group_count=16, kernel (3, 1, 16)
        x = jnp.ones((4, 100, 16))
        k = jnp.ones((3, 1, 16))

        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=16
            )

        assert count_flops(f, x, k) == 2 * 4 * 98 * 16 * 1 * 3

    def test_grad_counts_backward(self):
        """value_and_grad of x@w: forward (1x) + backward (dx and dw = 2x)."""
        x, w = jnp.ones((8, 64)), jnp.ones((64, 32))

        def loss(w):
            return (x @ w).sum()

        fwd = 2 * 8 * 64 * 32
        total = count_flops(lambda w: jax.value_and_grad(loss)(w), w)
        # dx is not needed (x is closed over): forward + dw
        assert fwd <= total <= 3 * fwd

    def test_model_train_step_counts(self):
        """An LSTMAudio train step's count is dominated by T' x the per-step
        cell cost and scales linearly in T (scan multiplied out)."""
        from blvm_tpu.models import LSTMAudio
        from blvm_tpu.parallel import make_train_step
        from blvm_tpu.training import TrainState, get_optimizer

        model = LSTMAudio(stack_size=8, hidden_size=16, num_mix=2, num_bins=256)

        def loss_fn(params, rng, batch, scalars):
            loss, mets, _ = model.apply(
                {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng}
            )
            return loss, (mets, None)

        def make(T):
            batch = {"x": jnp.zeros((2, T)), "x_sl": jnp.full((2,), T, jnp.int32)}
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, batch["x"], batch["x_sl"]
            )
            tx = get_optimizer("Adam", 1e-3)
            state = TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx, rng=jax.random.PRNGKey(2))
            step = make_train_step(loss_fn, jit=False)
            return count_flops(step, state, batch, {})

        f1, f2 = make(256), make(512)
        assert f1 > 0
        np.testing.assert_allclose(f2 / f1, 2.0, rtol=0.2)  # linear in T
