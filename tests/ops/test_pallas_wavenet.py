"""Pallas fused WaveNet block: interpret-mode correctness vs the jnp reference
and vs the flax Conv1dResidualGLU module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.ops.pallas.wavenet_block import fused_residual_glu, fused_residual_glu_reference


def make_inputs(B=2, T=64, C=16, Cs=16, dilation=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, C)) * 0.5, jnp.float32)
    wg = jnp.asarray(rng.normal(size=(2, C, 2 * C)) * 0.1, jnp.float32)
    bg = jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, C + Cs)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(C + Cs,)) * 0.1, jnp.float32)
    return x, wg, bg, w1, b1


class TestKernelCorrectness:
    @pytest.mark.parametrize("dilation", [1, 2, 4, 16])
    def test_matches_reference(self, dilation):
        x, wg, bg, w1, b1 = make_inputs(dilation=dilation)
        ref_out, ref_skip = fused_residual_glu_reference(x, wg, bg, w1, b1, dilation)
        out, skip = fused_residual_glu(x, wg, bg, w1, b1, dilation, 16, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(skip), np.asarray(ref_skip), atol=1e-5)

    def test_uneven_tile_fallback(self):
        # T_out = 60 with t_tile 16 → gcd tiling
        x, wg, bg, w1, b1 = make_inputs(T=64, dilation=4)
        out, skip = fused_residual_glu(x, wg, bg, w1, b1, 4, 16, True)
        ref_out, _ = fused_residual_glu_reference(x, wg, bg, w1, b1, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)

    def test_flax_module_flag_parity(self):
        """Conv1dResidualGLU gives identical results with and without the
        fused kernel (shared parameters, both paths)."""
        from blvm_tpu.models.wavenet.modules import Conv1dResidualGLU

        B, T, C, dilation = 2, 48, 16, 2
        x, _, _, _, _ = make_inputs(B=B, T=T, C=C, dilation=dilation)

        block = Conv1dResidualGLU(res_channels=C, kernel_size=2, dilation=dilation)
        variables = block.init(jax.random.PRNGKey(0), x, T - dilation)
        out_flax, skip_flax = block.apply(variables, x, T - dilation)

        block_k = Conv1dResidualGLU(
            res_channels=C, kernel_size=2, dilation=dilation, use_pallas=True, pallas_interpret=True
        )
        out_k, skip_k = block_k.apply(variables, x, T - dilation)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_flax), atol=1e-5)
        np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_flax), atol=1e-5)

    def test_gradients_match_reference(self):
        x, wg, bg, w1, b1 = make_inputs(dilation=2)

        def loss_kernel(x, wg, bg, w1, b1):
            out, skip = fused_residual_glu(x, wg, bg, w1, b1, 2, 16, True)
            return (out**2).sum() + (skip**2).sum()

        def loss_ref(x, wg, bg, w1, b1):
            out, skip = fused_residual_glu_reference(x, wg, bg, w1, b1, 2)
            return (out**2).sum() + (skip**2).sum()

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x, wg, bg, w1, b1)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wg, bg, w1, b1)
        for a, b in zip(g_k, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_short_input_falls_back(self):
        x, wg, bg, w1, b1 = make_inputs(T=4, dilation=8)  # T_out <= 0
        out, skip = fused_residual_glu(x, wg, bg, w1, b1, 8, 16, True)
        assert out.shape[1] == 0 or out.shape[1] == x.shape[1] - 8
