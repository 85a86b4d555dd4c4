"""Torch-oracle tests for the depthwise-separable conv modules: output
geometry and exact values vs torch.nn with copied weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.modules import ConvDepthwiseSeparable1d, ConvTransposeDepthwiseSeparable1d

torch = pytest.importorskip("torch")


def torch_forward(x_btc, dw_kernel, dw_bias, pw_kernel, *, stride, padding, dilation, transposed):
    """Reference computation with torch.nn (channels-first)."""
    C = x_btc.shape[-1]
    out_channels = pw_kernel.shape[-1]
    k = dw_kernel.shape[0]
    if transposed:
        dw = torch.nn.ConvTranspose1d(C, C, k, stride=stride, padding=padding, dilation=dilation, groups=C, bias=True)
        # torch transposed weight: (in, out/groups, k) = (C, 1, k)
        dw.weight.data = torch.from_numpy(np.asarray(dw_kernel).transpose(2, 1, 0).copy())
    else:
        dw = torch.nn.Conv1d(C, C, k, stride=stride, padding=padding, dilation=dilation, groups=C, bias=True)
        # torch weight: (out, in/groups, k) = (C, 1, k)
        dw.weight.data = torch.from_numpy(np.asarray(dw_kernel).transpose(2, 1, 0).copy())
    dw.bias.data = torch.from_numpy(np.asarray(dw_bias).copy())
    pw = torch.nn.Conv1d(C, out_channels, 1, bias=False)
    pw.weight.data = torch.from_numpy(np.asarray(pw_kernel).T.copy()[:, :, None])

    with torch.no_grad():
        xt = torch.from_numpy(np.asarray(x_btc).transpose(0, 2, 1).copy())
        y = pw(torch.relu(dw(xt)))
    return y.numpy().transpose(0, 2, 1)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 0, 1), (2, 2, 1), (1, 1, 2), (3, 0, 1)])
class TestForwardVariant:
    def test_matches_torch(self, stride, padding, dilation):
        rng = np.random.default_rng(0)
        B, T, C, O, k = 2, 24, 6, 5, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        mod = ConvDepthwiseSeparable1d(out_channels=O, kernel_size=k, stride=stride, padding=padding, dilation=dilation)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        p = variables["params"]
        y_ref = torch_forward(
            x, p["depthwise_kernel"], p["depthwise_bias"], p["pointwise_kernel"],
            stride=stride, padding=padding, dilation=dilation, transposed=False,
        )
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 0, 1), (2, 0, 1), (2, 1, 1), (4, 2, 1), (2, 0, 2)])
class TestTransposedVariant:
    def test_matches_torch(self, stride, padding, dilation):
        rng = np.random.default_rng(1)
        B, T, C, O, k = 2, 10, 4, 3, 5
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        mod = ConvTransposeDepthwiseSeparable1d(
            out_channels=O, kernel_size=k, stride=stride, padding=padding, dilation=dilation
        )
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        p = variables["params"]
        y_ref = torch_forward(
            x, p["depthwise_kernel"], p["depthwise_bias"], p["pointwise_kernel"],
            stride=stride, padding=padding, dilation=dilation, transposed=True,
        )
        # torch ConvTranspose1d geometry: (T-1)*s - 2p + d*(k-1) + 1
        assert y.shape == y_ref.shape == (B, (T - 1) * stride - 2 * padding + dilation * (k - 1) + 1, O)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


class TestNorm:
    def test_group_norm_path(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 4)), jnp.float32)
        mod = ConvDepthwiseSeparable1d(out_channels=3, kernel_size=3, use_norm=True)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert np.all(np.isfinite(np.asarray(y)))
        assert "GroupNorm_0" in variables["params"]
