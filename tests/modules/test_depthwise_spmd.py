"""Depthwise convs under SPMD: the pinned upstream miscompile and the
shift-mul workaround.

jax 0.9.0's SPMD partitioner computes a WRONG kernel gradient for a grouped
conv (``feature_group_count > 1``) that feeds another conv when the batch is
sharded over ONE axis of a multi-axis mesh (replicated over the rest). The
forward is exact; the backward is off by O(1) — f64-verified, so it is a
miscompile, not rounding. Single-axis meshes are unaffected.

``test_grouped_conv_grad_miscompile_pinned`` xfails while the bug exists: if
a jax upgrade fixes it, the test XPASSes and the depthwise lowering policy
(``modules/convolutions.py:set_depthwise_impl``) can drop the multi-axis
"fma" detour. Until then the lowering is mesh-aware: the grouped form
("conv") on single-device/single-axis meshes — measured 2x faster for the
CWVAE coders on the v5e, and grad-verified safe on a single-axis mesh below —
and the shift-mul form ("fma") on multi-axis meshes and wherever parameters
shard (fsdp/multiseed force it).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blvm_tpu.modules.convolutions import (
    depthwise_conv1d,
    depthwise_conv_transpose1d,
    set_depthwise_impl,
)


def _mesh_2d():
    return Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))


@pytest.fixture
def force_fma():
    """Pin the SPMD-safe lowering for tests that device_put onto a hand-built
    multi-axis mesh (the "auto" default only sees ``parallel.mesh``'s
    process-wide mesh — see modules/convolutions.py)."""
    prev = set_depthwise_impl("fma")
    yield
    set_depthwise_impl(prev)


def _grouped(x, w, stride=1, padding=(0, 0), dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[tuple(padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=x.shape[-1],
    )


class TestPinnedUpstreamBug:
    @pytest.mark.xfail(
        reason="jax 0.9.0 SPMD partitioner: wrong kernel grad for grouped conv chains "
        "on multi-axis meshes (batch sharded on one axis, replicated on the rest)",
        strict=True,
    )
    def test_grouped_conv_grad_miscompile_pinned(self):
        rng = np.random.default_rng(0)
        B, T, C, k = 4, 16, 8, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)

        def f(w1_, w2_, x_):
            h = _grouped(x_, w1_, padding=(1, 1))
            h = _grouped(h, w2_, padding=(1, 1))
            return (jnp.sin(h) ** 2).sum()

        g1 = jax.jit(jax.grad(f))(w1, w2, x)
        xs = jax.device_put(x, NamedSharding(_mesh_2d(), P("data")))
        g8 = jax.jit(jax.grad(f))(w1, w2, xs)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g8), atol=1e-4)


class TestShiftMulEquivalence:
    @pytest.mark.parametrize("stride,dilation,padding", [
        (1, 1, (0, 0)), (2, 1, (0, 0)), (1, 2, (2, 2)), (2, 2, (1, 3)), (3, 1, (2, 2)),
    ])
    def test_forward_matches_grouped_conv(self, stride, dilation, padding):
        rng = np.random.default_rng(1)
        B, T, C, k = 3, 20, 5, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)
        ref = _grouped(x, w, stride, padding, dilation)
        # impl="fma" explicitly: with the "auto" default and no process mesh
        # this would resolve to "conv" and compare the grouped conv to itself
        got = depthwise_conv1d(x, w, stride=stride, padding=padding, dilation=dilation, impl="fma")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("stride,dilation,pad", [(1, 1, 0), (2, 1, 0), (2, 2, 1), (4, 1, 2)])
    def test_transpose_matches_grouped_lhs_dilation(self, stride, dilation, pad):
        rng = np.random.default_rng(2)
        B, T, C, k = 3, 9, 5, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)
        full = dilation * (k - 1)
        ref = jax.lax.conv_general_dilated(
            x, jnp.flip(w, 0), window_strides=(1,), padding=[(full - pad, full - pad)],
            lhs_dilation=(stride,), rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
        )
        got = depthwise_conv_transpose1d(x, w, stride=stride, padding=pad, dilation=dilation, impl="fma")
        assert got.shape == ref.shape == (B, (T - 1) * stride - 2 * pad + full + 1, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


class TestShiftMulUnderSPMD:
    def test_chained_grad_correct_on_2d_mesh(self, force_fma):
        """The exact pattern the grouped form miscompiles: a depthwise chain
        with the batch sharded on a (data, seq) mesh. The shift-mul form's
        kernel grads must match single-device."""
        rng = np.random.default_rng(3)
        B, T, C, k = 4, 16, 8, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)

        def f(w1_, w2_, x_):
            h = depthwise_conv1d(x_, w1_, padding=(1, 1))
            h = depthwise_conv_transpose1d(h, w2_, stride=2)
            return (jnp.sin(h) ** 2).sum()

        g1 = jax.jit(jax.grad(f, argnums=(0, 1)))(w1, w2, x)
        xs = jax.device_put(x, NamedSharding(_mesh_2d(), P("data")))
        g8 = jax.jit(jax.grad(f, argnums=(0, 1)))(w1, w2, xs)
        for a, b in zip(g1, g8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_cwvae_coder_grads_correct_on_2d_mesh(self, force_fma):
        """End to end through the CWVAE decoder coder (the site where the
        grouped form was first caught wrong): every param grad matches
        single-device on the (data, seq) mesh."""
        from blvm_tpu.models.clockwork_vae.conv_coders import ConvCoder1d

        dec = ConvCoder1d(strides=(2,), channels=8, kernel_size=3, stride_per_block=2,
                          num_blocks=2, transposed=True, channels_in=8, channels_out=8)
        rng = np.random.default_rng(4)
        z = jnp.asarray(rng.normal(size=(4, 8, 8)), jnp.float32)
        v = dec.init(jax.random.PRNGKey(0), z)

        def f(p, z_):
            ys = dec.apply(p, z_)
            return sum((jnp.sin(y) ** 2).sum() for y in jax.tree_util.tree_leaves(ys))

        g1 = jax.jit(jax.grad(f))(v, z)
        zs = jax.device_put(z, NamedSharding(_mesh_2d(), P("data")))
        g8 = jax.jit(jax.grad(f))(v, zs)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestGroupedConvSingleAxisMesh:
    def test_grouped_grads_correct_on_1d_mesh(self):
        """The evidence behind the "auto" policy's grouped choice for plain
        data parallelism: the miscompile-shaped grouped chain, batch sharded
        over a SINGLE-axis 8-device mesh — kernel grads match single-device."""
        rng = np.random.default_rng(5)
        B, T, C, k = 8, 16, 8, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)

        def f(w1_, w2_, x_):
            h = depthwise_conv1d(x_, w1_, padding=(1, 1), impl="conv")
            h = depthwise_conv_transpose1d(h, w2_, stride=2, impl="conv")
            return (jnp.sin(h) ** 2).sum()

        g1 = jax.jit(jax.grad(f, argnums=(0, 1)))(w1, w2, x)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        g8 = jax.jit(jax.grad(f, argnums=(0, 1)))(w1, w2, xs)
        for a, b in zip(g1, g8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


class TestImplSelection:
    def test_conv_and_fma_forward_grad_equivalent(self):
        """The two lowerings are the same math: forward and grads agree at
        float tolerance for strided/dilated/padded cases."""
        rng = np.random.default_rng(6)
        B, T, C, k = 3, 24, 5, 3
        x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, 1, C)), jnp.float32)
        for stride, dilation, padding in [(1, 1, (1, 1)), (2, 1, (0, 0)), (1, 2, (2, 2))]:

            def f(w_, impl):
                y = depthwise_conv1d(x, w_, stride=stride, padding=padding, dilation=dilation, impl=impl)
                return (jnp.sin(y) ** 2).sum(), y

            (l_c, y_c), g_c = jax.value_and_grad(lambda w_: f(w_, "conv"), has_aux=True)(w)
            (l_f, y_f), g_f = jax.value_and_grad(lambda w_: f(w_, "fma"), has_aux=True)(w)
            np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_f), rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_f), rtol=1e-5, atol=1e-6)

    def test_auto_follows_process_mesh(self):
        """"auto" resolves to the grouped form on no-mesh/single-axis meshes
        and to the shift-mul form on multi-axis meshes."""
        from blvm_tpu.modules.convolutions import _resolve_depthwise_impl
        from blvm_tpu.parallel import mesh as mesh_mod

        prev_mesh, prev_impl = mesh_mod._MESH, set_depthwise_impl("auto")
        try:
            mesh_mod._MESH = None
            assert _resolve_depthwise_impl(None) == "conv"
            mesh_mod._MESH = mesh_mod.make_mesh(8)  # 1-D data mesh
            assert _resolve_depthwise_impl(None) == "conv"
            mesh_mod._MESH = mesh_mod.make_mesh(8, model_axis_size=2)
            assert _resolve_depthwise_impl(None) == "fma"
            mesh_mod._MESH = mesh_mod.make_mesh(8, seq_axis_size=2)
            assert _resolve_depthwise_impl(None) == "fma"
            assert _resolve_depthwise_impl("conv") == "conv"  # explicit wins
            assert set_depthwise_impl("fma") == "auto"
            assert _resolve_depthwise_impl(None) == "fma"
        finally:
            mesh_mod._MESH = prev_mesh
            set_depthwise_impl(prev_impl)

    def test_invalid_impl_rejected(self):
        """Both the setter and an explicitly-passed per-call impl validate."""
        x = jnp.zeros((1, 8, 2))
        w = jnp.zeros((3, 1, 2))
        with pytest.raises(ValueError, match="unknown depthwise impl"):
            set_depthwise_impl("grouped")
        with pytest.raises(ValueError, match="unknown depthwise impl"):
            depthwise_conv1d(x, w, impl="grouped")
        with pytest.raises(ValueError, match="unknown depthwise impl"):
            depthwise_conv_transpose1d(x, w, impl="grouped")
