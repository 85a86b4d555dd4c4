"""Depthwise-separable 1-D convolutions (reference
``blvm/modules/convolutions.py:6-104``).

Channels-last (B, T, C) rebuilds of ``ConvDepthwiseSeparable1d`` and
``ConvTransposeDepthwiseSeparable1d``: depthwise conv (one filter per channel,
bias) → activation → optional per-channel norm → pointwise 1×1 (no bias).
The transposed variant uses XLA's native input-dilation form of
``conv_general_dilated`` with torch ``ConvTranspose1d`` geometry
``out = (T-1)·s − 2p + d·(k−1) + 1``.

The Clockwork-VAE coders keep their own specialized block
(``models/clockwork_vae/conv_coders.py``) with fixed ReLU + GroupNorm; these
are the general, reusable modules matching the reference API.
"""

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# How depthwise convs lower (see :func:`depthwise_conv1d`):
#   * "conv" — XLA grouped conv (``feature_group_count=C``). The fast form on
#     this backend (CWVAE coders measured 2x faster per train step than the
#     shift-mul form on the v5e), but jax 0.9.0's SPMD partitioner computes a
#     WRONG kernel gradient for grouped convs that feed another conv when the
#     batch is sharded over one axis of a MULTI-axis mesh (f64-verified
#     miscompile, pinned in ``tests/modules/test_depthwise_spmd.py``).
#   * "fma" — k shifted elementwise multiply-adds. No grouped conv, partitions
#     correctly on every mesh; the safe form wherever parameters or the batch
#     shard over more than one mesh axis (tensor/seq/pipeline parallelism) or
#     parameters shard at all (fsdp, multiseed — unverified against the
#     upstream bug, so treated as unsafe).
#   * "auto" (default) — "conv" when the process-wide mesh
#     (``parallel/mesh.py:get_mesh``) has at most one non-trivial axis (single
#     device, or plain data parallelism — the f64 probe and
#     ``tests/modules/test_depthwise_spmd.py::TestGroupedConvSingleAxisMesh``
#     verify single-axis meshes are unaffected), else "fma". The fsdp and
#     multiseed entry points force "fma" (they shard parameters over the data
#     axis, which the single-axis verification did not cover).
#     CAVEAT: "auto" trusts ``parallel.mesh`` as the process-wide mesh
#     authority. Code that device_puts onto a hand-built multi-axis Mesh
#     without ``make_mesh`` must call ``set_depthwise_impl("fma")`` itself.
_DEPTHWISE_IMPL = "auto"


def set_depthwise_impl(impl: str) -> str:
    """Select the depthwise lowering ("conv" | "fma" | "auto"); returns the
    previous setting. Takes effect at trace time — call before the first step
    compiles (the drivers, fsdp, and multiseed entry points do).

    Trace-time caveat: a function that was already jit-TRACED keeps the
    lowering it traced with, even when later executed under different
    shardings — sharding-driven recompiles re-lower the cached jaxpr without
    re-running the Python tracer, so neither this call nor a mesh change via
    ``make_mesh`` (which flips the "auto" answer) affects it. Call this (or
    build the mesh) before the first depthwise-containing step traces; to
    re-lower an existing function, build a fresh step (new Python callable).

    The flip is process-wide and sticky: callers that force an impl for a
    phase (fsdp/multiseed sharding do) should capture the returned previous
    value and restore it when the phase ends, or later unrelated work silently
    inherits the forced lowering."""
    global _DEPTHWISE_IMPL
    if impl not in ("conv", "fma", "auto"):
        raise ValueError(f"unknown depthwise impl {impl!r} (use 'conv', 'fma' or 'auto')")
    prev = _DEPTHWISE_IMPL
    _DEPTHWISE_IMPL = impl
    return prev


def _resolve_depthwise_impl(impl: Optional[str]) -> str:
    impl = impl or _DEPTHWISE_IMPL
    if impl in ("conv", "fma"):
        return impl
    if impl != "auto":
        # mirror set_depthwise_impl's validation: a typo'd explicit impl must
        # error, not silently fall through to one of the lowerings
        raise ValueError(f"unknown depthwise impl {impl!r} (use 'conv', 'fma' or 'auto')")
    from blvm_tpu.parallel import mesh as _mesh_mod

    mesh = _mesh_mod._MESH  # None (no mesh yet) counts as single-device
    if mesh is None or sum(s > 1 for s in mesh.shape.values()) <= 1:
        return "conv"
    return "fma"


def depthwise_conv1d(
    x,
    kernel,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    dilation: int = 1,
    impl: Optional[str] = None,
):
    """Depthwise 1-D conv, channels-last (correlation, NWC/WIO semantics —
    identical to ``jax.lax.conv_general_dilated(..., feature_group_count=C)``).

    ``impl`` picks the lowering (default: the process setting, see
    :func:`set_depthwise_impl`): "conv" = XLA grouped conv (fastest on this
    backend), "fma" = ``k`` shifted elementwise FMAs (no ``feature_group_count``
    — immune to the jax 0.9.0 multi-axis-mesh grouped-conv gradient miscompile
    pinned in ``tests/modules/test_depthwise_spmd.py``; a depthwise conv never
    contracts channels, so it never uses the MXU either way).

    ``x``: (B, T, C); ``kernel``: (k, 1, C) (the grouped-conv layout, kept for
    checkpoint compatibility); VALID output length after ``padding``.
    """
    if _resolve_depthwise_impl(impl) == "conv":
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride,),
            padding=[tuple(padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=x.shape[-1],
        )
    k = kernel.shape[0]
    if padding[0] or padding[1]:
        x = jnp.pad(x, ((0, 0), tuple(padding), (0, 0)))
    span = dilation * (k - 1)
    out_len = (x.shape[1] - span - 1) // stride + 1
    y = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(x, j * dilation, j * dilation + (out_len - 1) * stride + 1, axis=1)
        if stride > 1:
            xs = xs[:, ::stride]
        term = xs * kernel[j, 0]
        y = term if y is None else y + term
    return y


def depthwise_conv_transpose1d(
    x, kernel, stride: int = 1, padding: int = 0, dilation: int = 1, impl: Optional[str] = None
):
    """Depthwise ConvTranspose1d (exact torch geometry
    ``out = (T-1)·s − 2p + d·(k−1) + 1``). Lowering per ``impl`` /
    :func:`set_depthwise_impl`: "conv" = grouped ``lhs_dilation`` conv, "fma" =
    zero-stuffing + :func:`depthwise_conv1d` (flip kernel, full padding)."""
    full = dilation * (kernel.shape[0] - 1)
    if _resolve_depthwise_impl(impl) == "conv":
        return jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(full - padding, full - padding)],
            lhs_dilation=(stride,),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=x.shape[-1],
        )
    B, T, C = x.shape
    if stride > 1:
        # zero-stuff between frames: (B, T, C) -> (B, (T-1)*s + 1, C)
        x = jnp.pad(x[:, :, None, :], ((0, 0), (0, 0), (0, stride - 1), (0, 0)))
        x = x.reshape(B, T * stride, C)[:, : (T - 1) * stride + 1]
    return depthwise_conv1d(
        x,
        jnp.flip(kernel, axis=0),
        stride=1,
        padding=(full - padding, full - padding),
        dilation=dilation,
        impl="fma",
    )

# torch Conv1d default init: kaiming-uniform(a=sqrt(5)) == uniform with
# variance scale 1/3 over fan_in
_conv_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _depthwise_bias_init(k: int):
    # torch bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); depthwise fan_in = k
    bound = 1.0 / float(k) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvDepthwiseSeparable1d(nn.Module):
    """Depthwise (k, stride, dilation, groups=C) → act → [norm] → pointwise 1×1."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_norm: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        effective_k = self.dilation * (self.kernel_size - 1) + 1
        if x.shape[1] + 2 * self.padding < effective_k:
            # torch raises here; XLA would silently return a zero-length axis
            raise ValueError(
                f"Input length {x.shape[1]} (+2*{self.padding} padding) is shorter than the "
                f"effective kernel size {effective_k}"
            )
        kernel = self.param("depthwise_kernel", _conv_kernel_init, (self.kernel_size, 1, C))
        bias = self.param("depthwise_bias", _depthwise_bias_init(self.kernel_size), (C,))
        y = depthwise_conv1d(
            x, kernel, stride=self.stride, padding=(self.padding, self.padding), dilation=self.dilation
        )
        y = self.activation(y + bias)
        if self.use_norm:
            y = nn.GroupNorm(num_groups=C, epsilon=1e-5)(y)
        pw = self.param("pointwise_kernel", _conv_kernel_init, (C, self.out_channels))
        return jnp.dot(y, pw)


class ConvTransposeDepthwiseSeparable1d(nn.Module):
    """Transposed depthwise (input-dilated) → act → [norm] → pointwise 1×1."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_norm: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("depthwise_kernel", _conv_kernel_init, (self.kernel_size, 1, C))
        bias = self.param("depthwise_bias", _depthwise_bias_init(self.kernel_size), (C,))
        y = depthwise_conv_transpose1d(
            x, kernel, stride=self.stride, padding=self.padding, dilation=self.dilation
        )
        y = self.activation(y + bias)
        if self.use_norm:
            y = nn.GroupNorm(num_groups=C, epsilon=1e-5)(y)
        pw = self.param("pointwise_kernel", _conv_kernel_init, (C, self.out_channels))
        return jnp.dot(y, pw)
