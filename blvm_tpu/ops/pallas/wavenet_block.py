"""Pallas TPU kernel: fused WaveNet residual-GLU block.

The reference's hot block (``blvm/models/wavenet/wavenet_modules.py:53-117``)
is dilated-conv(k=2) → gated tanh → 1×1 → residual add. Under plain XLA each
stage writes its (B, T, 2C) gate intermediate to HBM; this kernel keeps the
whole chain in VMEM for a time tile:

    pre  = x[t-d] @ Wg0 + x[t] @ Wg1 + bg        (two MXU matmuls, k=2 taps)
    act  = tanh(pre[:, :C]) * sigmoid(pre[:, C:]) (VPU)
    rs   = act @ W1 + b1                          (MXU)
    out  = (rs[:, :C] + x[t]) * sqrt(0.5),  skip = rs[:, C:]

The dilated pair of taps is fed as two pre-shifted views of x (``x[:, :-d]``
and ``x[:, d:]``) so both use plain non-overlapping time tiling; the grid runs
over (batch, time tiles).

Training uses :func:`fused_residual_glu` with a custom VJP whose backward
recomputes through the pure-jnp reference (rematerialisation: forward-speed
win without a hand-written backward kernel).

Measured on v5e (B=8, T=16k, C=96, d=64): bit-exact vs XLA, but 2.18 ms vs
XLA's 1.25 ms — XLA already fuses gate+1×1 into the conv here and the kernel
pays a double input read (the two dilation-shifted views materialize). The
winning design is fusing a whole 10-layer stack with halo tiles so the
residual stream stays in VMEM across layers; until that lands this kernel
stays opt-in (``use_pallas=False`` by default).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only extras; CPU tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

INV_STD = math.sqrt(0.5)


def fused_residual_glu_reference(x, wg, bg, w1, b1, dilation: int):
    """Pure-jnp equivalent (also the VJP recompute path).

    Args:
        x:  (B, T, C) input; the first ``dilation`` frames are left context.
        wg: (2, C, 2C) gate conv taps (tap 0 = t−dilation, tap 1 = t).
        bg: (2C,); w1: (C, C + Cs); b1: (C + Cs,).

    Returns ``(out (B, T', C), skip (B, T', Cs))`` with ``T' = T − dilation``.
    """
    C = x.shape[-1]
    x_old = x[:, : x.shape[1] - dilation]
    x_new = x[:, dilation:]
    pre = x_old @ wg[0] + x_new @ wg[1] + bg
    act = jnp.tanh(pre[..., :C]) * jax.nn.sigmoid(pre[..., C:])
    rs = act @ w1 + b1
    out = (rs[..., :C] + x_new) * INV_STD
    skip = rs[..., C:]
    return out, skip


def _kernel(x_old_ref, x_new_ref, wg_ref, bg_ref, w1_ref, b1_ref, out_ref, skip_ref, *, C: int):
    x_old = x_old_ref[0]
    x_new = x_new_ref[0]

    pre = (
        jnp.dot(x_old, wg_ref[0], preferred_element_type=jnp.float32)
        + jnp.dot(x_new, wg_ref[1], preferred_element_type=jnp.float32)
        + bg_ref[:]
    )
    act = jnp.tanh(pre[:, :C]) * jax.nn.sigmoid(pre[:, C:])
    rs = jnp.dot(act, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    out_ref[0] = ((rs[:, :C] + x_new) * INV_STD).astype(out_ref.dtype)
    skip_ref[0] = rs[:, C:].astype(skip_ref.dtype)


def _pick_tile(T_out: int, t_tile: int) -> int:
    t = min(t_tile, T_out)
    if T_out % t != 0:
        t = math.gcd(T_out, t)
    return t


def _forward_kernel(x, wg, bg, w1, b1, dilation: int, t_tile: int, interpret: bool):
    B, T, C = x.shape
    T_out = T - dilation
    Cs = w1.shape[-1] - C
    t = _pick_tile(T_out, t_tile)
    grid = (B, T_out // t)

    vmem = {} if (not _HAS_PLTPU or interpret) else dict(memory_space=pltpu.VMEM)

    x_old = x[:, :T_out]
    x_new = x[:, dilation:]

    out, skip = pl.pallas_call(
        partial(_kernel, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, C), lambda b, i: (b, i, 0), **vmem),
            pl.BlockSpec((1, t, C), lambda b, i: (b, i, 0), **vmem),
            pl.BlockSpec((2, C, 2 * C), lambda b, i: (0, 0, 0), **vmem),
            pl.BlockSpec((2 * C,), lambda b, i: (0,), **vmem),
            pl.BlockSpec((C, C + Cs), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((C + Cs,), lambda b, i: (0,), **vmem),
        ],
        out_specs=(
            pl.BlockSpec((1, t, C), lambda b, i: (b, i, 0), **vmem),
            pl.BlockSpec((1, t, Cs), lambda b, i: (b, i, 0), **vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_out, C), x.dtype),
            jax.ShapeDtypeStruct((B, T_out, Cs), x.dtype),
        ),
        interpret=interpret,
    )(x_old, x_new, wg, bg, w1, b1)
    return out, skip


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_residual_glu(x, wg, bg, w1, b1, dilation: int = 1, t_tile: int = 512, interpret: bool = False):
    """Fused residual-GLU block; differentiable (backward recomputes through
    the jnp reference)."""
    return _fwd_impl(x, wg, bg, w1, b1, dilation, t_tile, interpret)


def _fwd_impl(x, wg, bg, w1, b1, dilation, t_tile, interpret):
    T_out = x.shape[1] - dilation
    if T_out <= 0 or x.shape[-1] % 8 != 0:
        return fused_residual_glu_reference(x, wg, bg, w1, b1, dilation)
    return _forward_kernel(x, wg, bg, w1, b1, dilation, t_tile, interpret)


def _fwd(x, wg, bg, w1, b1, dilation, t_tile, interpret):
    return _fwd_impl(x, wg, bg, w1, b1, dilation, t_tile, interpret), (x, wg, bg, w1, b1)


def _bwd(dilation, t_tile, interpret, residuals, cotangents):
    x, wg, bg, w1, b1 = residuals
    _, vjp = jax.vjp(lambda *a: fused_residual_glu_reference(*a, dilation=dilation), x, wg, bg, w1, b1)
    return vjp(cotangents)


fused_residual_glu.defvjp(_fwd, _bwd)
