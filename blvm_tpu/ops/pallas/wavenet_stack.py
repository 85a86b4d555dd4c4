"""Pallas TPU kernel: fused multi-layer WaveNet stack.

The single-block kernel (``wavenet_block.py``) loses to XLA because each block
round-trips the residual stream through HBM. This kernel fuses an ENTIRE stack
(e.g. 10 dilated residual-GLU layers, dilations 1,2,4,...,512): one halo'd
time tile of the residual stream is DMA'd into VMEM once, all layers run in
VMEM (50 MXU matmuls per tile), and only the final residual tile and the
summed skip tile are written back. HBM traffic drops from ~2·L·T·C to ~3·T·C
per stack at the cost of ``halo/t_tile`` redundant compute (halo = stack RF−1).

Mosaic alignment: channels are padded to the 128-lane width and the gate is
computed as two separate (tanh, sigmoid) matmuls so no split ever crosses the
padding; padded lanes stay exactly zero through every layer (zero weights →
tanh(0)·σ(0) = 0 → zero residual).

Contract (matches ``ResidualStack`` with ``skip_channels == res_channels``):
    x: (B, T_out + halo, C) — halo = Σ dilations of left context (the model's
       receptive-field padding provides it).
    WG (L, 2, C, 2C), BG (L, 2C), W1 (L, C, 2C), B1 (L, 2C) — stacked layer
       weights; the 2C axes are [tanh | sigmoid] and [residual | skip].
Returns ``(res_out (B, T_out, C), skip_sum (B, T_out, C))`` — Σ_l skip_l (the
model scales by variance_scale and feeds the head); per-layer ``z`` probe
outputs are not produced — use the unfused path when dumping representations.

Backward: custom VJP recomputing through the jnp reference (rematerialised).

STATUS: EXPERIMENTAL. Interpret-mode (CPU) tests pass bit-exactly including
gradients and module parity, but on the v5e axon backend the compiled kernel
currently hangs the device at launch (manual HBM→VMEM DMA path under a 2-D
grid) — do not enable on hardware until the DMA handshake is debugged with an
incremental on-device harness. The validated on-device Pallas path is the
single-block kernel in ``wavenet_block.py``.
"""

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

INV_STD = math.sqrt(0.5)
LANE = 128


def fused_residual_stack_reference(x, WG, BG, W1, B1, dilations: Tuple[int, ...]):
    """Pure-jnp equivalent: returns (res_out, skip_sum)."""
    C = x.shape[-1]
    halo = sum(dilations)
    T_out = x.shape[1] - halo

    h = x
    skip_sum = jnp.zeros((x.shape[0], T_out, C), x.dtype)
    for l, d in enumerate(dilations):
        h_old = h[:, : h.shape[1] - d]
        h_new = h[:, d:]
        pre = h_old @ WG[l, 0] + h_new @ WG[l, 1] + BG[l]
        act = jnp.tanh(pre[..., :C]) * jax.nn.sigmoid(pre[..., C:])
        rs = act @ W1[l] + B1[l]
        h = (rs[..., :C] + h_new) * INV_STD
        skip_sum = skip_sum + rs[:, -T_out:, C:]
    return h, skip_sum


def _stack_kernel(
    x_ref, wga_ref, wgb_ref, bga_ref, bgb_ref, w1r_ref, w1s_ref, b1r_ref, b1s_ref,
    res_ref, skip_ref, h_scratch, sem, *, dilations, t_tile, halo,
):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # one DMA of the halo'd residual-stream window into VMEM
    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * t_tile, t_tile + halo), :],
        h_scratch,
        sem,
    )
    dma.start()
    dma.wait()

    h = h_scratch[:]  # (t_tile + halo, Cp) — functional from here on
    skip_sum = jnp.zeros((t_tile, h.shape[-1]), jnp.float32)

    cur_len = t_tile + halo
    for l, d in enumerate(dilations):
        out_len = cur_len - d
        h_old = h[:out_len]
        h_new = h[d:cur_len]
        pre_a = (
            jnp.dot(h_old, wga_ref[l, 0], preferred_element_type=jnp.float32)
            + jnp.dot(h_new, wga_ref[l, 1], preferred_element_type=jnp.float32)
            + bga_ref[l]
        )
        pre_b = (
            jnp.dot(h_old, wgb_ref[l, 0], preferred_element_type=jnp.float32)
            + jnp.dot(h_new, wgb_ref[l, 1], preferred_element_type=jnp.float32)
            + bgb_ref[l]
        )
        act = jnp.tanh(pre_a) * jax.nn.sigmoid(pre_b)
        r = jnp.dot(act, w1r_ref[l], preferred_element_type=jnp.float32) + b1r_ref[l]
        s = jnp.dot(act, w1s_ref[l], preferred_element_type=jnp.float32) + b1s_ref[l]
        h = (r + h_new) * INV_STD
        skip_sum = skip_sum + s[out_len - t_tile : out_len]
        cur_len = out_len

    res_ref[0] = h[:t_tile].astype(res_ref.dtype)
    skip_ref[0] = skip_sum.astype(skip_ref.dtype)


def _pad_lane(a, axis):
    pad = (-a.shape[axis]) % LANE
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _forward_kernel(x, WG, BG, W1, B1, dilations, t_tile: int, interpret: bool):
    B, T_in, C = x.shape
    halo = sum(dilations)
    T_out = T_in - halo
    L = WG.shape[0]
    Cp = -(-C // LANE) * LANE

    t = min(t_tile, T_out)
    if T_out % t != 0:
        t = math.gcd(T_out, t)
    grid = (B, T_out // t)

    # channel-pad x; split gate/output weights into lane-aligned halves
    xp = _pad_lane(x, 2)
    wga = _pad_lane(_pad_lane(WG[:, :, :, :C], 3), 2)  # tanh branch (L,2,Cp,Cp)
    wgb = _pad_lane(_pad_lane(WG[:, :, :, C:], 3), 2)  # sigmoid branch
    bga = _pad_lane(BG[:, :C], 1)
    bgb = _pad_lane(BG[:, C:], 1)
    w1r = _pad_lane(_pad_lane(W1[:, :, :C], 2), 1)
    w1s = _pad_lane(_pad_lane(W1[:, :, C:], 2), 1)
    b1r = _pad_lane(B1[:, :C], 1)
    b1s = _pad_lane(B1[:, C:], 1)

    vmem = {} if (not _HAS_PLTPU or interpret) else dict(memory_space=pltpu.VMEM)

    res, skip = pl.pallas_call(
        partial(_stack_kernel, dilations=tuple(dilations), t_tile=t, halo=halo),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((L, 2, Cp, Cp), lambda b, i: (0, 0, 0, 0), **vmem),
            pl.BlockSpec((L, 2, Cp, Cp), lambda b, i: (0, 0, 0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((L, Cp, Cp), lambda b, i: (0, 0, 0), **vmem),
            pl.BlockSpec((L, Cp, Cp), lambda b, i: (0, 0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
        ],
        out_specs=(
            pl.BlockSpec((1, t, Cp), lambda b, i: (b, i, 0), **vmem),
            pl.BlockSpec((1, t, Cp), lambda b, i: (b, i, 0), **vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_out, Cp), x.dtype),
            jax.ShapeDtypeStruct((B, T_out, Cp), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((t + halo, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wga, wgb, bga, bgb, w1r, w1s, b1r, b1s)
    return res[..., :C], skip[..., :C]


def _windowed_kernel(
    xw_ref, wga_ref, wgb_ref, bga_ref, bgb_ref, w1r_ref, w1s_ref, b1r_ref, b1s_ref,
    res_ref, skip_ref, *, dilations, t_tile, halo,
):
    """DMA-free variant: the caller pre-gathers halo'd windows, so the input
    block is a plain (1, 1, t+halo, Cp) VMEM tile."""
    h = xw_ref[0, 0]  # (t_tile + halo, Cp)
    skip_sum = jnp.zeros((t_tile, h.shape[-1]), jnp.float32)

    cur_len = t_tile + halo
    for l, d in enumerate(dilations):
        out_len = cur_len - d
        h_old = h[:out_len]
        h_new = h[d:cur_len]
        pre_a = (
            jnp.dot(h_old, wga_ref[l, 0], preferred_element_type=jnp.float32)
            + jnp.dot(h_new, wga_ref[l, 1], preferred_element_type=jnp.float32)
            + bga_ref[l]
        )
        pre_b = (
            jnp.dot(h_old, wgb_ref[l, 0], preferred_element_type=jnp.float32)
            + jnp.dot(h_new, wgb_ref[l, 1], preferred_element_type=jnp.float32)
            + bgb_ref[l]
        )
        act = jnp.tanh(pre_a) * jax.nn.sigmoid(pre_b)
        r = jnp.dot(act, w1r_ref[l], preferred_element_type=jnp.float32) + b1r_ref[l]
        s = jnp.dot(act, w1s_ref[l], preferred_element_type=jnp.float32) + b1s_ref[l]
        h = (r + h_new) * INV_STD
        skip_sum = skip_sum + s[out_len - t_tile : out_len]
        cur_len = out_len

    res_ref[0] = h[:t_tile].astype(res_ref.dtype)
    skip_ref[0] = skip_sum.astype(skip_ref.dtype)


def _forward_windowed(x, WG, BG, W1, B1, dilations, t_tile: int, interpret: bool):
    """Pre-gather overlapping windows outside the kernel (≈1.5× input reads but
    no manual DMA — the path that wedges the axon backend)."""
    B, T_in, C = x.shape
    halo = sum(dilations)
    T_out = T_in - halo
    L = WG.shape[0]
    Cp = -(-C // LANE) * LANE

    t = min(t_tile, T_out)
    if T_out % t != 0:
        t = math.gcd(T_out, t)
    n_tiles = T_out // t
    grid = (B, n_tiles)

    xp = _pad_lane(x, 2)
    # (B, n_tiles, t + halo, Cp) halo'd windows
    xw = jnp.stack([xp[:, i * t : i * t + t + halo] for i in range(n_tiles)], axis=1)

    wga = _pad_lane(_pad_lane(WG[:, :, :, :C], 3), 2)
    wgb = _pad_lane(_pad_lane(WG[:, :, :, C:], 3), 2)
    bga = _pad_lane(BG[:, :C], 1)
    bgb = _pad_lane(BG[:, C:], 1)
    w1r = _pad_lane(_pad_lane(W1[:, :, :C], 2), 1)
    w1s = _pad_lane(_pad_lane(W1[:, :, C:], 2), 1)
    b1r = _pad_lane(B1[:, :C], 1)
    b1s = _pad_lane(B1[:, C:], 1)

    vmem = {} if (not _HAS_PLTPU or interpret) else dict(memory_space=pltpu.VMEM)

    res, skip = pl.pallas_call(
        partial(_windowed_kernel, dilations=tuple(dilations), t_tile=t, halo=halo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t + halo, Cp), lambda b, i: (b, i, 0, 0), **vmem),
            pl.BlockSpec((L, 2, Cp, Cp), lambda b, i: (0, 0, 0, 0), **vmem),
            pl.BlockSpec((L, 2, Cp, Cp), lambda b, i: (0, 0, 0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((L, Cp, Cp), lambda b, i: (0, 0, 0), **vmem),
            pl.BlockSpec((L, Cp, Cp), lambda b, i: (0, 0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
            pl.BlockSpec((L, Cp), lambda b, i: (0, 0), **vmem),
        ],
        out_specs=(
            pl.BlockSpec((1, t, Cp), lambda b, i: (b, i, 0), **vmem),
            pl.BlockSpec((1, t, Cp), lambda b, i: (b, i, 0), **vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_out, Cp), x.dtype),
            jax.ShapeDtypeStruct((B, T_out, Cp), x.dtype),
        ),
        interpret=interpret,
    )(xw, wga, wgb, bga, bgb, w1r, w1s, b1r, b1s)
    return res[..., :C], skip[..., :C]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_residual_stack(
    x, WG, BG, W1, B1, dilations: Tuple[int, ...], t_tile: int = 2048, interpret: bool = False, mode: str = "windowed"
):
    """Fused multi-layer stack; differentiable (backward recomputes via jnp).

    ``mode='windowed'`` (default) pre-gathers halo windows (no manual DMA);
    ``mode='dma'`` is the lower-traffic manual-DMA variant (hangs on axon)."""
    return _fwd_impl(x, WG, BG, W1, B1, dilations, t_tile, interpret, mode)


def _fwd_impl(x, WG, BG, W1, B1, dilations, t_tile, interpret, mode="windowed"):
    halo = sum(dilations)
    if x.shape[1] - halo <= 0:
        return fused_residual_stack_reference(x, WG, BG, W1, B1, dilations)
    if mode == "dma":
        return _forward_kernel(x, WG, BG, W1, B1, dilations, t_tile, interpret)
    return _forward_windowed(x, WG, BG, W1, B1, dilations, t_tile, interpret)


def _fwd(x, WG, BG, W1, B1, dilations, t_tile, interpret, mode):
    return _fwd_impl(x, WG, BG, W1, B1, dilations, t_tile, interpret, mode), (x, WG, BG, W1, B1)


def _bwd(dilations, t_tile, interpret, mode, residuals, cotangents):
    x, WG, BG, W1, B1 = residuals
    _, vjp = jax.vjp(lambda *a: fused_residual_stack_reference(*a, dilations=dilations), x, WG, BG, W1, B1)
    return vjp(cotangents)


fused_residual_stack.defvjp(_fwd, _bwd)
