"""Sequence tensor operations: masking, frame (de)stacking, reversal, chunking.

Rebuild of reference ``blvm/utils/operations.py`` for JAX with batch-first
``(B, T, *)`` layout throughout (the reference mixes (T, B) and (B, T); a single
layout keeps shardings and scan transposes simple on TPU).

``split_sequence`` exists in two forms:
  * :func:`split_sequence` — host-side, returns Python lists of chunks with
    per-chunk lengths and active masks (mirrors the reference eval chunking,
    ``operations.py:122-197``, but never drops rows — batch shape stays static
    so every chunk hits the same compiled executable).
  * :func:`split_sequence_static` — device-side, returns a stacked
    ``(n_chunks, B, chunk_len, *)`` array suitable for an outer ``lax.scan``
    over chunks with carried model state (the TPU-ism: chunked long-sequence
    processing without recompilation).
"""

import math
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def sequence_mask(
    seq_lens,
    max_len: Optional[int] = None,
    stride: int = 1,
    dtype=jnp.bool_,
):
    """Binary mask ``(B, T)``: 1 where ``t < ceil(seq_len / stride)``... entries up
    to the sequence length are 1, the rest 0 (reference ``operations.py:90-119``).

    ``max_len`` must be static under jit; outside jit it defaults to
    ``ceil(max(seq_lens) / stride)``.
    """
    seq_lens = jnp.asarray(seq_lens)
    if max_len is None:
        max_len = int(math.ceil(int(jnp.max(seq_lens)) / stride))
    t = jnp.arange(max_len)
    if stride != 1:
        lens = jnp.ceil(seq_lens / stride)
    else:
        lens = seq_lens
    mask = t[None, :] < lens[:, None]
    return mask.astype(dtype)


def stack_tensor(x, stack_size: int, axis: int = -1) -> Tuple[jnp.ndarray, int]:
    """Split ``axis`` into frames of ``stack_size`` with a new trailing stack dim.

    ``(..., D, ...) -> (..., D/S, ..., S)`` with right zero-padding to a multiple
    of ``stack_size``; returns ``(stacked, padding)`` (reference ``operations.py:14-32``).
    """
    if abs(axis) > x.ndim:
        raise ValueError(f"Got {axis=} which is out of range for x with shape {x.shape}")
    axis = axis if axis >= 0 else x.ndim + axis

    padding = (-x.shape[axis]) % stack_size
    if padding:
        pad_width = [(0, 0)] * x.ndim
        pad_width[axis] = (0, padding)
        x = jnp.pad(x, pad_width)

    new_shape = [x.shape[i] if i != axis else x.shape[i] // stack_size for i in range(x.ndim)]
    new_shape.append(stack_size)
    # reshape splits `axis` into (n_stacks, stack_size); move stack_size to the end
    split_shape = list(x.shape)
    split_shape[axis : axis + 1] = [x.shape[axis] // stack_size, stack_size]
    x = x.reshape(split_shape)
    x = jnp.moveaxis(x, axis + 1, -1)
    return x, padding


def unstack_tensor(x, stack_size: int, padding: int = 0, axis: int = -1):
    """Inverse of :func:`stack_tensor`: collapse the trailing stack dim back into
    the axis preceding it and strip any right padding.

    The reference collapses the stack dim (last) into ``axis - 1``
    (``operations.py:35-53``); here the stack dim is always last and collapses
    into ``axis`` interpreted on the *output* array.
    """
    if abs(axis) > x.ndim - 1:
        raise ValueError(f"Got {axis=} which is out of range for x with shape {x.shape}")
    out_ndim = x.ndim - 1
    axis = axis if axis >= 0 else out_ndim + axis

    x = jnp.moveaxis(x, -1, axis + 1)
    new_shape = list(x.shape)
    new_shape[axis : axis + 2] = [x.shape[axis] * stack_size]
    x = x.reshape(new_shape)

    if padding:
        x = jnp.take(x, jnp.arange(x.shape[axis] - padding), axis=axis)
    return x


def reverse_sequences(x, x_sl, max_len: Optional[int] = None):
    """Reverse each sequence along time keeping right padding in place.

    Batch-first: ``x`` is ``(B, T, *)``, ``x_sl`` is ``(B,)``. Positions beyond
    the sequence length keep their original (padding) values (reference
    ``operations.py:56-87``, re-derived for batch-first gather).
    """
    x = jnp.asarray(x)
    T = x.shape[1] if max_len is None else max_len
    x_sl = jnp.asarray(x_sl)
    t = jnp.arange(T)[None, :]  # (1, T)
    rev = x_sl[:, None] - 1 - t  # (B, T): reversed index within the sequence
    idx = jnp.where(rev >= 0, rev, t)  # padding positions map to themselves
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, x.shape[:2] + x.shape[2:]), axis=1)


def _chunk_geometry(T: int, length: int, overlap: int, mode: str):
    """Start/stop indices of each chunk for the two chunking modes.

    consume: chunk len = length, overlap consumes from new values (reference
    ``operations.py:161-166``). extend: chunk len = length + overlap, always
    ``length`` new values (``operations.py:167-170``).
    """
    if mode == "consume":
        if overlap >= length:
            raise ValueError("`split_sequence` does not support `overlap >= length` in `consume` mode")
        n = math.ceil(T / (length - overlap))
        starts = [i * (length - overlap) for i in range(n)]
        stops = [s + length for s in starts]
    elif mode == "extend":
        n = math.ceil(T / length)
        starts = [max(i * length - overlap, 0) for i in range(n)]
        stops = [(i + 1) * length for i in range(n)]
    else:
        raise ValueError(f"Unknown mode `{mode}`. Recognized options are `consume` and `extend`.")
    return starts, stops


def split_lengths(x_sl: np.ndarray, starts, stops):
    """Per-chunk sequence lengths: the chunk's full data length while the
    example is still active, the remainder in the FIRST chunk that reaches its
    end, 0 after.

    The active length is ``stop - start`` — the data the chunk actually holds.
    In consume mode that equals ``length``; in extend mode it is ``length``
    for chunk 0 and ``length + overlap`` for later chunks, so a model that
    subtracts its receptive-field overlap from the chunk lengths scores
    exactly ``length`` new frames per chunk (the reference instead reported
    ``length`` regardless of mode — operations.py:188 — which makes its own
    extend path score 0 frames per middle chunk; bug fixed, not ported).

    An example only counts as active in chunk ``i`` if it extends beyond chunk
    ``i-1``'s new-frame boundary (``x_sl > stops[i-1]``) — the static-shape
    equivalent of the reference's ``drop_inactive=True`` row dropping
    (``operations.py:179-190``). Without this gate, an example ending inside
    chunk ``i-1`` would have its tail frames (which fall in the overlap region
    of chunk ``i``) evaluated AGAIN in chunk ``i``.
    """
    x_sl = np.asarray(x_sl)
    out = []
    prev_stop = 0
    for start, stop in zip(starts, stops):
        entered = x_sl > prev_stop  # has frames this chunk hasn't seen
        active_next = x_sl > stop
        sl = np.where(active_next, stop - start, np.clip(x_sl - start, 0, None))
        out.append(np.where(entered, sl, 0))
        prev_stop = stop
    return out


def split_sequence(
    x,
    x_sl,
    length: int,
    overlap: int = 0,
    mode: str = "consume",
) -> Tuple[list, list]:
    """Host-side chunking of ``(B, T, *)`` into subsequences along T.

    Returns ``(chunks, chunk_lens)`` lists. Chunks keep the full batch (no row
    dropping — static shapes for XLA); examples that have ended have chunk
    length 0 and should be masked by the model via ``sequence_mask``. Trailing
    chunks where no example is active are omitted.

    In extend mode, chunks after the first whose overlap context is truncated
    by the sequence start (``i*length < overlap``) are LEFT-padded with zeros
    to the uniform ``length + overlap`` and the pad is counted in their
    lengths: the zero history is exactly what a receptive-field-padded full
    forward synthesizes for those positions, and a consumer subtracting its
    receptive field then scores exactly the chunk's new frames. Chunk 0 stays
    data-only (consumers rf-pad it themselves via their first-chunk path).
    """
    x = np.asarray(x)
    starts, stops = _chunk_geometry(x.shape[1], length, overlap, mode)
    lens = split_lengths(x_sl, starts, stops)

    chunks, chunk_lens = [], []
    for i, ((start, stop), sl) in enumerate(zip(zip(starts, stops), lens)):
        if not np.any(sl > 0):
            break
        chunk = x[:, start:stop]
        if chunk.shape[1] < stop - start:  # right-pad final short chunk to static length
            pad = [(0, 0)] * x.ndim
            pad[1] = (0, stop - start - chunk.shape[1])
            chunk = np.pad(chunk, pad)
        if mode == "extend" and i > 0 and stop - start < length + overlap:
            left = length + overlap - (stop - start)
            pad = [(0, 0)] * x.ndim
            pad[1] = (left, 0)
            chunk = np.pad(chunk, pad)
            sl = np.where(sl > 0, sl + left, 0)
        chunks.append(chunk)
        chunk_lens.append(sl)
    return chunks, chunk_lens


def split_sequence_static(x, x_sl, length: int, overlap: int = 0, mode: str = "consume"):
    """Device-side chunking to a stacked array for ``lax.scan`` over chunks.

    Returns ``(chunks, chunk_lens)`` with shapes ``(n_chunks, B, chunk_len, *)``
    and ``(n_chunks, B)``. ``n_chunks`` is derived from the static T so the
    result is jit-compatible; inactive trailing chunks have length 0.
    """
    x = jnp.asarray(x)
    B, T = x.shape[0], x.shape[1]
    starts, stops = _chunk_geometry(T, length, overlap, mode)

    pad_to = stops[-1]
    if pad_to > T:
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, pad_to - T)
        x = jnp.pad(x, pad)

    # uniform chunk length for the stacked scan form: extend-mode chunk 0 is
    # shorter than the rest, so LEFT-pad it with zeros — consumers must then
    # treat every chunk (incl. the first) as receptive-field-prefixed, i.e.
    # run with pad_receptive_field=False; the zero prefix supplies the empty
    # history and the per-chunk lengths below include it.
    chunk_len = max(stop - start for start, stop in zip(starts, stops))
    rows = []
    for start, stop in zip(starts, stops):
        row = x[:, start : start + (stop - start)]
        if stop - start < chunk_len:
            pad = [(0, 0)] * x.ndim
            pad[1] = (chunk_len - (stop - start), 0)
            row = jnp.pad(row, pad)
        rows.append(row)
    chunks = jnp.stack(rows)
    x_sl = jnp.asarray(x_sl)
    lens = []
    prev_stop = 0
    for start, stop in zip(starts, stops):
        # same entered-gate as split_lengths: no double-counting of tail
        # frames in overlap regions
        entered = x_sl > prev_stop
        active_next = x_sl > stop
        left_pad = chunk_len - (stop - start)
        sl = jnp.where(active_next, stop - start, jnp.clip(x_sl - start, 0)) + left_pad
        lens.append(jnp.where(entered, sl, 0))
        prev_stop = stop
    return chunks, jnp.stack(lens)


def update_running_variance(mean_a, weight_a, M2_a, mean_b=0, weight_b=0, M2_b=0):
    """Parallel Welford variance update (reference ``operations.py:200-242``).

    Returns ``(var, mean, weight, M2)``. Works on floats, numpy or jnp arrays.
    """
    weight = weight_a + weight_b
    delta = mean_b - mean_a
    M2 = M2_a + M2_b + delta**2 * (weight_a * weight_b / weight)
    var = M2 / (weight - 1)
    mean = (weight_a * mean_a + weight_b * mean_b) / weight
    return var, mean, weight, M2
