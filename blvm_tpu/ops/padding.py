"""Padding calculus for strided/dilated conv stacks.

Rebuild of reference ``blvm/utils/padding.py``: pure-integer padding arithmetic
(used at trace time — all shapes static under XLA) plus jnp padding appliers.
"""

from typing import Tuple

import jax.numpy as jnp


def split_padding_sym_asym(padding: int) -> Tuple[int, int]:
    """Symmetric and asymmetric parts of a total padding amount."""
    sym = padding // 2
    asym = padding - 2 * sym
    return sym, asym


def split_padding_left_right(padding: int, side: str = "both") -> Tuple[int, int]:
    """Split total padding into (left, right) according to ``side``.

    Matches reference semantics (``padding.py:23-33``) including the quirk that
    for ``side='both'`` the split is ``(sym // 2, sym // 2 + asym)`` where
    ``sym = padding // 2`` — i.e. symmetric halves of the even part with the
    odd remainder on the right.
    """
    if side == "left":
        return padding, 0
    elif side == "right":
        return 0, padding
    elif side == "both":
        sym, asym = split_padding_sym_asym(padding)
        return sym // 2, sym // 2 + asym
    raise ValueError(f"Unknown side `{side=}`. Valid options are `left`, `right` and `both`")


def get_length_padding(actual_length: int, minimum_length: int) -> int:
    return max(minimum_length - actual_length, 0)


def get_modulo_padding(
    length: int, stride: int, kernel_size: int = 0, dilation: int = 1, pad_to_kernel_size: bool = False
) -> int:
    """Padding ``p`` such that ``(length + p - kernel_size) mod stride == 0``."""
    if dilation > 1:
        raise NotImplementedError(f"Dilation greater than 1 not yet supported but got {dilation=}.")

    if length < kernel_size:
        if pad_to_kernel_size:
            return kernel_size - length
        raise ValueError(f"Input {length=} was shorter than {kernel_size=} and {pad_to_kernel_size=}.")

    missing = (length - kernel_size) % stride
    return stride - missing if missing else 0


def get_modulo_length(length: int, stride: int, kernel_size: int = 0) -> int:
    """Smallest length >= ``length`` that is wholly strideable given kernel."""
    return length + get_modulo_padding(length, stride, kernel_size)


def get_same_padding(length: int, stride: int, kernel_size: int, dilation: int = 1) -> int:
    """TF-style "same" padding: output length becomes ``ceil(length / stride)``.

    ``max(0, d(k-1) - (length-1) % s)`` — reference ``padding.py:100-117``.
    """
    return max(0, dilation * (kernel_size - 1) - (length - 1) % stride)


def get_same_padding_transposed(kernel_size: int, stride: int, dilation: int = 1) -> int:
    """Padding (possibly negative = cropping) for a transposed conv to invert
    "same" geometry: ``d(k-1) + 1 - s`` (reference ``padding.py:120-121``)."""
    return dilation * (kernel_size - 1) + 1 - stride


def pad_axis(x, pad_left: int = 0, pad_right: int = 0, axis: int = 1, value: float = 0.0):
    """Pad (or crop, for negative amounts) a single axis of ``x``."""
    axis = axis if axis >= 0 else x.ndim + axis
    if pad_left < 0:
        x = jnp.take(x, jnp.arange(-pad_left, x.shape[axis]), axis=axis)
        pad_left = 0
    if pad_right < 0:
        x = jnp.take(x, jnp.arange(0, x.shape[axis] + pad_right), axis=axis)
        pad_right = 0
    if pad_left == 0 and pad_right == 0:
        return x
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (pad_left, pad_right)
    return jnp.pad(x, pad_width, constant_values=value)


def pad_to_length(x, length: int, pad_side: str = "right", axis: int = 1):
    """Pad ``x`` along ``axis`` to at least ``length``."""
    p = get_length_padding(x.shape[axis], length)
    if not p:
        return x
    left, right = split_padding_left_right(p, pad_side)
    return pad_axis(x, left, right, axis=axis)


def pad_modulo(x, stride: int, kernel_size: int = 0, dilation: int = 1, pad_to_kernel_size: bool = False, pad_side: str = "left", axis: int = 1):
    """Pad ``x`` so ``(length + p - kernel_size) mod stride == 0``."""
    p = get_modulo_padding(x.shape[axis], stride, kernel_size, dilation, pad_to_kernel_size)
    left, right = split_padding_left_right(p, pad_side)
    return pad_axis(x, left, right, axis=axis)


def pad_same(x, stride: int, kernel_size: int = 0, dilation: int = 1, pad_side: str = "left", axis: int = 1):
    """Pad ``x`` so a conv yields ``ceil(length / stride)`` outputs."""
    p = get_same_padding(x.shape[axis], stride, kernel_size, dilation)
    left, right = split_padding_left_right(p, pad_side)
    return pad_axis(x, left, right, axis=axis)
