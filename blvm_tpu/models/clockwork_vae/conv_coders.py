"""Multi-level strided convolutional coders for the Clockwork-VAE.

Rebuild of reference ``blvm/models/clockwork_vae/convolutional_coders.py`` in
channels-last layout:
  * ``BlockSeparable``: 1×1 expand (×4) → act → per-channel GroupNorm →
    depthwise (k, stride, dilation) → act → GroupNorm → pointwise 1×1, wrapped
    in a temporal residual (nearest-resampled input when lengths differ).
  * ``ConvCoder1d``: levels of blocks whose strides factor each level's total
    stride into ``stride_per_block`` pieces; per-level in/out 1×1 projections;
    transposed variant flips block order and applies (possibly negative =
    cropping) padding after the blocks.

Transposed convs are expressed as input-dilated ``conv_general_dilated`` calls
(XLA's native form), exactly matching torch ``ConvTranspose1d`` geometry:
out_len = (T-1)*stride + d*(k-1) + 1.
"""

from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blvm_tpu.models.wavenet.modules import Conv1d, conv_kernel_init
from blvm_tpu.modules.convolutions import depthwise_conv1d, depthwise_conv_transpose1d
from blvm_tpu.ops.conv_arithmetic import compute_conv_attributes_single


def conv_transpose1d(x, kernel, stride: int, dilation: int = 1, feature_group_count: int = 1):
    """ConvTranspose1d via lhs-dilation: (B, T, Cin) @ (k, Cin/g, Cout).

    The depthwise case (``feature_group_count == C``) routes through
    ``modules/convolutions.py:depthwise_conv_transpose1d``, whose lowering is
    mesh-aware: the fast grouped form on single-device/single-axis meshes, the
    shift-mul form on multi-axis meshes where jax 0.9.0's SPMD partitioner
    miscompiles grouped-conv kernel gradients (pinned repro in
    ``tests/modules/test_depthwise_spmd.py``)."""
    if feature_group_count > 1 and feature_group_count == x.shape[-1]:
        return depthwise_conv_transpose1d(x, kernel, stride=stride, padding=0, dilation=dilation)
    k = kernel.shape[0]
    pad = dilation * (k - 1)
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=feature_group_count,
    )


class _DepthwiseSeparable(nn.Module):
    """Depthwise (k, stride, dilation) → act → GroupNorm → pointwise 1×1 (no bias).

    ``dtype`` is the compute dtype for the convs (params stay f32; GroupNorm
    statistics promote back to f32 — the standard mixed-precision policy).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    transposed: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        # depthwise kernel: (k, 1, C) with feature_group_count=C
        kernel = self.param("depthwise_kernel", conv_kernel_init, (self.kernel_size, 1, C))
        bias = self.param("depthwise_bias", nn.initializers.zeros, (C,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        if self.transposed:
            y = conv_transpose1d(x, kernel, self.stride, self.dilation, feature_group_count=C)
        else:
            # mesh-aware depthwise lowering (VALID) — see conv_transpose1d
            y = depthwise_conv1d(x, kernel, stride=self.stride, dilation=self.dilation)
        y = y + bias
        y = nn.relu(y)
        y = nn.GroupNorm(num_groups=C, epsilon=1e-5)(y)
        y = Conv1d(features=self.out_channels, kernel_size=1, use_bias=False, dtype=self.dtype)(y)
        return y


class TemporalResidual(nn.Module):
    """Residual add with nearest-neighbor temporal resampling on length mismatch.

    Nearest indices follow torch ``F.interpolate(mode="nearest")`` semantics —
    ``floor(i * T_in / T_out)`` — which differ from ``jax.image.resize``'s
    half-sample centering (reference ``convolutional_coders.py:15-26``).
    """

    @staticmethod
    def add(x, x_residual):
        if x_residual.shape[1] == x.shape[1]:
            return x_residual + x
        t_in, t_out = x.shape[1], x_residual.shape[1]
        # exact integer floor(i * t_in / t_out): float32 rounding of the
        # precomputed ratio can land one index low for non-power-of-two ratios
        idx = (jnp.arange(t_out) * t_in) // t_out
        return x_residual + jnp.take(x, idx, axis=1)


class BlockSeparable(nn.Module):
    channels_bottleneck: int
    kernel_size: int
    stride: int
    dilation: int
    transposed: bool
    channels_factor: int = 4
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        channels_block = self.channels_factor * self.channels_bottleneck
        y = Conv1d(features=channels_block, kernel_size=1, use_bias=self.use_bias, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.GroupNorm(num_groups=channels_block, epsilon=1e-5)(y)
        y = _DepthwiseSeparable(
            out_channels=self.channels_bottleneck,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            transposed=self.transposed,
            dtype=self.dtype,
        )(y)
        return TemporalResidual.add(x, y.astype(x.dtype))


class BlockSimple(nn.Module):
    channels: int
    kernel_size: int
    stride: int
    dilation: int
    transposed: bool
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.transposed:
            kernel = self.param("kernel", conv_kernel_init, (self.kernel_size, x.shape[-1], self.channels))
            xc = x
            if self.dtype is not None:
                kernel = kernel.astype(self.dtype)
                xc = x.astype(self.dtype)  # residual operand x stays f32
            y = conv_transpose1d(xc, kernel, self.stride, self.dilation)
        else:
            y = Conv1d(
                features=self.channels, kernel_size=self.kernel_size, dilation=self.dilation,
                use_bias=self.use_bias, dtype=self.dtype,
            )(x[:, :: 1])
            # strided VALID conv
            y = y[:, :: self.stride] if self.stride > 1 else y
        y = nn.GroupNorm(num_groups=self.channels, epsilon=1e-5)(y)
        y = nn.relu(y)
        return TemporalResidual.add(x, y.astype(x.dtype))


class ConvCoder1d(nn.Module):
    """Multi-level conv encoder/decoder with receptive-field bookkeeping."""

    strides: Sequence[int]
    channels: int = 128
    kernel_size: int = 5
    stride_per_block: int = 2
    dilation_factor: int = 1
    num_blocks: int = 8
    channels_in: Union[int, Sequence[Optional[int]], None] = None
    channels_out: Union[int, Sequence[Optional[int]], None] = None
    transposed: bool = False
    block_type: str = "BlockSeparable"
    dtype: Optional[jnp.dtype] = None

    @staticmethod
    def level_geometry(strides, kernel_size, stride_per_block, num_blocks, dilation_factor=1):
        """Per-level (block_strides, receptive_field, overall_receptive_field)."""
        num_levels = len(strides)
        assert all(stride_per_block**num_blocks >= s for s in strides), f"Not enough blocks per level for {strides=}"

        per_level_strides, rfs, overall_rfs = [], [], []
        overall_stride_in, overall_rf_in = 1, 1
        for l in range(num_levels):
            remaining = strides[l]
            block_strides = []
            stride_in, rf_in = 1, 1
            for b in range(num_blocks):
                dilation = dilation_factor**b
                if remaining >= stride_per_block:
                    s = stride_per_block
                    remaining //= stride_per_block
                else:
                    if remaining != 1:
                        raise ValueError(f"remaining stride {remaining} is not 1 at level {l}, block {b}.")
                    s = 1
                block_strides.append((s, dilation))
                a = compute_conv_attributes_single(1, kernel_size, 0, s, dilation, overall_stride_in, overall_rf_in)
                overall_stride_in, overall_rf_in = a.stride, a.receptive_field
                a = compute_conv_attributes_single(1, kernel_size, 0, s, dilation, stride_in, rf_in)
                stride_in, rf_in = a.stride, a.receptive_field
            per_level_strides.append(block_strides)
            rfs.append(rf_in)
            overall_rfs.append(overall_rf_in)
        return per_level_strides, rfs, overall_rfs

    @property
    def num_levels(self):
        return len(self.strides)

    @property
    def overall_strides(self):
        return np.cumprod(self.strides)

    @property
    def overall_stride(self):
        return int(self.overall_strides[-1])

    @property
    def receptive_fields(self):
        return self.level_geometry(self.strides, self.kernel_size, self.stride_per_block, self.num_blocks, self.dilation_factor)[1]

    @property
    def overall_receptive_fields(self):
        return self.level_geometry(self.strides, self.kernel_size, self.stride_per_block, self.num_blocks, self.dilation_factor)[2]

    @property
    def overall_receptive_field(self):
        return self.overall_receptive_fields[-1]

    def _channels_in_list(self):
        if self.channels_in is None:
            return [None] * self.num_levels
        if isinstance(self.channels_in, int):
            return [self.channels_in] + [None] * (self.num_levels - 1)
        return list(self.channels_in)

    def _channels_out_list(self):
        if self.channels_out is None:
            return [None] * self.num_levels
        if isinstance(self.channels_out, int):
            return [self.channels_out] * self.num_levels
        return list(self.channels_out)

    @property
    def e_size(self):
        return [c if c is not None else self.channels for c in self._channels_out_list()]

    def setup(self):
        per_level_strides, _, _ = self.level_geometry(
            self.strides, self.kernel_size, self.stride_per_block, self.num_blocks, self.dilation_factor
        )
        block_cls = {"BlockSeparable": BlockSeparable, "BlockSimple": BlockSimple}[self.block_type]

        levels = []
        for l, block_strides in enumerate(per_level_strides):
            blocks = []
            for s, d in block_strides:
                if self.block_type == "BlockSeparable":
                    blocks.append(
                        block_cls(
                            channels_bottleneck=self.channels,
                            kernel_size=self.kernel_size,
                            stride=s,
                            dilation=d,
                            transposed=self.transposed,
                            dtype=self.dtype,
                        )
                    )
                else:
                    blocks.append(
                        block_cls(
                            channels=self.channels,
                            kernel_size=self.kernel_size,
                            stride=s,
                            dilation=d,
                            transposed=self.transposed,
                            dtype=self.dtype,
                        )
                    )
            if self.transposed:
                # mirror block order so strides are applied in reverse
                blocks = blocks[::-1]
            levels.append(blocks)
        self.levels = levels

        cin = self._channels_in_list()
        cout = self._channels_out_list()
        self.in_projs = {
            str(l): Conv1d(features=self.channels, kernel_size=1, name=f"in_proj_{l}", dtype=self.dtype)
            for l, c in enumerate(cin)
            if c is not None
        }
        self.out_projs = {
            str(l): Conv1d(features=c, kernel_size=1, name=f"out_proj_{l}", dtype=self.dtype)
            for l, c in enumerate(cout)
            if c is not None
        }

    def pad_level(self, hidden, pad_left: int, pad_right: int):
        """Right/left pad (or crop, when transposed) along time (reference
        ``convolutional_coders.py:253-275``)."""
        if not pad_left and not pad_right:
            return hidden
        if self.transposed:
            pad_left, pad_right = -pad_left, -pad_right
        from blvm_tpu.ops.padding import pad_axis

        return pad_axis(hidden, pad_left, pad_right, axis=1)

    def forward_level(self, hidden, level: int, pad_left: int = 0, pad_right: int = 0):
        """One level: in-proj → [pad] → blocks → [pad] → out-proj.

        Returns ``(hidden, encoding)`` — encoding is the out-projected hidden.
        """
        if str(level) in self.in_projs:
            hidden = nn.relu(self.in_projs[str(level)](hidden))
        if not self.transposed:
            hidden = self.pad_level(hidden, pad_left, pad_right)
        for block in self.levels[level]:
            hidden = block(hidden)
        if self.transposed:
            hidden = self.pad_level(hidden, pad_left, pad_right)
        encoding = nn.relu(self.out_projs[str(level)](hidden)) if str(level) in self.out_projs else hidden
        return hidden, encoding

    def __call__(self, hidden, pad_left: Optional[List[int]] = None, pad_right: Optional[List[int]] = None):
        """Run all levels; returns the per-level encodings (B, T_l, C)."""
        pad_left = pad_left or [0] * self.num_levels
        pad_right = pad_right or [0] * self.num_levels
        encodings = []
        for level in range(self.num_levels):
            hidden, encoding = self.forward_level(hidden, level, pad_left[level], pad_right[level])
            encodings.append(encoding)
        return encodings
