"""WaveNet building blocks (flax, channels-last).

Rebuild of reference ``blvm/models/wavenet/wavenet_modules.py`` for TPU:
  * Layout is (B, T, C) — channels on the last (lane) dimension, time folds
    with batch into MXU rows; the reference uses torch's (B, C, T).
  * Dilated convs are ``lax.conv_general_dilated`` with VALID padding; the
    model pads the full receptive field once on the left (same geometry as the
    reference's global ``F.pad`` + valid convs, which is exactly causal).
  * The residual block keeps the reference's structure: dilated conv →
    gated tanh → one 1×1 conv producing residual+skip jointly → slice skip to
    ``skip_size`` → (residual + input) * sqrt(0.5).
"""

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from blvm_tpu.ops.conv_arithmetic import compute_conv_attributes

# torch Conv1d default init: U(-sqrt(1/(in*k)), sqrt(1/(in*k)))
conv_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def conv_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """VALID 1-D conv over (B, T, C) with torch-calibrated init.

    ``dtype`` is the compute dtype (bf16 feeds the MXU at double rate); params
    are stored in f32 and cast at use (standard mixed-precision policy).
    """

    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", conv_kernel_init, (self.kernel_size, in_features // self.feature_group_count, self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            fan_in = self.kernel_size * in_features // self.feature_group_count
            bias = self.param("bias", conv_bias_init_for(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class CausalConv1d(nn.Module):
    """Causal conv: ``y[t]`` depends on ``x[:t]`` (not ``x[t]``), imposed by
    dropping the last input frame before a VALID conv (reference
    ``wavenet_modules.py:14-50``; the caller left-pads the receptive field)."""

    features: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, pad_causal: bool = True):
        if pad_causal:
            x = x[:, :-1]  # remove last input frame
        return Conv1d(features=self.features, kernel_size=self.kernel_size)(x)


class Conv1dResidualGLU(nn.Module):
    """Dilated conv → gated tanh → 1×1 (res+skip) → scaled residual add."""

    res_channels: int
    skip_channels: Optional[int] = None
    gate_channels: Optional[int] = None
    kernel_size: int = 2
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    fuse_gate_dots: bool = False
    # need_skip=False: the caller discards this block's skip (STCN reads only
    # every n-th — ``stcn.py:187``), so contract only the residual columns of
    # ``rs_kernel`` and return ``(o, None)``. Params keep the full joint shape
    # (checkpoint-compatible) and a column-sliced dot is bitwise equal to
    # slicing the full dot's output; the dead skip columns received zero
    # gradient anyway, so training dynamics are identical — this just stops
    # computing and materializing ~(B, T, skip_channels) per dead block.
    need_skip: bool = True

    @nn.compact
    def __call__(self, x, skip_size: int):
        skip_channels = self.skip_channels or self.res_channels
        gate_channels = self.gate_channels or 2 * self.res_channels
        half = gate_channels // 2
        inv_std = math.sqrt(0.5)
        C_in = x.shape[-1]

        # The gate conv is stored as two half-width column-parallel convs
        # (tanh branch / sigmoid branch) rather than one fused (k, C, 2C)
        # kernel: under tensor parallelism the fused layout splits the
        # tanh/sigmoid halves ACROSS shards, forcing GSPMD to insert an
        # all-to-all per block to realign them for the elementwise gate
        # (measured: ~3 all-to-all + 2 collective-permute per block at tp=2).
        # With separate branch params both operands of tanh(a)*sigmoid(b) are
        # sharded identically and the gate is shard-local; the only TP
        # collective left is the row-parallel all-reduce after rs_kernel.
        # Numerics are identical (same contractions, same init distribution).
        gate_kernel_t = self.param("gate_kernel_t", conv_kernel_init, (self.kernel_size, C_in, half))
        gate_kernel_s = self.param("gate_kernel_s", conv_kernel_init, (self.kernel_size, C_in, half))
        gate_bias_t = self.param("gate_bias_t", conv_bias_init_for(self.kernel_size * C_in), (half,))
        gate_bias_s = self.param("gate_bias_s", conv_bias_init_for(self.kernel_size * C_in), (half,))
        rs_kernel = self.param(
            "rs_kernel", conv_kernel_init, (1, half, self.res_channels + skip_channels)
        )
        rs_bias = (
            self.param("rs_bias", conv_bias_init_for(half), (self.res_channels + skip_channels,))
            if self.use_bias
            else jnp.zeros((self.res_channels + skip_channels,), x.dtype)
        )

        if self.dtype is not None:
            x = x.astype(self.dtype)
            gate_kernel_t = gate_kernel_t.astype(self.dtype)
            gate_kernel_s = gate_kernel_s.astype(self.dtype)
            rs_kernel = rs_kernel.astype(self.dtype)

        def branch_conv(kernel, bias):
            if self.kernel_size == 2:
                # k=2 dilated VALID conv as two matmuls with the time shift
                # applied to the OUTPUTS: y[t] = k[0]ᵀ x[t] + k[1]ᵀ x[t+d].
                # Plain dots lower onto the MXU far better than the
                # dilated-conv op (1.45× fwd+bwd on the 50-block bf16 stack),
                # and slicing after the matmul instead of before removes the
                # materialized shifted-operand copies the profiler showed at
                # 17% of step time (56.2 vs 63.2 ms/step, ~2× faster compile).
                d = self.dilation
                y0 = x @ kernel[0]
                y1 = x @ kernel[1]
                return y0[:, : x.shape[1] - d] + y1[:, d:] + bias.astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(1,),
                padding="VALID",
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bias.astype(x.dtype)

        if self.kernel_size == 2 and self.fuse_gate_dots:
            # ABLATION (default off — measured SLOWER): all four k=2
            # tap/branch contractions as ONE dot so x is read once and XLA
            # sees a single wide (C_in, 4*half) matmul. Column-concatenating
            # the kernels is bitwise-identical to the separate dots (a dot's
            # output column depends only on its own kernel column), but on a
            # v5e the flagship step REGRESSES 54.5 → 72.2 ms/step: XLA already
            # fuses the four small dots' HBM reads, and the fused form blocks
            # its (t, t+d) output-slice overlap trick. Kept as a measured
            # negative result. Also incompatible with tensor parallelism (the
            # concat interleaves differently-sharded pieces — GSPMD inserts
            # realignment collectives).
            d = self.dilation
            L = x.shape[1] - d
            fused = jnp.concatenate(
                [gate_kernel_t[0], gate_kernel_t[1], gate_kernel_s[0], gate_kernel_s[1]], axis=-1
            )
            y = x @ fused  # (B, T_in, 4*half)
            t_pre = y[:, :L, :half] + y[:, d:, half : 2 * half] + gate_bias_t.astype(x.dtype)
            s_pre = y[:, :L, 2 * half : 3 * half] + y[:, d:, 3 * half :] + gate_bias_s.astype(x.dtype)
            act = jnp.tanh(t_pre) * jax.nn.sigmoid(s_pre)
        else:
            act = jnp.tanh(branch_conv(gate_kernel_t, gate_bias_t)) * jax.nn.sigmoid(
                branch_conv(gate_kernel_s, gate_bias_s)
            )
        if self.need_skip:
            rs = act @ rs_kernel[0] + rs_bias.astype(x.dtype)
            r, s = rs[..., : self.res_channels], rs[..., self.res_channels :]
            s = s[:, -skip_size:]  # keep only the (unpadded) output region
        else:
            r = act @ rs_kernel[0, :, : self.res_channels] + rs_bias[: self.res_channels].astype(x.dtype)
            s = None
        x = x[:, -r.shape[1] :]  # drop what the dilated kernel consumed
        o = (r + x) * inv_std
        return o, s


class ResidualStack(nn.Module):
    """``n_stacks`` repeats of ``n_layers`` residual blocks with dilations
    ``1, base, base*2, base*4, ...`` and skip connections collected from every
    block (reference ``wavenet_modules.py:120-211``)."""

    n_layers: int
    n_stacks: int
    res_channels: int
    skip_channels: Optional[int] = None
    gate_channels: Optional[int] = None
    kernel_size: int = 2
    base_dilation: int = 2
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    fuse_gate_dots: bool = False

    @staticmethod
    def build_dilations(n_layers: int, n_stacks: int, base_dilation: int) -> Sequence[int]:
        if base_dilation > 1:
            return [1, *[base_dilation * 2**i for i in range(0, n_layers - 1)]] * n_stacks
        return [1] * n_layers * n_stacks

    @staticmethod
    def compute_receptive_fields(n_layers: int, n_stacks: int, kernel_size: int, base_dilation: int):
        n = n_layers * n_stacks
        dilations = [1, *[base_dilation * 2**i for i in range(0, n_layers - 1)]] * n_stacks
        attrs = compute_conv_attributes([kernel_size] * n, [0] * n, [1] * n, dilations, return_all=True)
        return [a.receptive_field for a in attrs]

    @property
    def receptive_field(self) -> int:
        return self.compute_receptive_fields(self.n_layers, self.n_stacks, self.kernel_size, self.base_dilation)[-1]

    @nn.compact
    def __call__(self, x, skip_size: int, collect_tails: bool = False, skip_mask: Optional[Sequence[bool]] = None):
        """Returns the list of per-block skips, each (B, skip, C).

        ``collect_tails=True`` (fast-generation priming): additionally return
        per-block history tails — the last ``dilation`` frames of each block's
        INPUT, whose final column is time-aligned with the stack's final
        output column — which seed the circular buffers of
        ``WaveNet._generate_fast``.

        ``skip_mask`` (one bool per block, default all-True): blocks marked
        False do not compute their skip output at all (see
        ``Conv1dResidualGLU.need_skip``) and contribute ``None`` at their
        position in the returned list — for callers like STCN that only read
        every n-th skip (``stcn.py:187``).
        """
        # The reference defaults ``in_channels = res_channels`` and then tests
        # ``if self.in_channels is not None`` — always true — so its stack
        # ALWAYS applies a 1x1 in_transform conv (wavenet_modules.py:144-163,
        # 205-208), even when input width already equals res_channels. Kept
        # for parity (trained checkpoints depend on it).
        o = Conv1d(features=self.res_channels, kernel_size=1, dtype=self.dtype)(x)
        skips = []
        tails = []
        dilations = self.build_dilations(self.n_layers, self.n_stacks, self.base_dilation)
        if skip_mask is None:
            skip_mask = [True] * len(dilations)
        for dilation, need_skip in zip(dilations, skip_mask):
            block = Conv1dResidualGLU(
                res_channels=self.res_channels,
                skip_channels=self.skip_channels,
                gate_channels=self.gate_channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                dtype=self.dtype,
                fuse_gate_dots=self.fuse_gate_dots,
                need_skip=need_skip,
            )
            if collect_tails:
                tails.append(o[:, -dilation:])
            if self.remat:
                # remat the call, not the class — parameter paths stay identical
                # so checkpoints transfer between remat settings
                o, s = nn.remat(lambda mdl, o_: mdl(o_, skip_size))(block, o)
            else:
                o, s = block(o, skip_size)
            skips.append(s)
        if collect_tails:
            return skips, tails
        return skips


class PointwiseTransform(nn.Module):
    """Output head: ReLU → Dense → ReLU over (B, T, C) (reference
    ``wavenet_modules.py:214-239``)."""

    out_features: int

    @nn.compact
    def __call__(self, x):
        from blvm_tpu.modules.common import Dense

        x = nn.relu(x)
        x = Dense(self.out_features)(x)
        return nn.relu(x)
