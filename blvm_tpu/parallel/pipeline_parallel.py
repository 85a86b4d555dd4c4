"""Pipeline parallelism (GPipe-style) for the dilated-conv residual stacks.

The reference has no model parallelism of any kind (SURVEY §2.8;
``blvm/utils/argparsers.py:51-56`` defines DDP flags that are never wired).
This module adds the third TPU scaling axis beyond the data/seq/model axes:
the WaveNet ``ResidualStack`` (``blvm/models/wavenet/wavenet_modules.py:120-211``
in the reference; ``blvm_tpu/models/wavenet/modules.py`` here) is cut into
``n_stages`` *stages* of whole dilation stacks, each stage owned by one slice
of devices along a ``pipe`` mesh axis, and microbatches stream through the
stages GPipe-style: stage ``s`` processes microbatch ``m`` at tick ``m + s``
while its neighbours work on other microbatches, with the residual activation
handed to the next stage by a ``lax.ppermute`` ring shift each tick.

Why this is a real lever for THIS workload: the flagship WaveNet/STCN steps
are HBM-**capacity**-bound, not FLOP-bound (NOTES.md round-3 roofline: B=8
monolithic temp alloc 9-13 GB of 16 GB forces XLA spills; gradient
accumulation already buys back 1.3-2.2x by shrinking the live set). Data and
sequence parallelism shard the batch/time axes of every layer's activations
but each device still materializes all 50 blocks' intermediates; the pipe
axis shards the DEPTH axis — each stage holds only its own blocks' (and
in-flight microbatches') activations and parameters/optimizer moments, which
is the remaining way to cut the live set without changing the math.

TPU-native design (not a torch translation — the reference has nothing to
translate): per-stage block parameters are stacked on a leading stage axis
and sharded over ``pipe``; one ``jax.shard_map`` runs the whole pipeline as
a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks; the only collectives
are the per-tick ring ``ppermute`` of one microbatch's residual buffer and a
single final ``psum`` that folds the per-stage skip sums (each block's skip
output, summed within the stage in block order) into the model's global skip
sum. Everything is differentiable — ``jax.grad`` through the ``shard_map``
transposes the ``ppermute`` to its reverse ring and turns the replicated
input broadcast into the data-parallel gradient ``psum``, so
``make_train_step`` applies unchanged.

Geometry: the pipelined stack works on FIXED-WIDTH right-aligned buffers.
The standard stack shrinks the time axis by ``dilation`` at each block
(VALID convs); stages, however, must exchange identically-shaped payloads.
Each block's output is therefore left-padded back to the stage-invariant
buffer width ``T_buf = skip_size + sum(dilations)``. The pad frames are
garbage that precisely mirrors the frames the shrinking form would have
dropped: a VALID conv output at position t only reads inputs at t..t+d, so
the rightmost ``skip_size`` frames — the only ones the skip slices and the
final output read — are bit-for-bit the same contractions as the shrinking
form (equivalence is tested to float tolerance; XLA may tile the two shapes
differently).

Constraint: ``n_stages`` must divide ``n_stacks`` so every stage applies the
same dilation sequence (whole stacks) — SPMD requires one stage program. The
flagship 5-stack WaveNet therefore pipelines at pipe=5 (a v4-8/v5e-8 slice
row); tests and the multichip dryrun use 2/4-stack configs at pipe=2.
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from blvm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS, SEQ_AXIS

# TrainState sharding rules for the pipeline parameter layout: every stacked
# stage leaf (params AND the Adam moments mirroring them) shards its leading
# stage axis over ``pipe`` — per-stage optimizer memory, ZeRO-style for free
# (same mechanism as tensor_parallel.shard_train_state).
PIPELINE_PP_RULES = [(r"stages/block_\d+/", P(PIPE_AXIS))]

# pp x tp: the stage-stacked block leaves keep ``pipe`` on the leading stage
# axis and ADDITIONALLY shard their channel dims over ``model`` — the same
# column-parallel gates / row-parallel projection as the non-pipelined
# RESIDUAL_GLU_TP_RULES (tensor_parallel.py), shifted one dim right by the
# stage axis. The GPipe shard_map runs manual over (data, seq, pipe) and
# leaves ``model`` automatic, so GSPMD partitions the per-stage block math
# over the model axis exactly like the non-pipelined TP path (one psum per
# block for the row-parallel contraction).
PIPELINE_PP_TP_RULES = [
    (r"stages/block_\d+/.*gate_kernel_[ts]$", P(PIPE_AXIS, None, None, MODEL_AXIS)),
    (r"stages/block_\d+/.*gate_bias_[ts]$", P(PIPE_AXIS, MODEL_AXIS)),
    (r"stages/block_\d+/.*rs_kernel$", P(PIPE_AXIS, None, MODEL_AXIS, None)),
    (r"stages/block_\d+/", P(PIPE_AXIS)),
]


def _block_names(res_stack_params):
    names = [k for k in res_stack_params if k.startswith("Conv1dResidualGLU_")]
    return sorted(names, key=lambda s: int(s.rsplit("_", 1)[1]))


def to_pipeline_params(params, n_stages: int):
    """Canonical WaveNet params -> pipeline layout.

    The ``res_stack``'s per-block subtrees ``Conv1dResidualGLU_{s*bps+j}``
    are regrouped into ``res_stack/stages/block_{j}`` with leaves stacked on
    a leading stage axis (shape ``(n_stages, ...)``); everything else is
    untouched. Inverse: :func:`from_pipeline_params`. Both are pure jnp
    stacking — usable on host params or inside a jitted function.
    """
    rs = dict(params["res_stack"])
    names = _block_names(rs)
    n_blocks = len(names)
    if n_blocks % n_stages != 0:
        raise ValueError(f"{n_blocks} blocks not divisible by n_stages={n_stages}")
    bps = n_blocks // n_stages
    stages = {}
    for j in range(bps):
        per_stage = [rs.pop(f"Conv1dResidualGLU_{s * bps + j}") for s in range(n_stages)]
        stages[f"block_{j}"] = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per_stage)
    rs["stages"] = stages
    out = dict(params)
    out["res_stack"] = rs
    return out


def from_pipeline_params(params, n_stages: Optional[int] = None):
    """Pipeline-layout WaveNet params -> canonical layout (exact inverse)."""
    rs = dict(params["res_stack"])
    stages = dict(rs.pop("stages"))
    bps = len(stages)
    if n_stages is None:
        n_stages = jax.tree_util.tree_leaves(stages)[0].shape[0]
    for j in range(bps):
        stacked = stages[f"block_{j}"]
        for s in range(n_stages):
            rs[f"Conv1dResidualGLU_{s * bps + j}"] = jax.tree_util.tree_map(lambda l: l[s], stacked)
    out = dict(params)
    out["res_stack"] = rs
    return out


def stack_consumed(n_layers: int, n_stacks: int, kernel_size: int, base_dilation: int) -> int:
    """Frames the whole residual stack's VALID convs consume (= the engine's
    ``n_stages * consumed`` = the overlap each sequence window must carry)."""
    from blvm_tpu.models.wavenet.modules import ResidualStack

    return sum(d * (kernel_size - 1) for d in ResidualStack.build_dilations(n_layers, n_stacks, base_dilation))


def seq_windows(h, seq: int, overlap: int, shared: int = 0):
    """Overlap-window sequence sharding: turn time shards into extra batch rows.

    ``h``: the stack input ``(B, skip + overlap, C)`` (the last ``skip`` frames
    are the positions the skips/output read; the first ``overlap`` frames are
    history). Returns ``(B*seq, (skip-shared)/seq + shared + overlap, C)``
    where row ``b*seq+i`` owns skip slice ``i`` of example ``b`` AND carries
    its own receptive-field history — so the pipeline engine needs NO
    per-block halo exchange and pp x sp reduces to row sharding over the
    (data, seq) mesh axes. The redundant compute is ``overlap / (skip/seq)``
    (flagship STCN at T=16000, seq=4: 155/4000 ≈ 4%); the owned outputs are
    the same contractions as the monolithic form, so loss AND gradients are
    exact (each input frame's gradient flows through every window that reads
    it — the same multiset of products as the monolithic conv).

    ``shared``: boundary skip frames adjacent shards both compute. STCN's
    skips carry T+1 frames (the one-frame prior/posterior shift,
    ``models/stcn/stcn.py:infer``), so consecutive shards share one frame
    (``shared=1``); :func:`seq_unwindows` drops the duplicate on reassembly.
    """
    B, T_buf, C = h.shape
    skip = T_buf - overlap
    if (skip - shared) % seq != 0:
        raise ValueError(f"skip region ({skip} - shared {shared}) not divisible by seq axis ({seq})")
    loc = (skip - shared) // seq
    width = loc + shared + overlap
    rows = [h[:, i * loc : i * loc + width] for i in range(seq)]
    return jnp.stack(rows, axis=1).reshape(B * seq, width, C)


def seq_unwindows(y, seq: int, shared: int = 0):
    """Inverse row layout: ``(B*seq, loc+shared, C)`` ->
    ``(B, seq*loc + shared, C)`` (duplicated boundary frames dropped)."""
    Bs, w, C = y.shape
    if shared == 0:
        return y.reshape(Bs // seq, seq * w, C)
    y = y.reshape(Bs // seq, seq, w, C)
    parts = [y[:, 0]] + [y[:, i, shared:] for i in range(1, seq)]
    return jnp.concatenate(parts, axis=1)


def make_pipelined_stack(
    *,
    n_layers: int,
    n_stacks: int,
    res_channels: int,
    skip_channels: Optional[int],
    gate_channels: Optional[int],
    kernel_size: int,
    base_dilation: int,
    dtype,
    n_stages: int,
    n_micro: int,
    mesh: Mesh,
    skip_mode: str = "sum",
    local_skip_mask: Optional[Sequence[bool]] = None,
):
    """Build ``pipelined(stage_params, h)``: the GPipe engine.

    ``stage_params``: the ``res_stack/stages`` subtree in pipeline layout
    (leaves ``(n_stages, ...)``, sharded or shardable over ``pipe``).
    ``h``: the residual-stack input AFTER the stack's 1x1 in-transform,
    shape ``(B, T_buf, res_channels)`` with
    ``T_buf = skip_size + (kernel_size-1)·sum(d)``.

    ``skip_mode="sum"`` (WaveNet): returns the f32 skip sum
    ``(B, skip_size, skip_ch)`` — the exact value of
    ``sum(at_least_f32(s) for s in skips)`` in the standard forward
    (``models/wavenet/wavenet.py:_network``), up to f32 sum reassociation
    (stage partials are summed per stage in block order, then across stages).

    ``skip_mode="collect"`` (STCN): returns the LIST of individual skip
    tensors (compute dtype, global block order) for the blocks whose
    ``local_skip_mask`` entry is True — the mask is per-stage-local (length
    ``blocks_per_stage``) and must be the SAME for every stage (one SPMD
    program); each stage all-gathers its collected skips at the end. This is
    the shape STCN's hierarchical ``infer`` consumes (every n-th skip,
    ``models/stcn/stcn.py:infer``).
    """
    from blvm_tpu.models.wavenet.modules import Conv1dResidualGLU, ResidualStack
    from blvm_tpu.ops.likelihoods import at_least_f32

    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{PIPE_AXIS}' axis: {mesh.axis_names}")
    if mesh.shape[PIPE_AXIS] != n_stages:
        raise ValueError(f"mesh pipe axis ({mesh.shape[PIPE_AXIS]}) != n_stages ({n_stages})")
    # pp x tp: the shard_map below is manual over (data, seq, pipe) only; the
    # 'model' axis stays AUTOMATIC, so GSPMD partitions the per-stage block
    # math over it from the PIPELINE_PP_TP_RULES parameter shardings — the
    # same compiler-driven TP as the non-pipelined path, inside the engine
    manual_axes = frozenset(a for a in mesh.axis_names if a != MODEL_AXIS)
    # pp x sp composes through overlap-window sequence sharding (the adapters
    # turn time shards into extra batch ROWS carrying their own receptive-field
    # history — see ``seq_windows``): the engine just shards rows over BOTH the
    # data and seq mesh axes, no per-block halo exchange needed
    row_axes = (DATA_AXIS, SEQ_AXIS) if SEQ_AXIS in mesh.axis_names else DATA_AXIS

    dilations = list(ResidualStack.build_dilations(n_layers, n_stacks, base_dilation))
    n_blocks = len(dilations)
    if n_blocks % n_stages != 0 or n_stacks % n_stages != 0:
        raise ValueError(
            f"n_stages={n_stages} must divide n_stacks={n_stacks} (stages must be whole dilation stacks)"
        )
    bps = n_blocks // n_stages
    stage_dil = dilations[:bps]
    for s in range(n_stages):
        if dilations[s * bps : (s + 1) * bps] != stage_dil:
            raise ValueError("stages are not homogeneous: dilation sequence differs between stages")
    # a k-wide VALID conv at dilation d consumes d·(k-1) frames
    consumed = sum(d * (kernel_size - 1) for d in stage_dil)
    skip_ch = skip_channels or res_channels

    if skip_mode not in ("sum", "collect"):
        raise ValueError(f"skip_mode must be 'sum' or 'collect', got {skip_mode!r}")
    if local_skip_mask is None:
        local_skip_mask = [True] * bps
    if len(local_skip_mask) != bps:
        raise ValueError(f"local_skip_mask has {len(local_skip_mask)} entries, expected blocks_per_stage={bps}")
    used_local = [j for j, m in enumerate(local_skip_mask) if m]
    k_used = len(used_local)
    if skip_mode == "collect" and k_used == 0:
        raise ValueError("collect mode needs at least one True local_skip_mask entry")

    blocks = [
        Conv1dResidualGLU(
            res_channels=res_channels,
            skip_channels=skip_channels,
            gate_channels=gate_channels,
            kernel_size=kernel_size,
            dilation=d,
            dtype=dtype,
            need_skip=need,
        )
        for d, need in zip(stage_dil, local_skip_mask)
    ]

    def stage_fn(sp, buf, skip_size):
        """Apply this stage's blocks on the fixed-width buffer; return the
        re-aligned buffer and the stage's skips — the f32 block-order sum
        ("sum") or the stacked masked skips in compute dtype ("collect")."""
        skip_acc = None
        collected = []
        for j, (block, d) in enumerate(zip(blocks, stage_dil)):
            bp = sp[f"block_{j}"]
            o, s_ = block.apply({"params": bp}, buf, skip_size)
            # the VALID conv consumed d·(k-1) frames; left-pad back to the
            # stage-invariant width (the pad frames mirror what the shrinking
            # form dropped and are never read by a valid output — module
            # docstring)
            buf = jnp.pad(o, ((0, 0), (d * (kernel_size - 1), 0), (0, 0)))
            if skip_mode == "sum":
                s32 = at_least_f32(s_)
                skip_acc = s32 if skip_acc is None else skip_acc + s32
            elif s_ is not None:
                collected.append(s_)
        if skip_mode == "sum":
            return buf, skip_acc
        return buf, jnp.stack(collected)  # (k_used, Bm, skip, C) compute dtype

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def body(stage_params, h_local):
        # shard_map hands each device its (1, ...) stage slice — drop the axis
        sp = jax.tree_util.tree_map(lambda l: l[0], stage_params)
        s_idx = jax.lax.axis_index(PIPE_AXIS)
        B_loc, T_buf, _ = h_local.shape
        skip_size = T_buf - n_stages * consumed
        if B_loc % n_micro != 0:
            raise ValueError(f"per-device batch ({B_loc}) not divisible by n_micro={n_micro}")
        Bm = B_loc // n_micro
        h_mb = h_local.reshape(n_micro, Bm, T_buf, res_channels)

        buf0 = jnp.zeros((Bm, T_buf, res_channels), h_local.dtype)
        # +1 trash slot: drain-phase ticks with no valid microbatch write there
        if skip_mode == "sum":
            skips0 = jnp.zeros((n_micro + 1, Bm, skip_size, skip_ch), jnp.float32)
        else:
            skips0 = jnp.zeros(
                (n_micro + 1, k_used, Bm, skip_size, skip_ch), dtype or h_local.dtype
            )

        def tick(carry, t):
            buf, skips = carry
            # stage 0 injects microbatch t (drain ticks re-run the last one —
            # finite garbage whose outputs are never stored)
            buf = jnp.where(s_idx == 0, h_mb[jnp.clip(t, 0, n_micro - 1)], buf)
            buf, skip_sum = stage_fn(sp, buf, skip_size)
            # stage s works on microbatch m = t - s; store its skip partial
            m = t - s_idx
            valid = (m >= 0) & (m < n_micro)
            idx = jnp.where(valid, m, n_micro)
            skips = jax.lax.dynamic_update_slice_in_dim(skips, skip_sum[None], idx, axis=0)
            # hand the processed residual buffer to the next stage (ring —
            # the wrap back to stage 0 is overwritten by the next injection)
            buf = jax.lax.ppermute(buf, PIPE_AXIS, perm)
            return (buf, skips), None

        (_, skips), _ = jax.lax.scan(tick, (buf0, skips0), jnp.arange(n_micro + n_stages - 1))
        if skip_mode == "sum":
            # fold the per-stage skip partials into the global skip sum; also
            # makes the output pipe-replicated so the head runs data-parallel
            total = jax.lax.psum(skips[:n_micro], PIPE_AXIS)  # (M, Bm, skip, S)
            return total.reshape(n_micro * Bm, skip_size, skip_ch)
        # collect: each stage holds its own k_used skips — all-gather them so
        # the (replicated) latent hierarchy can read every level's skip
        gathered = jax.lax.all_gather(
            skips[:n_micro], PIPE_AXIS, axis=0, tiled=False
        )  # (n_stages, M, k_used, Bm, skip, S)
        return [
            gathered[s, :, i].reshape(n_micro * Bm, skip_size, skip_ch)
            for s in range(n_stages)
            for i in range(k_used)
        ]

    out_specs = (
        P(row_axes, None, None)
        if skip_mode == "sum"
        else [P(row_axes, None, None)] * (n_stages * k_used)
    )

    def pipelined(stage_params, h):
        specs = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS), stage_params)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P(row_axes, None, None)),
            out_specs=out_specs,
            axis_names=manual_axes,
            check_vma=False,
        )(stage_params, h)

    return pipelined


class WaveNetPipelineAdapter:
    """Everything the driver/train loop needs to run a WaveNet pipelined.

    Reproduces the model's training forward (``models/wavenet/wavenet.py:
    __call__`` with ``pad_causal=True, pad_receptive_field=True`` — the
    reference geometry, ``blvm/models/wavenet/wavenet.py:148-219``) with the
    residual stack replaced by the GPipe engine. Embedding configs are
    unsupported (the flagship/benchmarks grid uses DMoL on raw waveforms);
    frame stacking is supported.

    ``params`` seen by the returned loss_fn are in PIPELINE layout
    (:func:`to_pipeline_params`); checkpoints stay canonical via
    :func:`from_pipeline_params` at the save/eval boundaries.
    """

    def __init__(self, model, n_stages: int, n_micro: int):
        if model.embedding_dim is not None:
            raise ValueError("pipeline parallelism does not support embedding-input WaveNets")
        self.model = model
        self.n_stages = int(n_stages)
        self.n_micro = int(n_micro)
        self.rules = PIPELINE_PP_RULES

    def to_pipeline(self, params):
        return to_pipeline_params(params, self.n_stages)

    def from_pipeline(self, params):
        return from_pipeline_params(params, self.n_stages)

    def make_loss_fn(self, mesh: Mesh):
        from blvm_tpu.models.wavenet.modules import CausalConv1d, Conv1d, PointwiseTransform
        from blvm_tpu.modules.distributions import get_likelihood_head
        from blvm_tpu.ops.sequence import sequence_mask, stack_tensor

        model = self.model
        nsf = model.n_stack_frames
        rf = model.receptive_field
        dtype = jnp.bfloat16 if model.bf16 else None
        variance_scale = math.sqrt(1 / model.n_stacks * model.n_layers)  # parity quirk, wavenet.py:79
        head = get_likelihood_head(
            model.likelihood, y_dim=1, num_mix=model.num_mix, num_bins=model.num_bins
        )
        causal = CausalConv1d(features=model.res_channels, kernel_size=model.kernel_size)
        in_conv = Conv1d(features=model.res_channels, kernel_size=1, dtype=dtype)
        out_transform = PointwiseTransform(model.res_channels * nsf)
        add_y_channel = model.likelihood.lower() != "categorical"

        pipelined = make_pipelined_stack(
            n_layers=model.n_layers,
            n_stacks=model.n_stacks,
            res_channels=model.res_channels,
            skip_channels=model.skip_channels,
            gate_channels=model.gate_channels,
            kernel_size=model.kernel_size,
            base_dilation=model.base_dilation,
            dtype=dtype,
            n_stages=self.n_stages,
            n_micro=self.n_micro,
            mesh=mesh,
        )
        seq = mesh.shape[SEQ_AXIS] if SEQ_AXIS in mesh.axis_names else 1
        overlap = stack_consumed(model.n_layers, model.n_stacks, model.kernel_size, model.base_dilation)

        def loss_fn(params, rng, batch, scalars):
            x, x_sl = batch["x"], batch["x_sl"]
            y = jax.lax.stop_gradient(x)
            if nsf > 1:
                x, p = stack_tensor(x, nsf, axis=1)
            if x.ndim == 2:
                x = x[..., None]
            if add_y_channel and y.ndim == 2:
                y = y[..., None]
            T = x.shape[1]
            x = jnp.pad(x, ((0, 0), (rf, 0), (0, 0)))

            h = causal.apply({"params": params["causal"]}, x, pad_causal=True)
            h = in_conv.apply({"params": params["res_stack"]["Conv1d_0"]}, h)
            if seq > 1:
                h = seq_windows(h, seq, overlap)  # pp x sp: time shards as rows
            skip_sum = pipelined(params["res_stack"]["stages"], h)  # (B, T, S) f32
            if seq > 1:
                skip_sum = seq_unwindows(skip_sum, seq)
            logits = out_transform.apply({"params": params["out_transform"]}, skip_sum * variance_scale)
            if nsf > 1:
                B, Ts, _ = logits.shape
                logits = logits.reshape(B, Ts, nsf, model.res_channels).reshape(
                    B, Ts * nsf, model.res_channels
                )
                if p:
                    logits = logits[:, :-p]
            parameters = head.apply({"params": params["likelihood_head"]}, logits)

            # masked NLL / sum(x_sl) — WaveNet.compute_loss (wavenet.py:119-131)
            seq_mask = sequence_mask(x_sl, max_len=y.shape[1], dtype=jnp.float32)
            if y.ndim == 2:
                log_prob_twise = head.log_prob(y, parameters, reduce_dim=None) * seq_mask
            else:
                log_prob_twise = head.log_prob(y, parameters) * seq_mask
            log_prob = log_prob_twise.reshape(y.shape[0], -1).sum(axis=1)
            loss = -log_prob.sum() / x_sl.sum()
            mets = dict(loss=loss, log_prob=log_prob, x_sl=x_sl)
            return loss, (mets, None)

        return loss_fn


class STCNPipelineAdapter:
    """Pipeline-parallel adapter for STCN — the second conv family, and the
    most HBM-capacity-bound one (NOTES.md roofline: 13 GB temp alloc of
    16 GB at the flagship B=8 step forces XLA spills; gradient accumulation
    buys 2.2x back, and depth-sharding the encoder is the remaining lever).

    The encoder ``ResidualStack`` (reference ``blvm/models/stcn/stcn.py:
    152-218``) runs through the GPipe engine in ``skip_mode="collect"``:
    stages return the individual every-n-th skips STCN's hierarchical
    ``infer`` consumes instead of WaveNet's skip sum. Everything downstream —
    latent hierarchy, decode stack, likelihood, loss, metrics — is the
    model's own ``finish_from_skips`` method applied on the canonical
    submodule scopes, so the math (and the ``sample`` rng sequence) is
    identical to the monolithic forward.

    Constraints: ``n_stages`` must divide ``n_stacks`` (whole-stack stages,
    like WaveNet) and blocks-per-stage must be a multiple of ``n_latents``
    so every stage owns the same local skip offsets (one SPMD program). The
    flagship 5-layer x 5-stack x 5-latent STCN pipelines at pipe=5 with zero
    waste; configs with more blocks than ``n_latents^2`` compute a few
    trailing skips the hierarchy never reads (they are dead in the
    monolithic forward too — ``skip_mask`` there, engine superset here).
    """

    def __init__(self, model, n_stages: int, n_micro: int):
        self.model = model
        self.n_stages = int(n_stages)
        self.n_micro = int(n_micro)
        self.rules = PIPELINE_PP_RULES
        n = len(model.latent_size)
        n_stacks = model.n_stacks or n
        n_blocks = model.n_layers * n_stacks
        if n_stacks % self.n_stages != 0:
            raise ValueError(f"n_stages={n_stages} must divide n_stacks={n_stacks}")
        bps = n_blocks // self.n_stages
        if bps % n != 0:
            raise ValueError(
                f"blocks per stage ({bps}) must be a multiple of n_latents ({n}) so every "
                "stage owns the same local skip offsets (one SPMD stage program)"
            )

    def to_pipeline(self, params):
        return to_pipeline_params(params, self.n_stages)

    def from_pipeline(self, params):
        return from_pipeline_params(params, self.n_stages)

    def make_loss_fn(self, mesh: Mesh):
        from blvm_tpu.models.stcn.stcn import STCN
        from blvm_tpu.models.wavenet.modules import CausalConv1d, Conv1d
        from blvm_tpu.ops.sequence import stack_tensor

        model = self.model
        n = len(model.latent_size)
        n_stacks = model.n_stacks or n
        n_blocks = model.n_layers * n_stacks
        bps = n_blocks // self.n_stages
        nsf = model.n_stack_frames
        rf = model.receptive_field
        dtype = jnp.bfloat16 if model.bf16 else None
        causal = CausalConv1d(features=model.res_channels, kernel_size=model.kernel_size)
        in_conv = Conv1d(features=model.res_channels, kernel_size=1, dtype=dtype)
        # stage-local mask: every n-th block's skip feeds a latent level
        # (global index g used iff g % n == n-1; bps % n == 0 makes the local
        # pattern identical across stages)
        local_mask = [(j % n) == n - 1 for j in range(bps)]
        used_globals = list(range(n - 1, n_blocks, n))[:n]  # infer reads the first n

        pipelined = make_pipelined_stack(
            n_layers=model.n_layers,
            n_stacks=n_stacks,
            res_channels=model.res_channels,
            skip_channels=None,
            gate_channels=None,
            kernel_size=model.kernel_size,
            base_dilation=model.base_dilation,
            dtype=dtype,
            n_stages=self.n_stages,
            n_micro=self.n_micro,
            mesh=mesh,
            skip_mode="collect",
            local_skip_mask=local_mask,
        )
        seq = mesh.shape[SEQ_AXIS] if SEQ_AXIS in mesh.axis_names else 1
        overlap = stack_consumed(model.n_layers, n_stacks, model.kernel_size, model.base_dilation)

        def loss_fn(params, rng, batch, scalars):
            x, x_sl = batch["x"], batch["x_sl"]
            beta = scalars.get("beta", 1.0)
            free_nats = scalars.get("free_nats", 0.0)
            y = jax.lax.stop_gradient(x)
            if nsf > 1:
                x, p = stack_tensor(x, nsf, axis=1)
            else:
                p = 0
            x = x[..., None] if x.ndim == 2 else x
            y = y[..., None] if y.ndim == 2 else y
            T = x.shape[1]
            x = jnp.pad(x, ((0, 0), (rf, 0), (0, 0)))

            out = causal.apply({"params": params["causal"]}, x, pad_causal=False)
            h = in_conv.apply({"params": params["res_stack"]["Conv1d_0"]}, out)
            if seq > 1:
                # pp x sp: time shards as rows; STCN skips carry T+1 frames
                # (one-frame prior/posterior shift) — shards share 1 frame
                h = seq_windows(h, seq, overlap, shared=1)
            collected = pipelined(params["res_stack"]["stages"], h)  # ascending global order
            if seq > 1:
                collected = [seq_unwindows(c, seq, shared=1) for c in collected]
            skips = [None] * n_blocks
            for g, s_ in zip([g for g in range(n_blocks) if (g % n) == n - 1], collected):
                if g in used_globals:
                    skips[g] = s_
            # latent hierarchy + decode + loss: the model's own method on the
            # canonical submodule scopes (res_stack params go unused — flax
            # only resolves the scopes the method touches)
            loss, mets, _ = model.apply(
                {"params": params},
                skips,
                y,
                x_sl,
                T,
                p,
                free_nats,
                beta,
                method=STCN.finish_from_skips,
                rngs={"sample": rng},
            )
            return loss, (mets, None)

        return loss_fn
