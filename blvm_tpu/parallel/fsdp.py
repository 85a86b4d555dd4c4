"""Fully-sharded data parallelism (FSDP / ZeRO-3) over the ``data`` mesh axis.

Plain data parallelism replicates parameters and Adam moments on every
device: each chip holds 3x the parameter bytes (params + mu + nu) that it
strictly needs. FSDP shards all three over the ``data`` axis instead — the
per-device state memory drops by the data-axis size — and lets GSPMD insert
the collectives: parameters are all-gathered just before use in the forward/
backward and gradients arrive as a reduce-scatter instead of an all-reduce
(same total bytes on the wire as DP's all-reduce, so steady-state throughput
is unchanged while state memory scales 1/N).

This is the TPU-native form of the reference's missing distributed story
(SURVEY §2.8: DDP flags exist, ``torch.distributed`` never called — and
certainly no ZeRO): no wrapper classes, no manual bucketing/flattening —
just ``NamedSharding`` annotations on the state pytree over the existing
``(data, ...)`` mesh, composed with the tensor-parallel rules when both are
active. The jitted step factories pass ``in_shardings=None`` for the state
(inherit argument placement), so placing the state once with
:func:`shard_train_state_fsdp` is all that is needed.

Unlike tensor parallelism (name-based rules, ``tensor_parallel.py``), FSDP
sharding is SHAPE-based: every leaf independently shards its largest
not-already-sharded dimension that divides the data-axis size. Leaves
smaller than ``min_leaf_elems`` stay replicated — gathering a 96-float bias
costs more in collective latency than its replication costs in HBM. The
driver flag is ``--fsdp`` (optionally ``--fsdp_min_size``).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blvm_tpu.parallel.mesh import DATA_AXIS
from blvm_tpu.parallel.tensor_parallel import tree_shardings

# Default replication cutoff: a (96,) bias or a (1, 96, 96) 1x1 conv kernel
# stays replicated; the flagship WaveNet's (2, 96, 96) gate kernels and every
# LSTM/GRU (in+h, 4h) kernel shard. 2^14 elements = 64 KiB in f32.
DEFAULT_MIN_LEAF_ELEMS = 2**14


def _fsdp_spec(leaf, mesh: Mesh, base_spec: P, axis: str, min_leaf_elems: int) -> P:
    """Extend ``base_spec`` (the TP/PP spec already on this leaf, possibly
    empty) with ``axis`` on the largest still-unsharded dimension that
    divides evenly. Returns ``base_spec`` unchanged when no dimension fits
    or the leaf is below the replication cutoff."""
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    size = 1
    for s in shape:
        size *= s
    if ndim == 0 or size < min_leaf_elems:
        return base_spec
    axis_size = mesh.shape[axis]
    spec = tuple(base_spec) + (None,) * (ndim - len(base_spec))
    best_dim, best_len = None, 0
    for dim in range(ndim):
        if spec[dim] is not None:
            continue  # already sharded by TP/PP on this dim
        if shape[dim] % axis_size == 0 and shape[dim] > best_len:
            best_dim, best_len = dim, shape[dim]
    if best_dim is None:
        return base_spec
    new_spec = list(spec)
    new_spec[best_dim] = axis
    while new_spec and new_spec[-1] is None:  # P('x', None) != P('x')
        new_spec.pop()
    return P(*new_spec)


def fsdp_shardings(
    tree,
    mesh: Optional[Mesh] = None,
    base_rules: Optional[Sequence[Tuple[str, P]]] = None,
    axis: str = DATA_AXIS,
    min_leaf_elems: int = DEFAULT_MIN_LEAF_ELEMS,
):
    """Per-leaf ``NamedSharding`` pytree for FSDP: every large-enough leaf
    shards its largest free dimension over ``axis``, composed on top of the
    name-based ``base_rules`` (tensor-parallel specs) when given. Works on a
    params dict or a full ``TrainState`` (Adam moments mirror the parameter
    shapes, so they shard identically — that is the ZeRO point)."""
    from blvm_tpu.parallel.mesh import get_mesh

    mesh = mesh or get_mesh()
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {axis!r} axis: {mesh.axis_names}")
    base = tree_shardings(tree, mesh, base_rules or [])

    def spec_for(leaf, base_sharding):
        return NamedSharding(mesh, _fsdp_spec(leaf, mesh, base_sharding.spec, axis, min_leaf_elems))

    return jtu.tree_map(spec_for, tree, base)


def shard_train_state_fsdp(
    state,
    mesh: Optional[Mesh] = None,
    tp_rules: Optional[Sequence[Tuple[str, P]]] = None,
    min_leaf_elems: int = DEFAULT_MIN_LEAF_ELEMS,
):
    """Place a ``TrainState`` onto the mesh fully sharded over the data axis
    (params + optimizer moments), composed with tensor-parallel rules when
    the mesh also has a ``model`` axis. The jitted train step inherits the
    placement; XLA emits the param all-gathers and the gradient
    reduce-scatter.

    Side effect: flips the process-wide depthwise lowering to the SPMD-safe
    "fma" form, and the flip is STICKY — later non-fsdp work in the same
    process (e.g. a post-training eval re-init) keeps the slower lowering
    unless it restores it via ``set_depthwise_impl``/``reset`` (see
    ``modules/convolutions.py``)."""
    from blvm_tpu.modules.convolutions import set_depthwise_impl
    from blvm_tpu.parallel.mesh import get_mesh

    # fsdp shards PARAMS over the data axis — outside what the single-axis
    # grouped-conv verification covered, so force the SPMD-safe depthwise
    # lowering before the steps trace (see modules/convolutions.py).
    set_depthwise_impl("fma")
    mesh = mesh or get_mesh()
    return jax.device_put(state, fsdp_shardings(state, mesh, tp_rules, min_leaf_elems=min_leaf_elems))
