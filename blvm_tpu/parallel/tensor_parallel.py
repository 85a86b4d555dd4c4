"""Tensor parallelism via name-based parameter partitioning over a 2-D mesh.

The reference has no model parallelism at all (its models are a few M params;
SURVEY §2.8) — this module adds it the TPU way: no model-code changes, just
``NamedSharding`` annotations on the parameter tree over a
``(data, model)`` mesh. XLA's GSPMD propagates the shardings through the
jitted train step and inserts the ICI collectives (all-gather for
column-parallel outputs, reduce-scatter/psum for row-parallel contractions)
— the scaling-book recipe: pick a mesh, annotate, let the compiler
parallelize.

Because optimizer moments (Adam ``mu``/``nu``) mirror the parameter tree,
the same path rules shard them too — sharding a ``TrainState`` with
:func:`shard_train_state` therefore also shards optimizer memory
(ZeRO-style) across the model axis for free.

Rules are ``(regex, PartitionSpec)`` pairs matched against the
``/``-joined tree path. A rule only applies when the spec rank fits the
leaf and every ``model``-sharded dimension divides evenly; otherwise the
leaf is replicated (safe fallback, never an error).
"""

import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blvm_tpu.parallel.mesh import MODEL_AXIS

# Residual-GLU blocks (blvm_tpu/models/wavenet/modules.py:Conv1dResidualGLU —
# the conv core of BOTH WaveNet and STCN):
#   gate_kernel_t/_s (k, C, C): column-parallel — shard each branch's outputs.
#   gate_bias_t/_s   (C,):      sharded with their outputs.
#   rs_kernel (1, C, Cr+Cs):    row-parallel — shard the input contraction;
#                               XLA inserts the partial-sum all-reduce over ICI.
# The gate is stored as separate tanh/sigmoid branch convs precisely so that
# tanh(a)*sigmoid(b) is shard-local: the fused (k, C, 2C) layout put the two
# halves on different shards, costing ~3 all-to-all + 2 collective-permute per
# block at tp=2 (measured on the virtual mesh). With branch params the only TP
# collective per block is the row-parallel all-reduce.
RESIDUAL_GLU_TP_RULES: List[Tuple[str, P]] = [
    (r"gate_kernel_[ts]$", P(None, None, MODEL_AXIS)),
    (r"gate_bias_[ts]$", P(MODEL_AXIS)),
    (r"rs_kernel$", P(None, MODEL_AXIS, None)),
]

# Back-compat / per-model aliases; STCN's dilated stacks reuse the same block.
WAVENET_TP_RULES = RESIDUAL_GLU_TP_RULES
STCN_TP_RULES = RESIDUAL_GLU_TP_RULES


def _key_name(key) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(key, attr):
            return str(getattr(key, attr))
    return str(key)


def _spec_fits(spec: P, leaf, mesh: Mesh) -> bool:
    if len(spec) > getattr(leaf, "ndim", 0):
        return False
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if leaf.shape[dim] % size != 0:
            return False
    return True


def tree_shardings(tree, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """Per-leaf ``NamedSharding`` tree: first matching, fitting rule wins;
    everything else replicated. Works on a params dict or a full TrainState
    (optimizer moments share the parameter path names)."""

    def spec_for(path, leaf):
        joined = "/".join(_key_name(k) for k in path)
        for pattern, spec in rules:
            if re.search(pattern, joined) and _spec_fits(spec, leaf, mesh):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jtu.tree_map_with_path(spec_for, tree)


def shard_train_state(state, mesh: Optional[Mesh] = None, rules: Sequence[Tuple[str, P]] = WAVENET_TP_RULES):
    """Place a ``TrainState`` onto the mesh with tensor-parallel parameter
    (and optimizer-moment) shardings; unmatched leaves are replicated.

    The jitted step factories (``make_train_step``) pass ``in_shardings=None``
    for the state, i.e. they inherit the argument placement — so sharding the
    state once here is all that is needed to train tensor-parallel."""
    from blvm_tpu.parallel.mesh import get_mesh

    mesh = mesh or get_mesh()
    return jax.device_put(state, tree_shardings(state, mesh, rules))
