"""Device mesh construction and batch sharding for data parallelism over ICI.

The reference has no working distributed training (DDP flags exist but
``torch.distributed`` is never called — SURVEY §2.8). This module is the
TPU-native replacement: a 1-D ``jax.sharding.Mesh`` over the slice's devices
with axis ``"data"``; batches are sharded along their leading (batch) axis,
parameters are replicated, and XLA inserts the gradient ``psum`` over ICI when
the jitted train step runs under these shardings. With
``model_axis_size > 1`` the mesh becomes 2-D ``(data, model)`` for tensor
parallelism (see ``parallel/tensor_parallel.py``). Multi-host execution shards
the per-host file lists by ``jax.process_index()`` (see data pipeline) and
relies on ``jax.distributed.initialize`` — no custom communication backend.
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None
_DISTRIBUTED_INITIALIZED = False

DATA_AXIS = "data"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def maybe_initialize_distributed(args=None) -> bool:
    """Join a multi-process cluster when coordinator config is present.

    Configuration sources (flags win over env vars):
      * ``--dist_coordinator host:port --dist_num_processes N
        --dist_process_id I`` on any experiment driver CLI, or
      * ``BLVM_TPU_COORDINATOR`` / ``BLVM_TPU_NUM_PROCESSES`` /
        ``BLVM_TPU_PROCESS_ID`` environment variables, or
      * ``BLVM_TPU_DIST=auto`` — bare ``jax.distributed.initialize()`` for
        TPU pods where JAX autodetects topology from cloud metadata.

    No-op (returns False) when none are set, so single-process runs are
    untouched. Idempotent; must run before the JAX backend initializes
    (the drivers call it before their first ``jax.device_count()``).
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True

    coordinator = getattr(args, "dist_coordinator", None) or os.environ.get("BLVM_TPU_COORDINATOR")
    if coordinator is not None:
        num_processes = getattr(args, "dist_num_processes", None) or int(os.environ["BLVM_TPU_NUM_PROCESSES"])
        process_id = getattr(args, "dist_process_id", None)
        if process_id is None:
            process_id = int(os.environ["BLVM_TPU_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=int(num_processes), process_id=int(process_id)
        )
        _DISTRIBUTED_INITIALIZED = True
        return True
    if os.environ.get("BLVM_TPU_DIST") == "auto":
        jax.distributed.initialize()
        _DISTRIBUTED_INITIALIZED = True
        return True
    return False


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
    model_axis_size: int = 1,
    seq_axis_size: int = 1,
    pipe_axis_size: int = 1,
) -> Mesh:
    """Create (and remember) the process-wide mesh.

    ``model_axis_size=1, seq_axis_size=1`` (default) gives the 1-D
    data-parallel mesh. ``model_axis_size > 1`` folds the devices into a
    ``(data, model)`` mesh for tensor parallelism (see
    ``parallel/tensor_parallel.py``). ``seq_axis_size > 1`` adds a ``seq``
    axis over which batches shard their TIME dimension (sequence/context
    parallelism for the conv families — GSPMD inserts the dilated-conv halo
    exchanges as small ``collective-permute``s over ICI, measured: zero
    all-gathers on the WaveNet step). ``pipe_axis_size > 1`` adds a ``pipe``
    axis over which the conv residual stacks pipeline their BLOCKS
    (GPipe-style microbatch pipelining — see
    ``parallel/pipeline_parallel.py``). Axis order is
    ``(data, seq, pipe, model)``, innermost last so TP collectives ride the
    fastest ICI loop and the pipeline's stage-to-stage ``ppermute`` rides the
    next; axes of size 1 are dropped so existing 1-D/2-D call sites are
    unchanged.
    """
    global _MESH
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    model_axis_size = model_axis_size or 1
    seq_axis_size = seq_axis_size or 1
    pipe_axis_size = pipe_axis_size or 1
    denom = model_axis_size * seq_axis_size * pipe_axis_size
    if devices.size % denom != 0:
        raise ValueError(
            f"{devices.size} devices not divisible by seq_axis_size={seq_axis_size} "
            f"x pipe_axis_size={pipe_axis_size} x model_axis_size={model_axis_size}"
        )
    shape = [devices.size // denom, seq_axis_size, pipe_axis_size, model_axis_size]
    names = [axis_name, SEQ_AXIS, PIPE_AXIS, MODEL_AXIS]
    keep = [i for i, s in enumerate(shape) if s > 1 or i == 0]  # always keep the data axis
    _MESH = Mesh(devices.reshape([shape[i] for i in keep]), tuple(names[i] for i in keep))
    return _MESH


def get_mesh() -> Mesh:
    """The process-wide mesh (create a full-device one on first use)."""
    global _MESH
    if _MESH is None:
        make_mesh()
    return _MESH


def batch_sharding(mesh: Optional[Mesh] = None, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the data axis."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


# batch-dict keys whose SECOND axis is time and may shard over the seq mesh
# axis. Only these leaves seq-shard: other rank>=2 leaves (e.g. an ASR label
# matrix (B, text_len)) have a non-time second axis that must never silently
# land on the seq axis just because its length happens to divide.
SEQ_SHARDED_KEYS = ("x",)


def _seq_size(mesh: Mesh) -> int:
    return mesh.shape[SEQ_AXIS] if SEQ_AXIS in mesh.axis_names else 1


def leaf_sharding(x, mesh: Mesh, axis_name: str = DATA_AXIS, seq: bool = True) -> NamedSharding:
    """Per-leaf batch sharding: rank 0 replicated; the leading (batch) axis
    shards over ``data``; when the mesh has a ``seq`` axis and ``seq=True``
    (the leaf is a (batch, time, ...) tensor — see ``SEQ_SHARDED_KEYS``),
    rank >= 2 leaves additionally shard their SECOND (time) axis over it — the
    time length must divide evenly (callers pad; the bucketers' length
    multiples guarantee it when ``bucket_multiple`` is a multiple of the seq
    axis size — ``run_audio_training`` validates this upfront)."""
    if x.ndim == 0:
        return replicated_sharding(mesh)
    if seq and x.ndim >= 2 and _seq_size(mesh) > 1:
        if x.shape[1] % mesh.shape[SEQ_AXIS] != 0:
            raise ValueError(
                f"time axis ({x.shape[1]}) not divisible by the seq mesh axis ({mesh.shape[SEQ_AXIS]})"
            )
        return NamedSharding(mesh, P(axis_name, SEQ_AXIS))
    return batch_sharding(mesh, axis_name)


def batch_shardings(batch, mesh: Mesh, axis_name: str = DATA_AXIS, seq_keys=SEQ_SHARDED_KEYS):
    """Pytree of per-leaf ``NamedSharding``s for a batch. On a seq mesh only
    leaves under the top-level keys in ``seq_keys`` shard their time axis;
    works on shaped tracers too (uses only ``ndim``/``shape``)."""

    def spec_for(path, x):
        key0 = getattr(path[0], "key", None) if path else None
        return leaf_sharding(x, mesh, axis_name, seq=key0 in seq_keys)

    return jax.tree_util.tree_map_with_path(spec_for, batch)


def shard_batch(batch, mesh: Optional[Mesh] = None, axis_name: str = DATA_AXIS, seq_keys=SEQ_SHARDED_KEYS):
    """Device-put a host batch pytree with batch-axis (and, on a seq mesh,
    time-axis for the ``seq_keys`` leaves) sharding.

    Scalars and rank-0 leaves are replicated. The batch size must be divisible
    by the mesh size — the batchers' ``batch_size_bucket`` guarantees this when
    set to a multiple of the mesh size.
    """
    mesh = mesh or get_mesh()
    batch = jax.tree_util.tree_map(np.asarray, batch)
    shardings = batch_shardings(batch, mesh, axis_name, seq_keys)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)


def make_global_batch(local_batch, mesh: Optional[Mesh] = None, axis_name: str = DATA_AXIS):
    """Assemble a global (process-spanning) batch from each host's local rows.

    Single-host this is equivalent to ``shard_batch``. Multi-host (after
    ``jax.distributed.initialize``) each process passes the batch rows built
    from its ``shard_examples_by_process`` slice; the result is a pytree of
    global ``jax.Array``s sharded over the data axis with only the local rows
    resident on this host. Per-host row counts must be equal — pad with
    zero-length rows (``pad_batch_to_devices``), which the models' masked
    losses ignore. Rank-0 leaves are replicated and must be identical on every
    host.
    """
    mesh = mesh or get_mesh()
    local_batch = jax.tree_util.tree_map(np.asarray, local_batch)
    shardings = batch_shardings(local_batch, mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, x), local_batch, shardings
    )


def shard_examples_by_process(examples, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Per-host shard of a file/example list for multi-host data loading.

    Each host loads a disjoint strided slice; with ``jax.distributed.initialize``
    this is the whole multi-host input pipeline (SURVEY §5.8: per-host sharded
    file lists; DCN handled transparently by JAX).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return examples[pi::pc]


def pad_batch_to_devices(x: np.ndarray, sl: np.ndarray, n_devices: int):
    """Right-pad the batch axis with zero-length rows to a multiple of n_devices."""
    B = x.shape[0]
    pad = (-B) % n_devices
    if pad == 0:
        return x, sl
    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    sl = np.concatenate([sl, np.zeros(pad, sl.dtype)])
    return x, sl
