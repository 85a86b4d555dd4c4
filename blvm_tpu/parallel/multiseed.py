"""Multi-seed training: K independent replicas trained in one XLA program.

TPU-native replacement for the reference's process-level run parallelism:
``experiments/schedule_experiments.py:119-131`` launches K independent
single-GPU training processes (one seed each); SURVEY §2.8 names "vmap-style
multi-seed on one slice" as the TPU-native equivalent. Here the K train
states are stacked on a leading seed axis, the per-seed step is ``jax.vmap``'d
over it, and the SEED axis is sharded over the mesh's data axis — K seeds on
K devices is exactly the reference's K processes on K GPUs, but with one data
pipeline, one compiled program, and ZERO cross-seed collectives (each seed's
forward/backward/update touches only its own devices; the batch is
replicated, so no gradient all-reduce exists at all).

Semantics: every seed consumes the SAME batch stream — seed variance is
isolated to init + rng draws (dropout/latent samples). The reference's
repeated runs also share the dataset but reshuffle independently per process;
sharing the stream is the controlled-comparison version of the same sweep.

Metrics return with a leading seed axis on every leaf; slice per seed with
:func:`slice_seed` before ``model.build_metrics``.
"""

from typing import Callable, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from blvm_tpu.parallel.mesh import DATA_AXIS, get_mesh, replicated_sharding
from blvm_tpu.parallel.train_step import make_train_step


def seed_sharding(mesh=None) -> NamedSharding:
    """Leading-axis sharding of the stacked seed dimension over ``data``."""
    return NamedSharding(mesh or get_mesh(), P(DATA_AXIS))


def _check_divisible(num_seeds: int, mesh) -> None:
    n_dev = mesh.shape[DATA_AXIS]
    if num_seeds % n_dev != 0:
        raise ValueError(
            f"num_seeds ({num_seeds}) must be a multiple of the data axis size "
            f"({n_dev}) so every device holds a whole number of seeds. For fewer "
            f"seeds than devices, shrink the mesh: pass --n_devices {num_seeds} "
            f"(or any divisor of {num_seeds}) — the remaining devices stay idle, "
            "which is what K independent reference processes on K GPUs do too"
        )


def multiseed_train_state(make_state: Callable, keys, mesh=None):
    """Stack ``make_state(key) -> TrainState`` over ``keys`` on a seed axis.

    ``make_state`` must be traceable (model.init + TrainState.create are).
    The returned state's every leaf gains a leading ``len(keys)`` axis,
    sharded over the mesh's data axis.
    """
    mesh = mesh or get_mesh()
    _check_divisible(keys.shape[0], mesh)
    return jax.jit(jax.vmap(make_state), out_shardings=seed_sharding(mesh))(keys)


def slice_seed(tree, i: int):
    """Extract seed ``i``'s pytree from a seed-stacked pytree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def make_multiseed_train_step(
    loss_fn: Callable,
    num_seeds: int,
    mesh=None,
    donate: bool = True,
    log_norms: bool = False,
):
    """Vmapped-and-sharded variant of :func:`make_train_step`.

    Returns ``step(stacked_state, batch, scalars) -> (stacked_state, mets)``
    where the state/mets leaves carry a leading seed axis sharded over
    ``data`` and the batch is replicated. The per-seed math is exactly the
    single-seed step's (same loss_fn, same optimizer chain, per-seed rng
    stream) — equivalence-tested against K independent runs.
    """
    mesh = mesh or get_mesh()
    _check_divisible(num_seeds, mesh)
    inner = make_train_step(loss_fn, mesh=mesh, jit=False, log_norms=log_norms)
    vstep = jax.vmap(inner, in_axes=(0, None, None))
    repl = replicated_sharding(mesh)
    return jax.jit(
        vstep,
        in_shardings=(seed_sharding(mesh), repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_multiseed_eval_step(loss_fn: Callable, num_seeds: int, mesh=None, return_outputs: bool = True):
    """Vmapped eval step: ``step(stacked_params, key, batch, scalars)``.

    One host key is split into per-seed keys inside the jit; batch replicated,
    params/metrics/outputs carry the leading seed axis.
    """
    mesh = mesh or get_mesh()
    _check_divisible(num_seeds, mesh)
    repl = replicated_sharding(mesh)

    def one(params, rng, batch, scalars):
        loss, (mets, outputs) = loss_fn(params, rng, batch, scalars)
        if return_outputs:
            return mets, outputs
        return mets

    def step(params, key, batch, scalars):
        keys = jax.random.split(key, num_seeds)
        return jax.vmap(one, in_axes=(0, 0, None, None))(params, keys, batch, scalars)

    return jax.jit(step, in_shardings=(seed_sharding(mesh), repl, repl, repl))
