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

import json
import os
from typing import Callable, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from blvm_tpu.parallel.mesh import DATA_AXIS, get_mesh, replicated_sharding
from blvm_tpu.parallel.train_step import make_train_step

SWEEP_STATE_STR = "multiseed_sweep.msgpack"
SWEEP_META_STR = "multiseed_sweep.json"


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

    Side effect: flips the process-wide depthwise lowering to the SPMD-safe
    "fma" form, and the flip is STICKY — later non-multiseed work in the same
    process keeps the slower lowering unless it restores it via
    ``set_depthwise_impl``/``reset`` (see ``modules/convolutions.py``).
    """
    from blvm_tpu.modules.convolutions import set_depthwise_impl

    # the seed-stacked params shard over the data axis — outside what the
    # single-axis grouped-conv verification covered, so force the SPMD-safe
    # depthwise lowering before the steps trace (see modules/convolutions.py)
    set_depthwise_impl("fma")
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
    accum: int = 1,
    loss_weight: Optional[Callable] = None,
    accum_unroll: bool = False,
):
    """Vmapped-and-sharded variant of :func:`make_train_step`.

    Returns ``step(stacked_state, batch, scalars) -> (stacked_state, mets)``
    where the state/mets leaves carry a leading seed axis sharded over
    ``data`` and the batch is replicated. The per-seed math is exactly the
    single-seed step's (same loss_fn, same optimizer chain, per-seed rng
    stream) — equivalence-tested against K independent runs.

    ``accum``/``loss_weight``/``accum_unroll`` compose gradient accumulation
    under the seed vmap (every seed runs the same microbatch split of the
    shared replicated batch; the per-seed update is exactly the single-seed
    accumulated update — tested against K independent accum runs). Useful when
    the per-seed model is itself memory-bound, or to keep the K-seed program's
    live set bounded on small meshes (per-device temp memory scales with the
    seeds-per-device × microbatch product).
    """
    mesh = mesh or get_mesh()
    _check_divisible(num_seeds, mesh)
    inner = make_train_step(
        loss_fn,
        mesh=mesh,
        jit=False,
        log_norms=log_norms,
        accum=accum,
        loss_weight=loss_weight,
        accum_unroll=accum_unroll,
    )
    vstep = jax.vmap(inner, in_axes=(0, None, None))
    repl = replicated_sharding(mesh)
    return jax.jit(
        vstep,
        in_shardings=(seed_sharding(mesh), repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def save_multiseed_sweep(directory: str, state, num_seeds: int, annealers=None, epoch=None, best_value=None):
    """Persist the FULL K-seed sweep state so ``--resume`` can continue it.

    The best-seed canonical checkpoint (saved separately by the driver) is
    portable to every non-multiseed tool, but resuming the sweep itself needs
    every seed's params + optimizer moments + rng + step — the analogue of
    the reference's K per-process wandb checkpoints
    (``blvm/utils/wandb.py:59-124``). One msgpack of the seed-stacked pytree
    plus a small json meta (num_seeds, epoch, annealer states, best value).
    """
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "step": state.step,
    }
    with open(os.path.join(directory, SWEEP_STATE_STR), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(payload)))
    meta = {
        "num_seeds": int(num_seeds),
        "epoch": int(epoch) if epoch is not None else None,
        "best_value": float(best_value) if best_value is not None else None,
        "annealer_states": {k: a.state_dict() for k, a in (annealers or {}).items()},
    }
    with open(os.path.join(directory, SWEEP_META_STR), "w") as f:
        json.dump(meta, f, indent=2)


def load_multiseed_sweep(directory: str, state, num_seeds: int, annealers=None, mesh=None):
    """Restore a sweep saved by :func:`save_multiseed_sweep` into ``state``.

    ``state`` must be a freshly-built stacked state with the same model/
    optimizer/num_seeds (it provides the byte-restore target structure).
    Returns ``(state, meta)`` with every leaf re-placed on the seed sharding.
    """
    from flax import serialization

    with open(os.path.join(directory, SWEEP_META_STR)) as f:
        meta = json.load(f)
    saved_k = int(meta.get("num_seeds") or 0)
    if saved_k != num_seeds:
        raise ValueError(
            f"--resume: sweep at {directory} was saved with --num_seeds {saved_k}, "
            f"this run uses --num_seeds {num_seeds}"
        )
    target = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "rng": jax.device_get(state.rng),
        "step": jax.device_get(state.step),
    }
    with open(os.path.join(directory, SWEEP_STATE_STR), "rb") as f:
        restored = serialization.from_bytes(target, f.read())
    restored = jax.device_put(restored, seed_sharding(mesh))
    for name, s in meta.get("annealer_states", {}).items():
        if annealers and name in annealers:
            annealers[name].load_state_dict(s)
    state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        rng=restored["rng"],
        step=restored["step"],
    )
    return state, meta


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
