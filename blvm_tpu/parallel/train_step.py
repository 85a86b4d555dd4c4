"""Jitted, sharded train/eval step factories.

One compiled function per (model, bucket shape): forward, loss, backward,
optimizer update and metric aggregation all fused by XLA, with the train state
donated (buffers reused in place in HBM). Under a data-parallel mesh the batch
arrives sharded on axis 0 and parameters replicated; XLA inserts the gradient
all-reduce over ICI automatically — this subsumes the reference's per-driver
autocast/backward/clip/step sequence (``experiment_lstm_audio.py:168-189``).

Models follow the contract ``apply({'params': p}, batch..., rngs=...) ->
(loss, mets, outputs)`` where ``mets`` is a dict of jit-safe arrays.
"""

from typing import Callable, Optional

import jax

from blvm_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
from blvm_tpu.training.train_state import TrainState


def make_train_step(
    loss_fn: Callable,
    mesh=None,
    donate: bool = True,
    return_outputs: bool = False,
    log_norms: bool = False,
    jit: bool = True,
):
    """Build a jitted sharded train step.

    Args:
        loss_fn: ``loss_fn(params, rng, batch, scalars) -> (loss, (mets, outputs))``
            where ``batch`` is a pytree of arrays (sharded on axis 0) and
            ``scalars`` a dict of traced schedule values (beta, free_nats, ...).
        mesh: data-parallel mesh; defaults to the process-wide mesh.
        donate: donate the train state (in-place HBM reuse).
        return_outputs: also return the model outputs (costs transfers; off for
            training, on for eval/generation logging).
        log_norms: add global ``grad_norm``/``param_norm`` scalars to ``mets``
            (TPU-cheap replacement for the reference's ``wandb.watch``
            gradient histograms — SURVEY §5.1; histograms would force large
            host transfers every step).
        jit: when False, return the raw python step (no jit, no sharding
            constraints, no donation) — for callers that embed the step in a
            larger traced program, e.g. a ``lax.scan`` over steps (bench.py's
            scan-chain timing mode).

    Returns ``step(state, batch, scalars) -> (state, mets[, outputs])``.
    """
    import optax

    mesh = mesh or get_mesh()
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def step(state: TrainState, batch, scalars):
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (mets, outputs)), grads = grad_fn(state.params, step_rng, batch, scalars)
        if log_norms:
            mets = dict(mets)
            mets["grad_norm"] = optax.global_norm(grads)
            mets["param_norm"] = optax.global_norm(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(rng=rng)
        if return_outputs:
            return state, mets, outputs
        return state, mets

    if not jit:
        return step
    donate_argnums = (0,) if donate else ()
    return jax.jit(
        step,
        in_shardings=(None, data, repl),
        donate_argnums=donate_argnums,
    )


def make_eval_step(loss_fn: Callable, mesh=None, return_outputs: bool = True):
    """Build a jitted sharded eval step: ``step(params, rng, batch, scalars)``."""
    mesh = mesh or get_mesh()
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def step(params, rng, batch, scalars):
        loss, (mets, outputs) = loss_fn(params, rng, batch, scalars)
        if return_outputs:
            return mets, outputs
        return mets

    return jax.jit(step, in_shardings=(None, repl, data, repl))
