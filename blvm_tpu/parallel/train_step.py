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
import jax.numpy as jnp

from blvm_tpu.parallel.mesh import SEQ_AXIS, batch_sharding, batch_shardings, get_mesh, replicated_sharding


def _constrain_batch(batch, mesh):
    """Pin the batch's per-leaf shardings inside the traced step.

    On a 1-D/2-D mesh the jit's ``in_shardings`` force P('data') directly; a
    seq mesh needs RANK-AWARE placement (time axis over 'seq' for the x leaf,
    batch-only for the rest), which ``in_shardings`` cannot express for a
    dynamic pytree — so the step inherits the argument placement and this
    constraint re-pins it at trace time. A host/numpy batch passed without
    ``shard_batch`` is therefore still placed correctly instead of silently
    replicated (which would re-introduce the single-chip memory ceiling the
    seq axis exists to remove)."""
    shardings = batch_shardings(batch, mesh)
    return jax.tree_util.tree_map(jax.lax.with_sharding_constraint, batch, shardings)
from blvm_tpu.training.train_state import TrainState


def make_train_step(
    loss_fn: Callable,
    mesh=None,
    donate: bool = True,
    return_outputs: bool = False,
    log_norms: bool = False,
    jit: bool = True,
    accum: int = 1,
    loss_weight: Optional[Callable] = None,
    accum_unroll: bool = False,
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
        accum: number of gradient-accumulation microbatches. The batch's
            leading axis is split into ``accum`` equal row blocks, each run
            through ``loss_fn`` in a ``lax.scan``; ONE optimizer update is
            applied to the weighted-mean gradient. With the right weights the
            update is mathematically the full-batch update — the point is HBM:
            a capacity-bound model (STCN at the flagship shape: B=8 forces
            XLA spills at 170.9 ms/step, two B=4 microbatches run 2x66.0 ms —
            1.28x faster for the same global batch, NOTES.md round 3). Not a
            reference feature (it has no memory-pressure escape at all —
            its OOM answer is "use a smaller batch_len").
        accum_unroll: trace the ``accum`` microbatches as a Python-unrolled
            loop instead of a ``lax.scan``. Mathematically the same update
            (same fold_in RNG indices, same weighted sum — float-tolerance
            tested; XLA may reassociate across the two schedules, so exact
            bit equality is not guaranteed) but the independent
            microbatch forward/backward chains land in ONE XLA graph with no
            loop barrier between them, so the scheduler can interleave chain
            A's HBM waits with chain B's compute — targets the serial-chain
            latency the WaveNet roofline identifies (each (B, T, 96) op too
            small to saturate HBM alone). Costs ``accum``× the scan form's
            code size and keeps all chains' live temporaries concurrently, so
            it trades back some of the capacity relief accumulation buys —
            measure per model.
        loss_weight: ``loss_weight(microbatch, mets) -> scalar`` giving each
            microbatch's loss normalizer. Every audio model's loss is
            total_nats / total_frames, so the full-batch gradient is the
            frames-weighted mean of microbatch gradients:
            ``lambda mb, mets: mb["x_sl"].sum()``. Default: equal weights
            (exact for equal-length microbatches). Per-example metric leaves
            are re-concatenated to the full batch, so ``build_metrics`` sees
            exactly what a monolithic step would produce; scalar leaves are
            weight-averaged (exact for the loss under the same condition).
            One exception: LSTMAudio's numerator mask is clipped by the BATCH
            max length (reference parity, ``lstm.py:111-113``), so its loss is
            not batch-decomposable and accumulation deviates by the longest
            example's final partial stack (measured 0.03% over 2 epochs on
            ragged data). All other families are exact (tested for WaveNet to
            float tolerance, ``tests/parallel/test_accum.py``).

    Returns ``step(state, batch, scalars) -> (state, mets[, outputs])``.
    """
    import optax

    mesh = mesh or get_mesh()
    repl = replicated_sharding(mesh)
    has_seq = SEQ_AXIS in mesh.axis_names
    data = None if has_seq else batch_sharding(mesh)

    if accum < 1:
        raise ValueError(f"accum must be >= 1, got {accum}")
    if accum > 1 and return_outputs:
        raise ValueError("accum > 1 cannot return outputs (use the eval step for generation logging)")

    def step(state: TrainState, batch, scalars):
        if has_seq:
            batch = _constrain_batch(batch, mesh)
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum == 1:
            (loss, (mets, outputs)), grads = grad_fn(state.params, step_rng, batch, scalars)
        else:
            outputs = None
            b0 = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if b0 % accum != 0:
                raise ValueError(f"batch size {b0} not divisible by accum={accum}")
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]), batch
            )
            b_micro = b0 // accum

            def body(carry, mb):
                g_acc, w_acc, i = carry
                (loss_i, (mets_i, _)), g_i = grad_fn(state.params, jax.random.fold_in(step_rng, i), mb, scalars)
                w = jnp.float32(1.0) if loss_weight is None else jnp.asarray(loss_weight(mb, mets_i), jnp.float32)
                # a microbatch of only zero-length padding rows has w == 0 and
                # a 0/0 (NaN) normalized loss — mask instead of multiplying
                # (NaN * 0 is NaN) so padding rows can never poison the update
                safe = w > 0

                def sanitize(m):
                    m = jnp.asarray(m)
                    if m.ndim >= 1 and m.shape[0] == b_micro:
                        return m  # per-example leaf: concatenated, not averaged
                    return jnp.where(safe, m, jnp.zeros_like(m))

                mets_i = jax.tree_util.tree_map(sanitize, mets_i)
                g_acc = jax.tree_util.tree_map(lambda a, b: a + jnp.where(safe, w * b, 0.0), g_acc, g_i)
                return (g_acc, w_acc + w, i + 1), (loss_i, mets_i, w)

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            carry0 = (g0, jnp.float32(0.0), jnp.int32(0))
            if accum_unroll:
                carry, ys = carry0, []
                for i in range(accum):
                    mb = jax.tree_util.tree_map(lambda x: x[i], micro)
                    carry, y = body(carry, mb)
                    ys.append(y)
                (g_sum, w_sum, _) = carry
                (losses, mets_stacked, ws) = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ys)
            else:
                (g_sum, w_sum, _), (losses, mets_stacked, ws) = jax.lax.scan(body, carry0, micro)
            grads = jax.tree_util.tree_map(lambda g: (g / w_sum).astype(g.dtype), g_sum)

            def merge(leaf):
                # per-example leaves (leading dim == microbatch rows) -> full batch
                if leaf.ndim >= 2 and leaf.shape[1] == b_micro:
                    return leaf.reshape((accum * b_micro,) + leaf.shape[2:])
                # scalar (or non-batch) leaves -> weighted mean over microbatches
                return jnp.tensordot(ws / w_sum, leaf, axes=1)

            mets = jax.tree_util.tree_map(merge, mets_stacked)
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
    has_seq = SEQ_AXIS in mesh.axis_names
    data = None if has_seq else batch_sharding(mesh)

    def step(params, rng, batch, scalars):
        if has_seq:
            batch = _constrain_batch(batch, mesh)
        loss, (mets, outputs) = loss_fn(params, rng, batch, scalars)
        if return_outputs:
            return mets, outputs
        return mets

    return jax.jit(step, in_shardings=(None, repl, data, repl))
