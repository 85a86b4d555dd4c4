"""Shared experiment driver machinery.

The reference repeats a canonical structure in every ``experiment_*_audio.py``
(SURVEY §3.1): transforms → datasets → samplers → loaders → model → optimizer →
epoch loop (train steps / eval / audio logging / best-checkpoint). This module
factors that structure once, TPU-style:

  * batches are shape-bucketed and padded to the mesh size, then device_put
    with batch sharding (one compiled executable per bucket shape);
  * schedule scalars (beta, free nats, lr) enter the jitted step as traced
    values — annealing never recompiles;
  * loader threads keep the next batch ready while the device runs the step.
"""

import time
from pathlib import Path
from types import SimpleNamespace
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from blvm_tpu.data import (
    AudioLoader,
    BaseDataset,
    BucketSpec,
    Compose,
    DataLoader,
    DynamicTensorBatcher,
    LengthEvalSampler,
    LengthTrainSampler,
    MuLawDecode,
    MuLawEncode,
    RandomSegment,
)
from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.evaluation import Tracker
from blvm_tpu.parallel import (
    make_global_batch,
    make_mesh,
    make_train_step,
    make_eval_step,
    maybe_initialize_distributed,
    shard_batch,
    shard_train_state,
    slice_seed,
)
from blvm_tpu.parallel.mesh import DATA_AXIS
from blvm_tpu.parallel.mesh import pad_batch_to_devices
from blvm_tpu.settings import LOGGER, RUNS_DIRECTORY
from blvm_tpu.training import TrainState, get_optimizer, save_run
from blvm_tpu.training.optim import EpochSchedule, get_lr_schedule, set_injected_learning_rate
from blvm_tpu.utils.audio import save_wav
from blvm_tpu.utils.device import enable_persistent_compile_cache
from blvm_tpu.utils.rand import set_seed


def default_run_dir(args, script_name: str) -> Path:
    name = args.name if getattr(args, "name", None) else f"{script_name}-{int(time.time())}"
    run_dir = Path(args.run_dir) if getattr(args, "run_dir", None) else Path(RUNS_DIRECTORY) / name
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def build_transforms(args):
    """µ-law encode/decode + optional random segment cropping (training only)."""
    encode, decode = [], []
    if args.input_coding == "mu_law":
        encode.append(MuLawEncode(bits=args.num_bits))
        decode.append(MuLawDecode(bits=args.num_bits))

    if getattr(args, "random_segment_size", None):
        encode_train = Compose(RandomSegment(args.random_segment_size, seed=args.seed), *encode)
    else:
        encode_train = Compose(*encode)

    return encode_train, Compose(*encode), Compose(*decode)


def build_audio_pipeline(
    args,
    n_devices: int,
    eval_batch: str = "100s",
    eval_shuffle: bool = True,
    eval_split_bs_mult: int = 1,
    batch_len_is_seconds: bool = True,
):
    """Datasets, samplers and loaders for the standard single-modality audio task.

    The eval-sampler geometry varies per reference driver and is mirrored here:

    ========  ==================================  =========  ==============
    family    eval batch budget                   shuffle    split-eval b.s.
    ========  ==================================  =========  ==============
    lstm      100*16000 ("100s")                  True       batch_size
    wavenet   batch_len or "max" ("train")        True       batch_size*3
    vrnn      batch_len or "max"                  False      batch_size*3
    srnn      batch_len or "max"                  False      batch_size*3
    stcn      2*batch_len or "max" ("2xtrain")    True       batch_size
    cwvae     batch_len or "max"                  True       batch_size*3
    ========  ==================================  =========  ==============

    (reference ``experiment_*_audio.py`` eval-loader sections, e.g.
    ``experiment_vrnn_audio.py:149-158``). Batch geometry does not change the
    exact weighted metric aggregates, but it changes memory shape and — under
    ``--sampler_shared_rng`` — the RNG stream, so parity requires fidelity.

    Multi-host: every process runs the SAME seeded samplers over the FULL
    example list, so all hosts agree on the global batch plan (count, row
    membership, padded shapes) — the lockstep requirement of SPMD. Each host
    then materializes only its own row slice of every batch on device
    (``make_global_batch`` in :func:`run_audio_training`). This deviates from
    a per-host ``shard_examples_by_process`` split of the example list on
    purpose: independent per-host length-packing would produce differing
    batch counts (deadlock at the first collective) and a global batch
    composition that differs from the single-process run, breaking exact
    loss parity. Host-side decode IO is duplicated ``process_count``-fold;
    acceptable because audio decode is ~100x faster than a train step and
    overlapped by the loader threads.
    """
    maybe_initialize_distributed(args)
    # (round-3 forced --num_workers 0 here: RandomSegment drew from a shared
    # sequential RNG, so loader threads could desync hosts' crop positions.
    # Crops are now a pure function of (seed, example_id, epoch) —
    # transforms.RandomSegment — so threaded loading is multi-host-safe.)
    dataset = DATASETS[args.dataset]
    encode_train, encode_eval, decode = build_transforms(args)

    # --sampler_shared_rng: one RNG shared by all samplers in construction
    # order — reproduces the reference's global-random stream (its samplers
    # draw from python's global `random`; reference length_samplers.py:149,166)
    import random as _random

    sampler_seed = _random.Random(args.seed) if getattr(args, "sampler_shared_rng", False) else args.seed

    bucket = BucketSpec(mode="multiple", multiple=args.bucket_multiple)
    batch_bucket = BucketSpec(mode="pow2", base=max(args.batch_size_bucket_base, n_devices))

    batcher = lambda: DynamicTensorBatcher(axis=-1, bucket=bucket, batch_size_bucket=batch_bucket)
    modalities_train = [(AudioLoader(dataset.audio_ext), encode_train, batcher())]
    modalities_test = [(AudioLoader(dataset.audio_ext), encode_eval, batcher())]

    train_dataset = BaseDataset(source=dataset.train, modalities=modalities_train)
    resolved_batch_len = None
    if args.batch_len:
        # reference CLI semantics (experiment_wavenet_audio.py:63): a float is
        # SECONDS (x16000); an int (only reachable via set_defaults — argparse
        # parses every numeric CLI value as float) is samples. Log the resolved
        # budget: passing e.g. "128000" means 128000 SECONDS and will OOM.
        # EXCEPTION (batch_len_is_seconds=False): the reference STCN driver
        # never applies the conversion — its --batch_len is raw samples
        # (experiment_stcn_audio.py has no 16000* line; all five other drivers
        # do). Kept bug-for-bug so STCN run specs transfer unchanged.
        if batch_len_is_seconds:
            batch_len = 16000 * args.batch_len if isinstance(args.batch_len, float) else args.batch_len
        else:
            batch_len = args.batch_len
        resolved_batch_len = batch_len
        LOGGER.info(f"train batch budget: {batch_len:,.0f} timesteps (batch_len={args.batch_len!r})")
        train_sampler = LengthTrainSampler(
            source=dataset.train,
            field=dataset.audio_length,
            batch_len=batch_len,
            max_pool_difference=16000 * 0.3,
            min_pool_size=512,
            seed=sampler_seed,
        )
    else:
        train_sampler = LengthEvalSampler(
            source=dataset.train, field=dataset.audio_length, batch_size=args.batch_size, shuffle=True, seed=sampler_seed
        )
    train_loader = DataLoader(train_dataset, batch_sampler=train_sampler, num_workers=args.num_workers)

    valid_test_loaders = {}
    if getattr(args, "split_eval", False) and args.batch_size > 0:
        batch_kwarg = dict(batch_size=args.batch_size * eval_split_bs_mult)
    elif eval_batch == "100s":
        batch_kwarg = dict(batch_len=100 * 16000)
    elif eval_batch == "train":
        batch_kwarg = dict(batch_len=resolved_batch_len or "max")
    elif eval_batch == "2xtrain":
        batch_kwarg = dict(batch_len=2 * resolved_batch_len if resolved_batch_len else "max")
    else:
        raise ValueError(f"unknown eval_batch spec {eval_batch!r}")
    for source_name in [*dataset.valid_sets, *dataset.test_sets]:
        valid_dataset = BaseDataset(source=source_name, modalities=modalities_test)
        valid_sampler = LengthEvalSampler(
            source=source_name, field=dataset.audio_length, shuffle=eval_shuffle, seed=sampler_seed, **batch_kwarg
        )
        valid_test_loaders[source_name] = DataLoader(
            valid_dataset, batch_sampler=valid_sampler, num_workers=args.num_workers
        )

    return SimpleNamespace(
        dataset=dataset,
        train_loader=train_loader,
        valid_test_loaders=valid_test_loaders,
        decode_transform=decode,
    )


def build_tx_and_lr(args):
    """Resolve ``(tx, lr, epoch_lr)`` from the optimizer/scheduler flags.

    torch-named schedulers are EPOCH-denominated — the reference steps them
    once per epoch (``experiment_lstm_audio.py:258``) — so they resolve to an
    :class:`EpochSchedule` and the learning rate enters the optimizer as an
    optax injected hyperparameter the host moves between epochs
    (``set_injected_learning_rate``; shape/dtype/sharding preserved — no
    recompile). optax-named schedules stay per-optimizer-step inside the jit.
    """
    import optax

    lr = get_lr_schedule(args.lr_scheduler, args.lr, **args.lr_scheduler_kwargs) if args.lr_scheduler else args.lr
    epoch_lr = lr if isinstance(lr, EpochSchedule) else None
    opt_kwargs = dict(
        clip_grad_norm=None if args.max_grad_norm == float("inf") else args.max_grad_norm,
        clip_grad_value=None if args.max_grad_value == float("inf") else args.max_grad_value,
        skip_nonfinite_updates=getattr(args, "skip_nonfinite_updates", False),
        **args.optimizer_kwargs,
    )
    if epoch_lr is not None:
        tx = optax.inject_hyperparams(
            lambda learning_rate: get_optimizer(args.optimizer, learning_rate, **opt_kwargs)
        )(learning_rate=epoch_lr.init_value)
    else:
        tx = get_optimizer(args.optimizer, lr, **opt_kwargs)
    return tx, lr, epoch_lr


def step_epoch_lr(state, epoch_lr, epoch: int, current_lr):
    """Apply an :class:`EpochSchedule` for ``epoch``; returns ``(state, lr)``."""
    new_lr = epoch_lr.lr_at_epoch(epoch)
    if new_lr != current_lr:
        state = state.replace(opt_state=set_injected_learning_rate(state.opt_state, new_lr))
    return state, new_lr


def make_scalar_schedules(annealers: Dict[str, object]):
    """Step all annealers once and return the traced-scalar dict for the jit step."""

    def step_schedules():
        # np (not jnp) scalars: uncommitted host values the jitted step places
        # per its replicated in_sharding — on multi-host meshes an eagerly
        # device-committed scalar would conflict with the global device set
        return {name: np.float32(a.step()) for name, a in annealers.items()}

    return step_schedules


class PrefetchedDeviceBatches:
    """Iterate a train loader, padding + device-placing each batch ``depth``
    steps ahead so the host→device transfer overlaps the previous steps'
    compute (``jax.device_put`` is async; issuing it at use time still puts
    its latency on the critical path between dispatches). Yields
    ``(device_batch, metadata)``; keeps the loader's ``__len__`` so the
    tracker's progress totals are unchanged."""

    def __init__(self, loader, make_device_batch: Callable, depth: int = 2):
        self.loader, self.make_device_batch, self.depth = loader, make_device_batch, max(1, depth)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        buf = []
        for (x, x_sl), metadata in self.loader:
            buf.append((self.make_device_batch(x, x_sl), metadata))
            if len(buf) >= self.depth:
                yield buf.pop(0)
        yield from buf


class DeferredMetrics:
    """Fetch step metrics ``lag`` steps late so the per-step ``device_get``
    never stalls the TPU async-dispatch pipeline.

    The reference's loop implicitly syncs once per step (``.item()`` on CUDA);
    doing the same on TPU serializes dispatch — the host waits a full
    step + round-trip before launching the next step, so host/dispatch latency
    is added to every step instead of being hidden by the pipeline (measured
    on the v5e relay: 105 ms/step driver vs 46 ms for the same program in
    bench.py's async chain). Holding the metric pytrees on device and fetching
    the step-``i-lag`` result while steps ``i-lag+1..i`` are in flight keeps
    the device busy; exactness is untouched — every step's metrics are
    consumed before the tracker's epoch snapshot (``flush`` runs inside
    ``Tracker.steps(before_unset=...)``) and the running means are
    order-independent exact weighted merges.
    """

    def __init__(self, fetch: Callable, consume: Callable, lag: int):
        self.fetch, self.consume, self.lag = fetch, consume, max(0, lag)
        self._pending = []

    def push(self, mets) -> None:
        self._pending.append(mets)
        while len(self._pending) > self.lag:
            self.consume(self.fetch(self._pending.pop(0)))

    def flush(self) -> None:
        # one batched fetch for the whole queue (a list of metric pytrees is
        # itself a pytree): the epoch-end drain costs one device round-trip
        # instead of ``lag`` serial ones
        pending, self._pending = self._pending, []
        if pending:
            for mets_host in self.fetch(pending):
                self.consume(mets_host)


def run_audio_training(
    args,
    model,
    pipeline,
    loss_fn: Callable,
    annealers: Optional[Dict[str, object]] = None,
    best_metric_name: str = "loss",
    script_name: str = "experiment",
    state_carry_eval: Optional[Callable] = None,
    post_eval_hook: Optional[Callable] = None,
    tp_rules=None,
    iw_kwargs: Optional[Dict] = None,
    seq_parallel_ok: bool = False,
    pp_adapter_factory: Optional[Callable] = None,
    eval_offset: int = 0,
):
    """The canonical training loop (reference ``experiment_lstm_audio.py:140-257``).

    Args:
        loss_fn: ``loss_fn(params, rng, batch, scalars) -> (loss, (mets, outputs))``.
        annealers: name → Annealer stepped once per training step; values are
            passed to ``loss_fn`` through ``scalars``.
        best_metric_name: eval metric gating checkpoint saving (min is best).
        state_carry_eval: optional ``f(eval_step, params, rng, x, x_sl, scalars,
            tracker, source)`` implementing chunked split-eval with state carry.
        tp_rules: optional tensor-parallel partition rules (see
            ``blvm_tpu/parallel/tensor_parallel.py``); with
            ``--model_axis_size > 1`` the mesh becomes 2-D ``(data, model)``
            and the train state is sharded per the rules.
        iw_kwargs: extra ``model.apply`` kwargs for the ``--eval_iw_samples``
            importance-weighted bound (e.g. CWVAE needs
            ``pad_strideable=True``).
        pp_adapter_factory: ``f(n_stages, n_micro) -> adapter`` building a
            pipeline-parallel adapter (``parallel/pipeline_parallel.py``);
            with ``--pipeline_axis_size > 1`` the mesh gains a ``pipe`` axis,
            training runs the adapter's GPipe loss over pipeline-layout
            params, and eval/checkpoints convert back to the canonical layout
            (checkpoints stay portable to non-pipelined runs; the optimizer
            moments are saved in pipeline layout, so ``--resume`` must keep
            the same ``--pipeline_axis_size``).
    """
    enable_persistent_compile_cache()
    # multi-host: join the cluster BEFORE touching devices; afterwards
    # jax.devices() spans all hosts and the mesh below is global. Every host
    # runs this same driver (SPMD single-program); host-side effects (JSONL,
    # wandb, wav logging, checkpoints) happen on process 0 only.
    maybe_initialize_distributed(args)
    process_count = jax.process_count()
    process_index = jax.process_index()
    is_main = process_index == 0

    run_dir = default_run_dir(args, script_name)
    root_key = set_seed(args.seed)

    model_axis_size = getattr(args, "model_axis_size", 1) or 1
    if model_axis_size > 1 and tp_rules is None:
        raise ValueError("--model_axis_size > 1 requires this experiment to provide tensor-parallel rules")
    seq_axis_size = getattr(args, "seq_axis_size", 1) or 1
    if seq_axis_size > 1 and not seq_parallel_ok:
        # recurrent scan cores consume time sequentially — sharding T would
        # just make GSPMD gather it back every scan step. Families whose
        # full-T compute is convolutional (WaveNet/STCN/CWVAE) opt in.
        raise ValueError("--seq_axis_size > 1 is only supported by the conv experiments (WaveNet, STCN, CWVAE)")
    if seq_axis_size > 1 and getattr(args, "split_eval", False) and state_carry_eval is not None:
        LOGGER.warning("sequence parallelism: --split_eval unsupported, falling back to whole-sequence eval")
        state_carry_eval = None
    if seq_axis_size > 1:
        # fail BEFORE dataset scan + compile: every batch's time length is a
        # multiple of the bucket length (and of the segment size when set), so
        # these divisibility checks are exactly the leaf_sharding invariant
        for flag in ("bucket_multiple", "random_segment_size"):
            val = getattr(args, flag, None)
            if val and int(val) % seq_axis_size != 0:
                raise ValueError(
                    f"--{flag} ({val}) must be divisible by --seq_axis_size ({seq_axis_size}) "
                    "so batch time lengths split evenly over the seq mesh axis"
                )
    pipe_axis_size = int(getattr(args, "pipeline_axis_size", 1) or 1)
    pp_adapter = None
    if pipe_axis_size > 1:
        if pp_adapter_factory is None:
            raise ValueError(
                "--pipeline_axis_size > 1 is only supported by the conv-stack experiments (WaveNet, STCN)"
            )
        # pp x tp composes: the GPipe shard_map is manual over (data, seq,
        # pipe) and leaves 'model' automatic, so GSPMD tensor-parallelizes
        # each stage's block math from the PIPELINE_PP_TP_RULES shardings
        # pp x sp composes: the adapters turn time shards into overlap-window
        # batch rows (parallel/pipeline_parallel.py:seq_windows) sharded over
        # the (data, seq) mesh axes — depth AND time sharded together, the
        # combination the capacity-bound STCN needs (NOTES.md roofline)
        if int(getattr(args, "accum_steps", 1) or 1) > 1:
            raise ValueError("pipeline parallelism microbatches internally — use --pipeline_microbatches, not --accum_steps")
        if getattr(args, "split_eval", False) and state_carry_eval is not None:
            LOGGER.warning("pipeline parallelism: --split_eval unsupported, falling back to whole-sequence eval")
            state_carry_eval = None
        pp_adapter = pp_adapter_factory(pipe_axis_size, int(getattr(args, "pipeline_microbatches", 4) or 1))
    # --num_seeds N: N independent replicas vmapped over a seed axis that is
    # sharded over the data axis (parallel/multiseed.py) — the one-program
    # form of the reference's schedule_experiments.py process-per-seed sweep.
    num_seeds = int(getattr(args, "num_seeds", 1) or 1)
    if num_seeds > 1:
        incompatible = {
            "--model_axis_size": model_axis_size > 1,
            "--seq_axis_size": seq_axis_size > 1,
            "--pipeline_axis_size": pipe_axis_size > 1,
            "--fsdp": bool(getattr(args, "fsdp", False)),
            "multi-host": process_count > 1,
        }
        bad = [k for k, v in incompatible.items() if v]
        if bad:
            raise ValueError(f"--num_seeds > 1 does not compose with {', '.join(bad)}")
        if getattr(args, "split_eval", False) and state_carry_eval is not None:
            LOGGER.warning("multi-seed: --split_eval unsupported, falling back to whole-sequence eval")
            state_carry_eval = None
    mesh = make_mesh(
        args.n_devices,
        model_axis_size=model_axis_size,
        seq_axis_size=seq_axis_size,
        pipe_axis_size=pipe_axis_size,
    )
    # batches shard over the data axis only; pad the batch to its size
    n_devices = mesh.shape[DATA_AXIS]
    # gradient accumulation: train batches must also split into accum_steps
    # equal row blocks, so they are padded to a multiple of both (the extra
    # rows are zero-length — the bucket-invariant losses ignore them and the
    # accumulated step masks all-padding microbatches, train_step.py)
    accum_steps = int(getattr(args, "accum_steps", 1) or 1)
    # pipelined steps split each data shard into pipeline microbatches instead
    batch_multiple = n_devices * (pp_adapter.n_micro if pp_adapter is not None else accum_steps)
    LOGGER.info(f"mesh: {dict(mesh.shape)}; accum_steps: {accum_steps}; run dir: {run_dir}")

    if process_count > 1:
        if n_devices % process_count != 0:
            raise ValueError(f"data axis ({n_devices}) must be divisible by process count ({process_count})")
        if getattr(args, "split_eval", False) and state_carry_eval is not None:
            # the chunked-eval callbacks jit locally against global params —
            # unsupported combination; whole-sequence eval is always correct
            LOGGER.warning("multi-host: --split_eval unsupported, falling back to whole-sequence eval")
            state_carry_eval = None

    def fetch_mets(mets):
        """Host copies of step metrics. Single-process: plain device_get.
        Multi-host: per-example leaves (log_prob, x_sl, per-layer KLs) are
        batch-sharded global arrays spanning other hosts' devices —
        all-gather them (a tiny collective all hosts reach in lockstep, B
        floats per step) so the exact weighted-mean metric semantics are
        preserved; replicated leaves (loss) read from the local replica."""
        if process_count == 1:
            return jax.device_get(mets)
        from jax.experimental import multihost_utils

        def fetch(a):
            if not isinstance(a, jax.Array) or a.is_fully_addressable:
                return jax.device_get(a)
            if a.sharding.is_fully_replicated:
                return np.asarray(a.addressable_shards[0].data)
            return multihost_utils.process_allgather(a, tiled=True)

        return jax.tree_util.tree_map(fetch, mets)

    def make_device_batch(x, x_sl):
        """Pad to the global mesh, then device-put: single-process via
        shard_batch; multi-host each process contributes its contiguous row
        block of the (identical, deterministically planned) global batch."""
        if num_seeds > 1:
            # every seed consumes the same batch — replicate instead of
            # sharding (the SEED axis is what lives on the mesh). Still pad
            # the rows to the bucket multiple: each distinct loader batch size
            # would otherwise compile a new (expensive) K-seed executable
            from blvm_tpu.parallel import replicated_sharding

            x, x_sl = pad_batch_to_devices(x, x_sl, batch_multiple)
            return jax.device_put({"x": jnp.asarray(x), "x_sl": jnp.asarray(x_sl)}, replicated_sharding(mesh))
        x, x_sl = pad_batch_to_devices(x, x_sl, batch_multiple)
        if process_count == 1:
            return shard_batch({"x": x, "x_sl": x_sl}, mesh)
        rows = x.shape[0] // process_count
        block = slice(process_index * rows, (process_index + 1) * rows)
        return make_global_batch({"x": x[block], "x_sl": x_sl[block]}, mesh)

    annealers = annealers or {}
    schedules = make_scalar_schedules(annealers)

    # one warmup batch to initialize parameters
    (x0, x0_sl), _ = next(iter(pipeline.train_loader))
    x0, x0_sl = pad_batch_to_devices(x0, x0_sl, batch_multiple)
    params_key, rng_key = jax.random.split(root_key)
    # init inside jit: eager op-by-op initialization would trigger one device
    # compilation per op (catastrophic for the 50-layer conv stacks)
    x0_j, x0_sl_j = jnp.asarray(x0), jnp.asarray(x0_sl)

    from blvm_tpu.models.base import count_parameters

    tx, lr, epoch_lr = build_tx_and_lr(args)

    if num_seeds > 1:
        from blvm_tpu.parallel import multiseed_train_state, slice_seed

        def _make_state(k):
            kp, kr = jax.random.split(k)
            v = model.init({"params": kp, "sample": jax.random.PRNGKey(0)}, x0_j, x0_sl_j)
            return TrainState.create(apply_fn=model.apply, params=v["params"], tx=tx, rng=kr)

        state = multiseed_train_state(_make_state, jax.random.split(params_key, num_seeds), mesh)
        LOGGER.info(
            f"model parameters: {count_parameters(state.params) // num_seeds:,} × {num_seeds} seeds"
        )
    else:
        variables = jax.jit(
            lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(0)}, x0_j, x0_sl_j)
        )(params_key)
        LOGGER.info(f"model parameters: {count_parameters(variables['params']):,}")
        init_params = variables["params"]
        # --init_checkpoint: start from saved parameters (fresh optimizer) —
        # e.g. weights transplanted from the torch reference by the
        # convergence parity harness, or a fine-tune from a trained run
        init_ckpt = getattr(args, "init_checkpoint", None)
        if init_ckpt:
            import os

            from flax import serialization

            path = init_ckpt if init_ckpt.endswith(".msgpack") else os.path.join(init_ckpt, "model_params.msgpack")
            with open(path, "rb") as f:
                init_params = serialization.from_bytes(init_params, f.read())
            init_params = jax.tree_util.tree_map(jnp.asarray, init_params)
            LOGGER.info(f"initialized parameters from {path}")
        if pp_adapter is not None:
            # training runs on the pipeline parameter layout (stage-stacked blocks)
            init_params = pp_adapter.to_pipeline(init_params)
        state = TrainState.create(apply_fn=model.apply, params=init_params, tx=tx, rng=rng_key)

    # --resume RUN_DIR: restore params + optimizer state + annealer states +
    # step from a saved run (reference resumes via manual wandb restore —
    # utils/wandb.py:59-124; here the run dir is the system of record)
    resume_dir = getattr(args, "resume", None)
    start_epoch = 0
    resume_best_multiseed = None
    if resume_dir and num_seeds > 1:
        # multi-seed resume: restore the FULL K-seed sweep state (every seed's
        # params/moments/rng/step) saved by save_multiseed_sweep — the analogue
        # of resuming all K reference processes of a schedule_experiments sweep
        from blvm_tpu.parallel import load_multiseed_sweep

        state, ms_meta = load_multiseed_sweep(resume_dir, state, num_seeds, annealers=annealers, mesh=mesh)
        start_epoch = int(ms_meta.get("epoch") or 0)
        resume_best_multiseed = ms_meta.get("best_value")
        LOGGER.info(
            f"Resumed {num_seeds}-seed sweep from {resume_dir}: epoch {start_epoch}, "
            f"step {int(jax.device_get(state.step)[0])}"
        )
    elif resume_dir:
        from blvm_tpu.training import load_run

        _, params_r, opt_state_r, meta = load_run(
            resume_dir, model_class=type(model), tx=tx, annealers=annealers, raise_errors=False,
            # PP saves the optimizer state over the stage-stacked layout
            opt_state_params_fn=pp_adapter.to_pipeline if pp_adapter is not None else None,
        )
        if pp_adapter is not None:
            # checkpoints store canonical-layout params (portable); the opt
            # state was saved in pipeline layout, so it restores directly as
            # long as --pipeline_axis_size is unchanged
            params_r = pp_adapter.to_pipeline(params_r)
        state = state.replace(params=params_r)
        if opt_state_r is not None:
            state = state.replace(opt_state=opt_state_r)
        elif pp_adapter is not None:
            LOGGER.warning(
                "optimizer state not restored — when resuming a pipelined run, "
                "--pipeline_axis_size must match the saved run's value (the Adam "
                "moments are stored over the stage-stacked layout)"
            )
        if meta.get("step") is not None:
            state = state.replace(step=int(meta["step"]))
        start_epoch = int(meta.get("epoch") or 0)
        LOGGER.info(f"Resumed from {resume_dir}: epoch {start_epoch}, step {int(state.step)}")

    if getattr(args, "fsdp", False):
        # FSDP (ZeRO-3): params + Adam moments shard over the data axis,
        # composed with the tensor-parallel rules when tp is also active
        # (parallel/fsdp.py). GSPMD all-gathers params on use and
        # reduce-scatters gradients; per-device state memory scales 1/dp.
        from blvm_tpu.parallel import DEFAULT_MIN_LEAF_ELEMS, shard_train_state_fsdp

        base_rules = tp_rules if model_axis_size > 1 else None
        if pp_adapter is not None:
            # pp x fsdp: the stage-stacked block params (and their Adam
            # moments) keep their leading stage axis on ``pipe`` and
            # additionally shard a free dim over ``data``; non-stage leaves
            # (embedding/heads/latent hierarchy) shard over ``data`` alone.
            # GSPMD all-gathers the data shards at use inside the pipelined
            # step (tests/parallel/test_fsdp.py::test_wavenet_fsdp_composes_with_pipeline)
            from blvm_tpu.parallel import PIPELINE_PP_RULES
            from blvm_tpu.parallel.pipeline_parallel import PIPELINE_PP_TP_RULES

            base_rules = PIPELINE_PP_TP_RULES if model_axis_size > 1 else PIPELINE_PP_RULES
        min_size = getattr(args, "fsdp_min_size", None)
        state = shard_train_state_fsdp(
            state,
            mesh,
            tp_rules=base_rules,
            min_leaf_elems=DEFAULT_MIN_LEAF_ELEMS if min_size is None else int(min_size),
        )
    elif pp_adapter is not None:
        from blvm_tpu.parallel import PIPELINE_PP_RULES
        from blvm_tpu.parallel.pipeline_parallel import PIPELINE_PP_TP_RULES

        # stage params + their Adam moments land sharded over the pipe axis;
        # with tp also active the channel dims additionally shard over 'model'
        state = shard_train_state(
            state, mesh, PIPELINE_PP_TP_RULES if model_axis_size > 1 else PIPELINE_PP_RULES
        )
    elif model_axis_size > 1:
        state = shard_train_state(state, mesh, tp_rules)

    log_norms = bool(getattr(args, "log_norms", False))
    train_loss_fn = pp_adapter.make_loss_fn(mesh) if pp_adapter is not None else loss_fn
    # eval always runs the standard (canonical-layout) forward; under pipeline
    # parallelism the stage-stacked params are converted back once per eval
    _pp_from_pipeline = jax.jit(pp_adapter.from_pipeline) if pp_adapter is not None else None
    if num_seeds > 1:
        from blvm_tpu.parallel import make_multiseed_eval_step, make_multiseed_train_step

        train_step = make_multiseed_train_step(
            loss_fn,
            num_seeds,
            mesh=mesh,
            log_norms=log_norms,
            accum=accum_steps,
            loss_weight=(lambda mb, mets: mb["x_sl"].sum()) if accum_steps > 1 else None,
            accum_unroll=bool(getattr(args, "accum_unroll", False)),
        )
        eval_step = make_multiseed_eval_step(loss_fn, num_seeds, mesh=mesh)
    else:
        train_step = make_train_step(
            train_loss_fn,
            mesh=mesh,
            log_norms=log_norms,
            accum=accum_steps,
            # every audio model's loss is total_nats / total_frames, so microbatch
            # gradients merge exactly when weighted by frames (train_step.py)
            loss_weight=(lambda mb, mets: mb["x_sl"].sum()) if accum_steps > 1 else None,
            accum_unroll=bool(getattr(args, "accum_unroll", False)),
        )
        eval_step = make_eval_step(loss_fn, mesh=mesh)

    # optional importance-weighted bound at eval time (tighter than the ELBO;
    # blvm_tpu addition — evaluation/bounds.py). K forward passes under
    # lax.map inside one jit; reported as bits/frame like the primary metric.
    eval_iw_samples = int(getattr(args, "eval_iw_samples", 0) or 0)
    if eval_iw_samples > 0:
        from functools import partial

        from blvm_tpu.evaluation.bounds import model_iw_bound
        from blvm_tpu.evaluation.metrics import BitsPerDimMetric

        if num_seeds > 1:
            # per-seed bounds: vmap over the stacked params with per-seed keys
            # -> (K, B); consumed per seed source below
            @partial(jax.jit, static_argnames=("num_samples",))
            def iw_step(params, key, x, x_sl, num_samples):
                keys = jax.random.split(key, num_seeds)
                return jax.vmap(
                    lambda p, k: model_iw_bound(model, p, x, x_sl, k, num_samples, **(iw_kwargs or {}))
                )(params, keys)
        else:
            @partial(jax.jit, static_argnames=("num_samples",))
            def iw_step(params, key, x, x_sl, num_samples):
                return model_iw_bound(model, params, x, x_sl, key, num_samples, **(iw_kwargs or {}))

    if process_count > 1:
        LOGGER.info(
            "multi-host: checkpoint/JSONL/wav writes run on process 0 only; the IW bound and "
            "reconstruction logging run globally (sharded eval outputs are all-gathered to every host)"
        )
    tracker = Tracker(
        # process 0 is the system of record; other hosts keep metrics in
        # memory (identical values — they are psum'd globals) but write nothing
        jsonl_path=str(run_dir / "metrics.jsonl") if is_main else None,
        use_wandb=is_main and getattr(args, "mode", None) not in (None, "disabled"),
        debug_epoch_break_steps=args.debug_epoch_break_steps or float("inf"),
    )
    tracker.epoch = start_epoch  # epochs() resumes from epoch+1

    dataset = pipeline.dataset
    eval_key = jax.random.PRNGKey(args.seed + 1)
    build_metrics = model.build_metrics
    # best-seed eval metric seen so far (num_seeds > 1); carried across --resume
    best_multiseed_value = resume_best_multiseed

    # optional device profiling of the first training epoch (SURVEY §5.1:
    # tracker step telemetry + jax.profiler trace hooks)
    profile_dir = getattr(args, "profile_dir", None)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    metric_fetch_lag = max(0, getattr(args, "metric_fetch_lag", 0))

    current_lr = float(epoch_lr.init_value) if epoch_lr is not None else None
    for epoch in tracker.epochs(args.epochs):
        # epoch-denominated lr schedule: set the injected hyperparameter for
        # this epoch (shape/dtype/sharding-preserving — no step recompile)
        if epoch_lr is not None:
            state, current_lr = step_epoch_lr(state, epoch_lr, epoch, current_lr)
        # fresh (but deterministic) random-transform draws this epoch
        pipeline.train_loader.dataset.set_epoch(epoch)
        # ------------------------------------------------------------- training
        last_norms = {}

        def consume_train_mets(mets_host):
            nonlocal last_norms
            if num_seeds > 1:
                if log_norms:
                    # seed-stacked (K,) norm vectors: one scalar per seed
                    # source, exactly what K reference processes would log
                    mets_host = dict(mets_host)
                    gn, pn = mets_host.pop("grad_norm"), mets_host.pop("param_norm")
                    last_norms = {}
                    for i in range(num_seeds):
                        last_norms[f"grad_norm[s{i}]"] = float(gn[i])
                        last_norms[f"param_norm[s{i}]"] = float(pn[i])
                # every metric leaf carries a leading seed axis; one tracker
                # source per seed (exactly what N reference processes log)
                for i in range(num_seeds):
                    tracker.update(build_metrics(slice_seed(mets_host, i)), source=f"{dataset.train}[s{i}]")
                return
            if log_norms:
                last_norms = {k: float(mets_host.pop(k)) for k in ("grad_norm", "param_norm")}
            tracker.update(build_metrics(mets_host))

        deferred = DeferredMetrics(fetch_mets, consume_train_mets, metric_fetch_lag)
        train_batches = PrefetchedDeviceBatches(
            pipeline.train_loader, make_device_batch, depth=max(1, getattr(args, "device_prefetch_depth", 2))
        )
        for batch, metadata in tracker.steps(
            train_batches, source=dataset.train, before_unset=deferred.flush
        ):
            scalars = schedules()
            state, mets = train_step(state, batch, scalars)
            # defer the host fetch: the loader threads keep the next batch
            # ready (device-placed ``depth`` ahead) and the dispatch pipeline
            # keeps the device busy while the lag-old metrics are pulled
            deferred.push(mets)

        # ------------------------------------------------------------------ eval
        # eval_offset matches each reference driver's cadence: 0 for
        # LSTM/SRNN/CWVAE (`epoch % test_every`, experiment_lstm_audio.py:196),
        # 1 for WaveNet/VRNN/STCN (`(epoch-1) % test_every`,
        # experiment_vrnn_audio.py:239 — first eval after epoch 1)
        extra = dict()
        if ((epoch - eval_offset) % args.test_every) == 0:
            outputs = None
            eval_params = _pp_from_pipeline(state.params) if pp_adapter is not None else state.params
            # eval uses the forward DEFAULTS (beta=1, free_nats=0) — the true
            # ELBO — like every reference driver's eval call (`model(x, x_sl)`
            # with no annealer kwargs, e.g. experiment_vrnn_audio.py:245);
            # caught by the convergence parity harness: passing the current
            # annealer values here logged eval beta=0.02 vs the reference's 1.0
            scalars = {name: np.float32(1.0 if name == "beta" else 0.0) for name in annealers}
            for source_name, loader in pipeline.valid_test_loaders.items():
                if num_seeds > 1:
                    def _consume_eval(m, s=source_name):
                        for i in range(num_seeds):
                            tracker.update(build_metrics(slice_seed(m, i)), source=f"{s}[s{i}]")
                else:
                    def _consume_eval(m, s=source_name):
                        tracker.update(build_metrics(m), source=s)

                eval_deferred = DeferredMetrics(fetch_mets, _consume_eval, metric_fetch_lag)
                for (x, x_sl), metadata in tracker.steps(
                    loader, source=source_name, before_unset=eval_deferred.flush
                ):
                    eval_key, sub = jax.random.split(eval_key)
                    if getattr(args, "split_eval", False) and state_carry_eval is not None:
                        # chunked split-eval; the callback may return the last
                        # chunk's outputs so reconstruction logging still works
                        # (the reference logs reconstructions after split-eval
                        # too — experiment_srnn_audio.py:271-279)
                        x, x_sl = pad_batch_to_devices(x, x_sl, n_devices)
                        ret = state_carry_eval(eval_step, eval_params, sub, x, x_sl, scalars, tracker, source_name)
                        if ret is not None:
                            outputs = ret
                    else:
                        batch = make_device_batch(x, x_sl)
                        mets, outputs = eval_step(eval_params, sub, batch, scalars)
                        # eval passes share no state, so the dispatch pipeline
                        # can run several ahead while lag-old metrics are pulled
                        eval_deferred.push(mets)
                    if eval_iw_samples > 0:
                        # the IW bound runs on the unchunked sequence in both
                        # eval modes: it is forward-only (no stored activations
                        # for backward), so split-eval's memory motivation does
                        # not apply and the bound keeps its exact semantics.
                        # Multi-host: the bound runs on the GLOBAL device batch
                        # (not a local re-put — mixing local arrays with global
                        # params would fail) and the per-example results are
                        # all-gathered by fetch_mets, like any other metric.
                        eval_key, sub_iw = jax.random.split(eval_key)
                        iw_batch = batch if not (getattr(args, "split_eval", False) and state_carry_eval is not None) else make_device_batch(x, x_sl)
                        bound = fetch_mets(
                            iw_step(eval_params, sub_iw, iw_batch["x"], iw_batch["x_sl"], eval_iw_samples)
                        )
                        x_sl_h = np.asarray(x_sl)
                        x_sl_h = np.concatenate([x_sl_h, np.zeros((-len(x_sl_h)) % batch_multiple, x_sl_h.dtype)])
                        bound = np.where(x_sl_h > 0, np.asarray(bound), 0.0)  # mask padded zero-length rows
                        if num_seeds > 1:
                            for i in range(num_seeds):
                                tracker.update(
                                    [BitsPerDimMetric(bound[i], name=f"iw_{eval_iw_samples} (bpf)", reduce_by=x_sl_h)],
                                    source=f"{source_name}[s{i}]",
                                )
                        else:
                            tracker.update(
                                [BitsPerDimMetric(bound, name=f"iw_{eval_iw_samples} (bpf)", reduce_by=x_sl_h)],
                                source=source_name,
                            )

            # log audio reconstructions from the final eval batch. Multi-host:
            # the outputs are batch-sharded global arrays — all hosts gather
            # the first two rows in lockstep; only process 0 writes the wavs.
            if outputs is not None:
                if num_seeds > 1:
                    outputs = SimpleNamespace(
                        **{k: slice_seed(v, 0) for k, v in vars(outputs).items() if v is not None}
                    )
                if process_count > 1:
                    from jax.experimental import multihost_utils

                    def _gather_rows(a):
                        if isinstance(a, jax.Array) and not a.is_fully_addressable:
                            g = multihost_utils.process_allgather(a, tiled=True)
                            return g[:2] if getattr(g, "ndim", 0) >= 1 else g
                        return a

                    outputs = SimpleNamespace(
                        **{k: _gather_rows(v) for k, v in vars(outputs).items() if v is not None}
                    )
                if is_main:
                    _log_reconstructions(outputs, pipeline.decode_transform, run_dir, epoch)

            if post_eval_hook is not None and is_main:
                hook_params = eval_params if num_seeds == 1 else slice_seed(eval_params, 0)
                hook_state = state if (pp_adapter is None and num_seeds == 1) else state.replace(params=hook_params)
                post_eval_hook(hook_state, epoch, run_dir, pipeline)

            # multi-seed best-checkpoint: gate on the best seed's eval metric
            # and save that seed's CANONICAL single-seed checkpoint (portable
            # to every non-multiseed tool, like the per-process checkpoints of
            # a reference schedule_experiments sweep)
            if num_seeds > 1 and is_main and args.save_checkpoints:
                latest = []
                for i in range(num_seeds):
                    vals = tracker.accumulated_values.get(f"{dataset.test}[s{i}]", {}).get(best_metric_name, [])
                    if vals:
                        latest.append((vals[-1], i))
                if latest:
                    best_now, best_i = min(latest)
                    improved = best_multiseed_value is None or best_now < best_multiseed_value
                    if improved:
                        # record from the FIRST eval epoch so a later save is
                        # gated against the full history (the single-seed path
                        # compares against all previous evals); saving itself
                        # still starts after the first eval, like the reference
                        best_multiseed_value = best_now
                    if improved and epoch > args.test_every:
                        save_run(
                            str(run_dir),
                            model=model,
                            params=slice_seed(state.params, best_i),
                            opt_state=slice_seed(state.opt_state, best_i),
                            annealers=annealers,
                            tracker=tracker,
                            step=int(jax.device_get(state.step)[best_i]),
                        )
                        # full sweep state alongside the canonical best-seed
                        # checkpoint, so --resume continues ALL K seeds
                        from blvm_tpu.parallel import save_multiseed_sweep

                        save_multiseed_sweep(
                            str(run_dir),
                            state,
                            num_seeds,
                            annealers=annealers,
                            epoch=epoch,
                            best_value=best_multiseed_value,
                        )

            # conditional best-checkpoint save (reference gating semantics)
            if (
                num_seeds == 1
                and is_main
                and args.save_checkpoints
                and epoch > args.test_every
                and dataset.test in tracker.accumulated_values
                and best_metric_name in tracker.accumulated_values[dataset.test]
                and len(tracker.accumulated_values[dataset.test][best_metric_name]) > 1
                and min(tracker.accumulated_values[dataset.test][best_metric_name][:-1])
                > tracker.accumulated_values[dataset.test][best_metric_name][-1]
            ):
                save_run(
                    str(run_dir),
                    model=model,
                    params=eval_params,
                    opt_state=state.opt_state,
                    annealers=annealers,
                    tracker=tracker,
                    step=int(state.step),
                )

        if profile_dir and epoch == 1:
            jax.profiler.stop_trace()
            profile_dir = None

        if epoch_lr is not None:
            log_lr = current_lr
        else:
            step_now = int(jax.device_get(state.step)[0]) if num_seeds > 1 else int(state.step)
            log_lr = lr(step_now) if callable(lr) else lr
        tracker.log(learning_rate=float(log_lr), **last_norms, **extra)

    if profile_dir:
        jax.profiler.stop_trace()
    return state, tracker


def _log_reconstructions(outputs, decode_transform, run_dir: Path, epoch: int, sample_rate: int = 16000):
    """Save up to 2 reconstructions (mode + sample) as wavs under the run dir."""
    audio_dir = run_dir / "audio"
    audio_dir.mkdir(exist_ok=True)
    for attr, tag in (
        ("reconstructions_mode", "mode"),
        ("reconstruction_mode", "mode"),
        ("reconstructions", "sample"),
        ("reconstruction_sample", "sample"),
    ):
        rec = getattr(outputs, attr, None)
        if rec is None:
            continue
        rec = np.asarray(jax.device_get(rec))
        rec = decode_transform(rec)
        for i in range(min(2, rec.shape[0])):
            save_wav(audio_dir / f"epoch{epoch:04d}_{tag}_{i}.wav", rec[i], sample_rate)

def make_generation_hook(model, args, max_timesteps: int, method_kwargs=None):
    """``post_eval_hook`` logging 2 generated audio clips per qualifying eval.

    The reference logs generated audio at every eval in the VRNN/SRNN/CWVAE
    drivers (``experiment_vrnn_audio.py:272-276``,
    ``experiment_srnn_audio.py:281-286``, ``experiment_clockwork_audio.py:275``);
    here the cadence is ``--generate_every`` epochs (generation is an
    ancestral scan — worth rate-limiting on TPU). Works for any model whose
    ``generate`` returns ``((x, x_sl), outputs)``.
    """
    import numpy as np

    every = getattr(args, "generate_every", 1)
    gen_jit = None

    def hook(state, epoch, run_dir, pipeline):
        nonlocal gen_jit
        if every <= 0 or (epoch % every) != 0:
            return
        if gen_jit is None:
            gen_jit = jax.jit(
                lambda params, key: model.apply(
                    {"params": params},
                    n_samples=2,
                    max_timesteps=max_timesteps,
                    rngs={"sample": key},
                    method=type(model).generate,
                    **(method_kwargs or {}),
                )
            )
        params = state.params
        if jax.process_count() > 1:
            # params are replicated → every shard is addressable locally;
            # fetch to host so the local generation jit doesn't mix local
            # inputs with globally-committed arrays
            params = jax.device_get(params)
        (x, _), _ = gen_jit(params, jax.random.PRNGKey(epoch))
        x = np.asarray(jax.device_get(x), np.float32)
        x = pipeline.decode_transform(x.reshape(x.shape[0], -1))
        audio_dir = run_dir / "audio"
        audio_dir.mkdir(exist_ok=True)
        for i in range(x.shape[0]):
            save_wav(audio_dir / f"epoch{epoch:04d}_generated_{i}.wav", x[i])

    return hook


def make_rf_chunked_eval(model, args, scalar_names=()):
    """Chunked eval for feedforward conv models (WaveNet/STCN pattern):
    receptive-field-overlap chunks, first chunk rf-padded, no carried state.
    ``scalar_names`` are annealer scalars threaded into the forward (e.g.
    ``("beta", "free_nats")`` for ELBO models). Returns a ``state_carry_eval``
    callback for :func:`run_audio_training`.
    """

    @jax.jit
    def _chunk_first(params, rng, x, x_sl, scalar_values):
        _, mets, out = model.apply(
            {"params": params}, x, x_sl, pad_receptive_field=True, rngs={"sample": rng},
            **dict(zip(scalar_names, scalar_values)),
        )
        return mets, out

    @jax.jit
    def _chunk_rest(params, rng, x, x_sl, scalar_values):
        _, mets, out = model.apply(
            {"params": params}, x, x_sl, pad_receptive_field=False, rngs={"sample": rng},
            **dict(zip(scalar_names, scalar_values)),
        )
        return mets, out

    def state_carry_eval(eval_step, params, rng, x, x_sl, scalars, tracker, source):
        chunks, lens = model.split_sequence(x, x_sl, length=args.random_segment_size or 16000)
        values = tuple(scalars.get(name, 1.0 if name == "beta" else 0.0) for name in scalar_names)
        out = None
        for i, (xs, sl) in enumerate(zip(chunks, lens)):
            fn = _chunk_first if i == 0 else _chunk_rest
            mets, out = fn(params, rng, jnp.asarray(xs), jnp.asarray(sl), values)
            tracker.update(model.build_metrics(jax.device_get(mets)), source=source)
        return out  # last chunk's outputs → reconstruction logging under split-eval

    return state_carry_eval
