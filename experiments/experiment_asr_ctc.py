"""ASR/CTC probe: train SimpleLSTMASR on spectrograms, stacked waveforms, or
dumped representations (.npy extension as ``--data_type``).

TPU rebuild of reference ``experiments/experiment_asr_ctc.py``: two-modality
dataset (features + text), phoneme/char/word targets, CTC train+eval with
WER/CER, best-WER checkpoint gating.
"""

import os

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
    NumpyLoader,
    TextBatcher,
    TextLoader,
    TokenMap,
    char_tokenizer,
    clean_timit,
    word_tokenizer,
)
from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.data.tokens import TIMIT_ALPHABET, TIMIT_PHONESET
from blvm_tpu.data.transforms import EncodeInteger, LogMelSpectrogram, StackTensor, TextCleaner, Transform
from blvm_tpu.evaluation import Tracker
from blvm_tpu.models.lstm_asr import SimpleLSTMASR
from blvm_tpu.parallel import make_mesh, make_train_step, make_eval_step, shard_batch
from blvm_tpu.parallel.mesh import pad_batch_to_devices
from blvm_tpu.settings import SOURCE_DIRECTORY
from blvm_tpu.training import TrainState, get_optimizer, save_run
from blvm_tpu.training.optim import get_lr_schedule
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool
from blvm_tpu.utils.rand import set_seed

from common import DeferredMetrics, PrefetchedDeviceBatches, default_run_dir


class TransposeTD(Transform):
    """(D, T) → (T, D) feature layout for the LSTM."""

    def forward(self, x):
        return np.ascontiguousarray(np.asarray(x).T)


def build_args():
    parser = build_parser()
    parser.set_defaults(
        epochs=40,
        batch_len=120,
        optimizer="Adam",
        lr=3e-4,
        # reference default (experiment_asr_ctc.py:40-41): MultiStepLR stepped
        # once per EPOCH — milestones are epoch counts
        lr_scheduler="MultiStepLR",
        lr_scheduler_kwargs=dict(milestones=[100, 200, 300], gamma=0.5),
        max_grad_norm=3000.0,
        max_grad_value=1000.0,
        save_checkpoints=False,
        dataset="timit",
        num_workers=4,
    )
    model_group = parser.add_argument_group("model")
    model_group.add_argument("--train_source", default=None, type=str)
    model_group.add_argument("--data_type", default="spectrogram", type=str)
    model_group.add_argument("--text_type", default="phon", choices=["word", "char", "phon"])
    model_group.add_argument("--sample_rate", default=16000, type=int)
    model_group.add_argument("--n_fft", default=512, type=int)
    model_group.add_argument("--win_length", default=128, type=int)
    model_group.add_argument("--hop_length", default=64, type=int)
    model_group.add_argument("--n_mels", default=80, type=int)
    model_group.add_argument("--hidden_size", default=128, type=int)
    model_group.add_argument("--scan_unroll", default=1, type=int,
                             help="LSTM time-scan unroll factor (TPU perf knob, same math; measured NEGATIVE "
                                  "at the bench probe shape — the fused biLSTM is already ~66%% of the serial "
                                  "floor — but exposed for other shapes; see roofline_scan.py)")
    model_group.add_argument("--num_layers", default=1, type=int)
    model_group.add_argument("--bidirectional", default=False, type=str2bool)
    model_group.add_argument("--sum_directions", default=False, type=str2bool)
    model_group.add_argument("--dropout_prob", default=0.30, type=float)
    model_group.add_argument("--temporal_dropout", default=True, type=str2bool)
    # 0 disables the fixed-count epoch (plain one-sweep epochs). The
    # reference cannot disable it from the CLI; its implementation also has
    # the buffer-overwrite bug documented at samplers/length_samplers.py
    model_group.add_argument("--num_batches_per_epoch", default=1000, type=int)
    # additional eval source CSVs after [valid_sets, test_sets] — the
    # reference HARDCODES its two extra TIMIT test splits (male/female,
    # experiment_asr_ctc.py:120-123); this is the configurable equivalent
    model_group.add_argument("--extra_test_sources", default=[], type=str, nargs="*")
    return parser.parse_args()


def build_modalities(args, dataset, token_map):
    text_exts = dict(word="TXT", char="TXT", phon="PHN")
    tokenizer = char_tokenizer if args.text_type == "char" else word_tokenizer

    text_loader = TextLoader(text_exts[args.text_type], cache=True)
    text_transform = Compose(
        TextCleaner(clean_timit, lambda s: s.replace("h#", "").strip()),
        EncodeInteger(token_map=token_map, tokenizer=tokenizer),
    )
    text_batcher = TextBatcher(bucket=BucketSpec(mode="multiple", multiple=16))

    bucket = BucketSpec(mode="multiple", multiple=64)
    if args.data_type == "spectrogram":
        loader = AudioLoader(dataset.audio_ext, cache=False, sum_channels=True)
        transform = Compose(
            LogMelSpectrogram(
                sample_rate=args.sample_rate,
                n_fft=args.n_fft,
                win_length=args.win_length,
                hop_length=args.hop_length,
                n_mels=args.n_mels,
                normalize_frq_bins=True,
            ),
            TransposeTD(),
        )
    elif args.data_type == "waveform":
        loader = AudioLoader(dataset.audio_ext, cache=False, sum_channels=True)
        transform = StackTensor(args.hop_length)  # (T', hop) already time-major
    else:
        loader = NumpyLoader(args.data_type, cache=False, dtype=np.float32)
        transform = None  # dumped representations are already (T, D)

    feat_batcher = DynamicTensorBatcher(axis=0, bucket=bucket)
    return [(loader, transform, feat_batcher), (text_loader, text_transform, text_batcher)]


def main():
    args = build_args()
    run_dir = default_run_dir(args, "asr_ctc")
    root_key = set_seed(args.seed)

    dataset = DATASETS[args.dataset]
    train_source = (
        dataset.train
        if args.train_source is None
        else os.path.join(str(SOURCE_DIRECTORY), dataset.name, args.train_source)
    )

    alphabet = TIMIT_PHONESET if args.text_type == "phon" else TIMIT_ALPHABET
    token_map = TokenMap(tokens=list(alphabet), add_blank=True)

    # --sampler_shared_rng: one RNG shared by all samplers in construction
    # order, reproducing the reference's global-`random` stream (common.py)
    import random as _random

    sampler_seed = _random.Random(args.seed) if getattr(args, "sampler_shared_rng", False) else args.seed

    modalities = build_modalities(args, dataset, token_map)

    train_dataset = BaseDataset(source=train_source, modalities=modalities)
    train_sampler = LengthTrainSampler(
        source=train_source,
        field=dataset.audio_length,
        batch_len=args.sample_rate * args.batch_len,
        max_pool_difference=args.sample_rate * 0.3,
        min_pool_size=512,
        num_batches=args.num_batches_per_epoch or None,
        seed=sampler_seed,
    )
    train_loader = DataLoader(train_dataset, batch_sampler=train_sampler, num_workers=args.num_workers)

    valid_test_loaders = {}
    for source_name in [*dataset.valid_sets, *dataset.test_sets, *args.extra_test_sources]:
        valid_dataset = BaseDataset(source=source_name, modalities=modalities)
        valid_sampler = LengthEvalSampler(
            source=source_name,
            field=dataset.audio_length,
            shuffle=True,
            batch_len=args.sample_rate * args.batch_len * 3,
            seed=sampler_seed,
        )
        valid_test_loaders[source_name] = DataLoader(
            valid_dataset, batch_sampler=valid_sampler, num_workers=args.num_workers
        )

    if (getattr(args, "seq_axis_size", 1) or 1) > 1:
        raise ValueError("--seq_axis_size > 1 is only supported by the conv experiments (WaveNet, STCN)")
    mesh = make_mesh(args.n_devices)
    n_devices = mesh.devices.size

    # infer feature size from one batch
    ((x0, x0_sl), (y0, y0_sl)), _ = next(iter(train_loader))
    model = SimpleLSTMASR.from_token_map(
        token_map,
        input_size=x0.shape[-1],
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        bidirectional=args.bidirectional,
        sum_directions=args.sum_directions,
        temporal_dropout=args.temporal_dropout,
        dropout_prob=args.dropout_prob,
        unroll=args.scan_unroll,
    )

    params_key, rng_key = jax.random.split(root_key)
    x0_j, x0_sl_j, y0_j, y0_sl_j = (jnp.asarray(a) for a in (x0, x0_sl, y0, y0_sl))
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": jax.random.PRNGKey(0)}, x0_j, x0_sl_j, y0_j, y0_sl_j)
    )(params_key)

    # --init_checkpoint: start from saved parameters (fresh optimizer) — e.g.
    # weights transplanted from the torch reference by the convergence harness
    init_ckpt = getattr(args, "init_checkpoint", None)
    if init_ckpt:
        from flax import serialization

        path = init_ckpt if init_ckpt.endswith(".msgpack") else os.path.join(init_ckpt, "model_params.msgpack")
        with open(path, "rb") as f:
            loaded = serialization.from_bytes(variables["params"], f.read())
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, loaded)}

    from common import build_tx_and_lr, step_epoch_lr

    tx, lr, epoch_lr = build_tx_and_lr(args)

    def loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params},
            batch["x"],
            batch["x_sl"],
            batch["y"],
            batch["y_sl"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        return loss, (mets, outputs)

    def eval_loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], batch["y"], batch["y_sl"], deterministic=True
        )
        return loss, (mets, outputs)

    # --num_seeds K: K probe replicas in one program (the phoneme grid is 28
    # small repeated runs — multi-seed's best case, experiments/phoneme.txt);
    # --accum_steps: exact label-weighted gradient accumulation (the CTC loss
    # is total_nats / total_labels, so microbatches merge by y_sl sum)
    num_seeds = int(getattr(args, "num_seeds", 1) or 1)
    accum = int(getattr(args, "accum_steps", 1) or 1)
    if num_seeds > 1:
        from blvm_tpu.parallel import (
            make_multiseed_eval_step,
            make_multiseed_train_step,
            multiseed_train_state,
            slice_seed,
        )

        def _make_state(k):
            kp, kr = jax.random.split(k)
            v = model.init({"params": kp, "dropout": jax.random.PRNGKey(0)}, x0_j, x0_sl_j, y0_j, y0_sl_j)
            return TrainState.create(apply_fn=model.apply, params=v["params"], tx=tx, rng=kr)

        state = multiseed_train_state(_make_state, jax.random.split(params_key, num_seeds), mesh)
        # --accum_steps composes under the seed vmap (parallel/multiseed.py):
        # every seed runs the same label-weighted microbatch split, so the
        # per-seed update equals the single-seed accumulated update — parity
        # with the audio drivers (experiments/common.py)
        train_step = make_multiseed_train_step(
            loss_fn,
            num_seeds,
            mesh=mesh,
            accum=accum,
            loss_weight=(lambda mb, mets: mb["y_sl"].sum()) if accum > 1 else None,
            accum_unroll=bool(getattr(args, "accum_unroll", False)),
        )
        eval_step = make_multiseed_eval_step(eval_loss_fn, num_seeds, mesh=mesh, return_outputs=False)
    else:
        state = TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx, rng=rng_key)
        train_step = make_train_step(
            loss_fn,
            mesh=mesh,
            accum=accum,
            loss_weight=(lambda mb, mets: mb["y_sl"].sum()) if accum > 1 else None,
            accum_unroll=bool(getattr(args, "accum_unroll", False)),
        )
        eval_step = make_eval_step(eval_loss_fn, mesh=mesh)

    tracker = Tracker(
        jsonl_path=str(run_dir / "metrics.jsonl"),
        debug_epoch_break_steps=args.debug_epoch_break_steps or float("inf"),
    )

    batch_multiple = n_devices * accum

    def make_batch(first, second):
        # the two-modality loader yields ((x, x_sl), (y, y_sl))
        (x, x_sl), (y, y_sl) = first, second
        x, x_sl = pad_batch_to_devices(np.asarray(x, np.float32), np.asarray(x_sl), batch_multiple)
        y, y_sl = pad_batch_to_devices(np.asarray(y), np.asarray(y_sl), batch_multiple)
        b = {"x": x, "x_sl": x_sl, "y": y, "y_sl": y_sl}
        if num_seeds > 1:
            from blvm_tpu.parallel import replicated_sharding

            return jax.device_put({k: jnp.asarray(v) for k, v in b.items()}, replicated_sharding(mesh))
        return shard_batch(b, mesh)

    eval_key = jax.random.PRNGKey(args.seed + 1)
    hyps, refs = [], []
    # deferred per-step metric fetch (same dispatch-pipeline rationale as
    # common.run_audio_training — the ~10 ms CTC step is hurt proportionally
    # most by a synchronous per-step device round-trip)
    metric_fetch_lag = max(0, getattr(args, "metric_fetch_lag", 0))

    def consume_train_mets(mets_host):
        if num_seeds > 1:
            for i in range(num_seeds):
                tracker.update(model.build_metrics(slice_seed(mets_host, i))[0], source=f"{train_source}[s{i}]")
            return
        tracker.update(model.build_metrics(mets_host)[0])

    def make_consume_eval(source_name):
        def consume(mets_host):
            nonlocal hyps, refs
            if num_seeds > 1:
                for i in range(num_seeds):
                    metrics, hyps, refs = model.build_metrics(slice_seed(mets_host, i))
                    tracker.update(metrics, source=f"{source_name}[s{i}]")
                return
            metrics, hyps, refs = model.build_metrics(mets_host)
            tracker.update(metrics)

        return consume

    best_multiseed_wer = None
    current_lr = float(epoch_lr.init_value) if epoch_lr is not None else None
    for epoch in tracker.epochs(args.epochs):
        if epoch_lr is not None:
            state, current_lr = step_epoch_lr(state, epoch_lr, epoch, current_lr)
        deferred = DeferredMetrics(jax.device_get, consume_train_mets, metric_fetch_lag)
        # device-place batches ahead so host→device transfer overlaps compute
        train_batches = PrefetchedDeviceBatches(
            train_loader, make_batch, depth=max(1, getattr(args, "device_prefetch_depth", 2))
        )
        for batch, metadata in tracker.steps(
            train_batches, source=str(train_source), before_unset=deferred.flush
        ):
            state, mets = train_step(state, batch, {})
            deferred.push(mets)

        for source_name, loader in valid_test_loaders.items():
            eval_deferred = DeferredMetrics(jax.device_get, make_consume_eval(source_name), metric_fetch_lag)
            for ((x, x_sl), (y, y_sl)), metadata in tracker.steps(
                loader, source=source_name, before_unset=eval_deferred.flush
            ):
                batch = make_batch((x, x_sl), (y, y_sl))
                eval_key, sub = jax.random.split(eval_key)
                if num_seeds > 1:
                    mets = eval_step(state.params, sub, batch, {})
                else:
                    mets, outputs = eval_step(state.params, sub, batch, {})
                eval_deferred.push(mets)

        step_now = int(np.asarray(jax.device_get(state.step)).reshape(-1)[0])
        log_lr = current_lr if epoch_lr is not None else (lr(step_now) if callable(lr) else lr)
        tracker.log(learning_rate=float(log_lr))

        for r, h in zip(refs[:5], hyps[:5]):
            print(f"Ref: {r}\nHyp: {h}")

        if args.save_checkpoints and num_seeds > 1:
            # best seed's canonical single-seed checkpoint (common.py pattern)
            latest = []
            for i in range(num_seeds):
                vals = tracker.accumulated_values.get(f"{dataset.test}[s{i}]", {}).get("wer", [])
                if vals:
                    latest.append((vals[-1], i))
            if latest:
                best_now, best_i = min(latest)
                if best_multiseed_wer is None or best_now < best_multiseed_wer:
                    best_multiseed_wer = best_now
                    save_run(
                        str(run_dir),
                        model=model,
                        params=slice_seed(state.params, best_i),
                        opt_state=slice_seed(state.opt_state, best_i),
                        tracker=tracker,
                        step=int(jax.device_get(state.step)[best_i]),
                    )
        elif (
            args.save_checkpoints
            and dataset.test in tracker.accumulated_values
            and tracker.accumulated_values[dataset.test]["wer"][-1]
            == tracker.best_values[dataset.test]["best_wer"]
        ):
            save_run(str(run_dir), model=model, params=state.params, opt_state=state.opt_state, tracker=tracker, step=int(state.step))


if __name__ == "__main__":
    main()
