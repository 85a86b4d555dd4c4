"""ASR/CTC probe on representations resampled from a FROZEN generative model.

TPU rebuild of reference ``experiments/experiment_asr_ctc_resampling.py``: a
trained LVM is restored from ``--model_dir`` (the reference used wandb run
ids); inside probe training, each batch's waveform runs through the frozen
model and ``z[z_index]`` is extracted with a FRESH stochastic sample each step
("resampling") as input features for the CTC classifier.
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
    MuLawEncode,
    TextBatcher,
    TextLoader,
    TokenMap,
    char_tokenizer,
    clean_timit,
    word_tokenizer,
)
from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.data.tokens import TIMIT_ALPHABET, TIMIT_PHONESET
from blvm_tpu.data.transforms import EncodeInteger, TextCleaner
from blvm_tpu.evaluation import Tracker
from blvm_tpu.models.base import load_model
from blvm_tpu.models.lstm_asr import SimpleLSTMASR
from blvm_tpu.settings import SOURCE_DIRECTORY
from blvm_tpu.training import TrainState, get_optimizer
from blvm_tpu.training.optim import get_lr_schedule
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool
from blvm_tpu.utils.rand import set_seed

from common import DeferredMetrics, default_run_dir


def build_args():
    parser = build_parser()
    parser.set_defaults(
        epochs=40,
        batch_len=120,
        optimizer="Adam",
        lr=3e-4,
        lr_scheduler=None,
        max_grad_norm=3000.0,
        max_grad_value=1000.0,
        dataset="timit",
        num_workers=4,
    )
    group = parser.add_argument_group("model")
    group.add_argument("--model_dir", type=str, required=True, help="checkpoint dir of the frozen LVM")
    group.add_argument("--z_index", default=0, type=int, help="which latent level to probe")
    group.add_argument("--train_source", default=None, type=str)
    group.add_argument("--text_type", default="phon", choices=["word", "char", "phon"])
    group.add_argument("--sample_rate", default=16000, type=int)
    group.add_argument("--input_coding", default="mu_law", type=str, choices=["mu_law", "linear"])
    group.add_argument("--num_bits", default=16, type=int)
    group.add_argument("--hidden_size", default=128, type=int)
    group.add_argument("--scan_unroll", default=1, type=int,
                       help="LSTM time-scan unroll factor (TPU perf knob, same math; measured NEGATIVE at "
                            "the bench probe shape but exposed for other shapes; see roofline_scan.py)")
    group.add_argument("--num_layers", default=1, type=int)
    group.add_argument("--bidirectional", default=False, type=str2bool)
    group.add_argument("--sum_directions", default=False, type=str2bool)
    group.add_argument("--dropout_prob", default=0.30, type=float)
    group.add_argument("--temporal_dropout", default=True, type=str2bool)
    group.add_argument("--num_batches_per_epoch", default=1000, type=int)
    return parser.parse_args()


def main():
    args = build_args()
    if (getattr(args, "seq_axis_size", 1) or 1) > 1:
        raise ValueError("--seq_axis_size > 1 is only supported by the conv experiments (WaveNet, STCN)")
    run_dir = default_run_dir(args, "asr_ctc_resampling")
    root_key = set_seed(args.seed)

    rep_model, rep_params = load_model(args.model_dir)

    dataset = DATASETS[args.dataset]
    train_source = (
        dataset.train
        if args.train_source is None
        else os.path.join(str(SOURCE_DIRECTORY), dataset.name, args.train_source)
    )

    alphabet = TIMIT_PHONESET if args.text_type == "phon" else TIMIT_ALPHABET
    token_map = TokenMap(tokens=list(alphabet), add_blank=True)
    tokenizer = char_tokenizer if args.text_type == "char" else word_tokenizer
    text_exts = dict(word="TXT", char="TXT", phon="PHN")

    encode = Compose(MuLawEncode(bits=args.num_bits)) if args.input_coding == "mu_law" else Compose()
    bucket = BucketSpec(mode="multiple", multiple=4096)
    modalities = [
        (AudioLoader(dataset.audio_ext), encode, DynamicTensorBatcher(axis=-1, bucket=bucket)),
        (
            TextLoader(text_exts[args.text_type], cache=True),
            Compose(
                TextCleaner(clean_timit, lambda s: s.replace("h#", "").strip()),
                EncodeInteger(token_map=token_map, tokenizer=tokenizer),
            ),
            TextBatcher(bucket=BucketSpec(mode="multiple", multiple=16)),
        ),
    ]

    train_dataset = BaseDataset(source=train_source, modalities=modalities)
    train_sampler = LengthTrainSampler(
        source=train_source,
        field=dataset.audio_length,
        batch_len=args.sample_rate * args.batch_len,
        max_pool_difference=args.sample_rate * 0.3,
        min_pool_size=512,
        num_batches=args.num_batches_per_epoch,
        seed=args.seed,
    )
    train_loader = DataLoader(train_dataset, batch_sampler=train_sampler, num_workers=args.num_workers)

    valid_test_loaders = {}
    for source_name in [*dataset.valid_sets, *dataset.test_sets]:
        ds = BaseDataset(source=source_name, modalities=modalities)
        sampler = LengthEvalSampler(
            source=source_name, field=dataset.audio_length, shuffle=True, batch_len=args.sample_rate * args.batch_len * 3
        )
        valid_test_loaders[source_name] = DataLoader(ds, batch_sampler=sampler, num_workers=args.num_workers)

    @jax.jit
    def get_representation(x, x_sl, key):
        """Frozen-model z extraction; fresh sample each call (reference
        ``experiment_asr_ctc_resampling.py:184-199``)."""
        _, _, output = rep_model.apply({"params": rep_params}, x, x_sl, rngs={"sample": key})
        z = output.z[args.z_index] if isinstance(output.z, (list, tuple)) else output.z
        z_sl = output.z_sl[args.z_index] if isinstance(output.z_sl, (list, tuple)) else output.z_sl
        return jax.lax.stop_gradient(z), z_sl

    # probe model sized from one representation batch
    ((x0, x0_sl), (y0, y0_sl)), _ = next(iter(train_loader))
    key0, root_key = jax.random.split(root_key)
    z0, z0_sl = get_representation(jnp.asarray(x0), jnp.asarray(x0_sl), key0)

    model = SimpleLSTMASR.from_token_map(
        token_map,
        input_size=z0.shape[-1],
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        bidirectional=args.bidirectional,
        sum_directions=args.sum_directions,
        temporal_dropout=args.temporal_dropout,
        dropout_prob=args.dropout_prob,
        unroll=args.scan_unroll,
    )
    params_key, rng_key = jax.random.split(root_key)
    y0_j, y0_sl_j = jnp.asarray(y0), jnp.asarray(y0_sl)
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": jax.random.PRNGKey(0)}, z0, z0_sl, y0_j, y0_sl_j)
    )(params_key)

    from common import build_tx_and_lr, step_epoch_lr

    from blvm_tpu.parallel import make_eval_step, make_mesh, make_train_step, shard_batch
    from blvm_tpu.parallel.mesh import pad_batch_to_devices

    tx, lr, epoch_lr = build_tx_and_lr(args)

    def loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], batch["y"], batch["y_sl"],
            deterministic=False, rngs={"dropout": rng},
        )
        return loss, (mets, outputs)

    def eval_loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], batch["y"], batch["y_sl"], deterministic=True
        )
        return loss, (mets, outputs)

    # same promoted machinery as experiment_asr_ctc.py: data-parallel mesh,
    # --accum_steps, --num_seeds (the representation batch replicates across
    # seeds; each probe replica trains on the same resampled z stream)
    mesh = make_mesh(args.n_devices)
    n_devices = mesh.devices.size
    num_seeds = int(getattr(args, "num_seeds", 1) or 1)
    accum = int(getattr(args, "accum_steps", 1) or 1)
    batch_multiple = n_devices * accum

    def make_batch(z, z_sl, y, y_sl):
        z, z_sl = pad_batch_to_devices(np.asarray(z, np.float32), np.asarray(z_sl), batch_multiple)
        y, y_sl = pad_batch_to_devices(np.asarray(y), np.asarray(y_sl), batch_multiple)
        b = {"x": z, "x_sl": z_sl, "y": y, "y_sl": y_sl}
        if num_seeds > 1:
            from blvm_tpu.parallel import replicated_sharding

            return jax.device_put({k: jnp.asarray(v) for k, v in b.items()}, replicated_sharding(mesh))
        return shard_batch(b, mesh)

    if num_seeds > 1:
        from blvm_tpu.parallel import (
            make_multiseed_eval_step,
            make_multiseed_train_step,
            multiseed_train_state,
            slice_seed,
        )

        def _make_state(k):
            kp, kr = jax.random.split(k)
            v = model.init({"params": kp, "dropout": jax.random.PRNGKey(0)}, z0, z0_sl, y0_j, y0_sl_j)
            return TrainState.create(apply_fn=model.apply, params=v["params"], tx=tx, rng=kr)

        state = multiseed_train_state(_make_state, jax.random.split(params_key, num_seeds), mesh)
        # --accum_steps composes under the seed vmap, exactly as in the main
        # ASR probe (experiment_asr_ctc.py) and the audio drivers
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
        _eval = make_eval_step(eval_loss_fn, mesh=mesh)

        def eval_step(params, key, batch, scalars):
            mets, _ = _eval(params, key, batch, scalars)
            return mets

    tracker = Tracker(
        jsonl_path=str(run_dir / "metrics.jsonl"),
        debug_epoch_break_steps=args.debug_epoch_break_steps or float("inf"),
    )
    rep_key = jax.random.PRNGKey(args.seed + 2)

    # deferred per-step metric fetch (same dispatch-pipeline rationale as
    # common.run_audio_training)
    metric_fetch_lag = max(0, getattr(args, "metric_fetch_lag", 0))

    def make_consume(source):
        def consume(mets_host):
            if num_seeds > 1:
                for i in range(num_seeds):
                    tracker.update(model.build_metrics(slice_seed(mets_host, i))[0], source=f"{source}[s{i}]")
                return
            tracker.update(model.build_metrics(mets_host)[0], source=source)

        return consume

    eval_key = jax.random.PRNGKey(args.seed + 3)
    current_lr = float(epoch_lr.init_value) if epoch_lr is not None else None
    for epoch in tracker.epochs(args.epochs):
        if epoch_lr is not None:
            state, current_lr = step_epoch_lr(state, epoch_lr, epoch, current_lr)
        deferred = DeferredMetrics(jax.device_get, make_consume(str(train_source)), metric_fetch_lag)
        for ((x, x_sl), (y, y_sl)), metadata in tracker.steps(
            train_loader, source=str(train_source), before_unset=deferred.flush
        ):
            rep_key, sub = jax.random.split(rep_key)
            z, z_sl = get_representation(jnp.asarray(x), jnp.asarray(x_sl), sub)
            state, mets = train_step(state, make_batch(z, z_sl, y, y_sl), {})
            deferred.push(mets)

        for source_name, loader in valid_test_loaders.items():
            eval_deferred = DeferredMetrics(jax.device_get, make_consume(source_name), metric_fetch_lag)
            for ((x, x_sl), (y, y_sl)), metadata in tracker.steps(
                loader, source=source_name, before_unset=eval_deferred.flush
            ):
                rep_key, sub = jax.random.split(rep_key)
                z, z_sl = get_representation(jnp.asarray(x), jnp.asarray(x_sl), sub)
                eval_key, ek = jax.random.split(eval_key)
                mets = eval_step(state.params, ek, make_batch(z, z_sl, y, y_sl), {})
                eval_deferred.push(mets)

        step_now = int(np.asarray(jax.device_get(state.step)).reshape(-1)[0])
        log_lr = current_lr if epoch_lr is not None else (lr(step_now) if callable(lr) else lr)
        tracker.log(learning_rate=float(log_lr))


if __name__ == "__main__":
    main()
