"""Train the VRNN on audio waveforms (TPU rebuild of reference
``experiments/experiment_vrnn_audio.py``): beta/free-nats cosine annealers,
grad clipping, dataset statistics normalization for Gaussian/GMM."""

import jax
import numpy as np

from blvm_tpu.data import Compose, Denormalize, Normalize
from blvm_tpu.models import VRNNAudio
from blvm_tpu.training import CosineAnnealer
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool

from common import build_audio_pipeline, run_audio_training


def build_args():
    parser = build_parser()
    parser.set_defaults(
        dataset="timit",
        epochs=1000,
        batch_len=16000 * 16,
        optimizer="Adam",
        lr=3e-4,
        test_every=10,
        max_grad_norm=3000.0,
        max_grad_value=1000.0,
    )
    model_group = parser.add_argument_group("model")
    model_group.add_argument("--stack_frames", default=200, type=int)
    model_group.add_argument("--hidden_size", default=512, type=int)
    model_group.add_argument("--latent_size", default=256, type=int)
    model_group.add_argument("--r_dim", default=None, type=int, help="GRU state size (default 2*hidden_size)")
    model_group.add_argument("--residual_posterior", default=True, type=str2bool)
    model_group.add_argument("--condition_h_on_x", default=True, type=str2bool)
    model_group.add_argument("--condition_x_on_h", default=True, type=str2bool)
    model_group.add_argument("--dropout", default=0.0, type=float)
    model_group.add_argument("--scan_unroll", default=1, type=int,
                             help="time-scan unroll factor (TPU perf knob, same math; 8 measured 1.42x on v5e)")
    model_group.add_argument("--input_coding", default="linear", type=str, choices=["mu_law", "linear"])
    model_group.add_argument("--num_bits", default=8, type=int)
    model_group.add_argument("--random_segment_size", default=None, type=int)
    model_group.add_argument("--likelihood", default="GMM", type=str)
    model_group.add_argument("--num_mix", default=10, type=int)
    model_group.add_argument("--beta_anneal_steps", default=50000, type=int)
    model_group.add_argument("--beta_start_value", default=0, type=float)
    model_group.add_argument("--free_nats_steps", default=0, type=int)
    model_group.add_argument("--free_nats_start_value", default=0.0625, type=float)
    model_group.add_argument("--split_eval", default=False, type=str2bool)
    model_group.add_argument("--generate_every", default=25, type=int)
    model_group.add_argument("--generate_frames", default=128000, type=int,
                             help="waveform frames per generated eval clip (reference max_timesteps semantics)")
    return parser.parse_args()


def add_statistics_normalization(args, pipeline):
    """Gaussian/GMM likelihoods model normalized waveforms: wrap the encode
    transform with dataset statistics normalization (reference
    ``experiment_vrnn_audio.py:99-104``)."""
    if args.likelihood not in ("Gaussian", "GMM"):
        return
    ds = pipeline.train_loader.dataset
    from blvm_tpu.data import AudioLoader, ListBatcher, BaseDataset

    stats_ds = BaseDataset(source=ds.source, modalities=[(AudioLoader(pipeline.dataset.audio_ext), None, ListBatcher())])
    mean, var = stats_ds.compute_statistics()
    std = float(np.sqrt(var))
    for dataset in [pipeline.train_loader.dataset] + [l.dataset for l in pipeline.valid_test_loaders.values()]:
        dataset.transforms = tuple(Compose(t, Normalize(mean=mean, std=std)) for t in dataset.transforms)
    pipeline.decode_transform = Compose(Denormalize(mean=mean, std=std), pipeline.decode_transform)


def main():
    args = build_args()

    model = VRNNAudio(
        likelihood=args.likelihood,
        input_size=args.stack_frames,
        hidden_size=args.hidden_size,
        latent_size=args.latent_size,
        r_dim=args.r_dim,
        residual_posterior=args.residual_posterior,
        condition_h_on_x=args.condition_h_on_x,
        condition_x_on_h=args.condition_x_on_h,
        num_mix=args.num_mix,
        num_bins=2**args.num_bits,
        unroll=args.scan_unroll,
    )

    annealers = dict(
        beta=CosineAnnealer(anneal_steps=args.beta_anneal_steps, start_value=args.beta_start_value, end_value=1.0),
        free_nats=CosineAnnealer(
            anneal_steps=args.free_nats_steps // 2,
            constant_steps=args.free_nats_steps // 2,
            start_value=args.free_nats_start_value,
            end_value=0.0,
        ),
    )

    def loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params},
            batch["x"],
            batch["x_sl"],
            beta=scalars.get("beta", 1.0),
            free_nats=scalars.get("free_nats", 0.0),
            rngs={"sample": rng},
        )
        return loss, (mets, outputs)

    # chunked eval carrying the recurrent state h between chunks
    import jax.numpy as jnp
    from blvm_tpu.ops.padding import get_modulo_length
    from blvm_tpu.ops.sequence import split_sequence

    @jax.jit
    def eval_chunk(params, rng, x, x_sl, h0, beta, free_nats):
        _, mets, out = model.apply(
            {"params": params}, x, x_sl, beta=beta, free_nats=free_nats, h0=h0, rngs={"sample": rng}
        )
        return mets, out

    def state_carry_eval(eval_step, params, rng, x, x_sl, scalars, tracker, source):
        length = get_modulo_length(args.random_segment_size or 16 * args.stack_frames, args.stack_frames)
        chunks, lens = split_sequence(x, x_sl, length=length, overlap=0)
        # carried-state width follows the model's rule (r_dim or 2*hidden_size,
        # models/vrnn.py VRNN.setup) — a custom --r_dim checkpoint must not crash
        h0 = jnp.zeros((x.shape[0], args.r_dim or 2 * args.hidden_size))
        out = None
        for xs, sl in zip(chunks, lens):
            mets, out = eval_chunk(
                params, rng, jnp.asarray(xs), jnp.asarray(sl), h0,
                scalars.get("beta", 1.0), scalars.get("free_nats", 0.0),
            )
            h0 = out.h_n
            tracker.update(model.build_metrics(jax.device_get(mets)), source=source)
        return out

    from common import make_generation_hook

    # generated audio every --generate_every eval epochs (reference
    # experiment_vrnn_audio.py:272-276 generates 128000//stack_frames steps)
    post_eval_hook = make_generation_hook(model, args, max_timesteps=args.generate_frames // args.stack_frames)

    pipeline = build_audio_pipeline(
        args, n_devices=args.n_devices or jax.device_count(),
        # reference eval-loader geometry for this family (see build_audio_pipeline)
        eval_batch="train", eval_shuffle=False, eval_split_bs_mult=3,
    )
    add_statistics_normalization(args, pipeline)
    run_audio_training(
        args, model, pipeline, loss_fn, annealers=annealers, script_name="vrnn_audio",
        state_carry_eval=state_carry_eval, post_eval_hook=post_eval_hook,
        eval_offset=1,  # reference evals at (epoch-1) % test_every == 0 (experiment_vrnn_audio.py:239)
    )


if __name__ == "__main__":
    main()
