"""Train the Clockwork-VAE on audio waveforms (TPU rebuild of reference
``experiments/experiment_clockwork_audio.py``)."""

import jax

from blvm_tpu.models import CWVAEAudio
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
    )
    model_group = parser.add_argument_group("model")
    model_group.add_argument("--hidden_size", default=[96], type=int, nargs="+")
    model_group.add_argument("--latent_size", default=[96], type=int, nargs="+")
    model_group.add_argument("--global_size", default=0, type=int)
    model_group.add_argument("--strides", default=[64, 16, 16], type=int, nargs="+")
    model_group.add_argument("--num_level_layers", default=3, type=int)
    model_group.add_argument("--stride_per_layer", default=4, type=int)
    model_group.add_argument("--residual_posterior", default=False, type=str2bool)
    model_group.add_argument("--precision_posterior", default=False, type=str2bool)
    model_group.add_argument("--with_resets", default=False, type=str2bool)
    model_group.add_argument("--scan_unroll", default=1, type=int,
                             help="level-scan unroll factor (TPU perf knob, same math; 8 measured 1.14x on v5e)")
    model_group.add_argument("--input_coding", default="mu_law", type=str, choices=["mu_law", "linear"])
    model_group.add_argument("--num_bits", default=16, type=int)
    model_group.add_argument("--likelihood", default="DMoL", type=str)
    model_group.add_argument("--num_mix", default=10, type=int)
    model_group.add_argument("--random_segment_size", default=None, type=int)
    model_group.add_argument("--beta_anneal_steps", default=50000, type=int)
    model_group.add_argument("--beta_start_value", default=0, type=float)
    model_group.add_argument("--free_nats_steps", default=0, type=int)
    model_group.add_argument("--free_nats_start_value", default=2.0, type=float)
    model_group.add_argument("--split_eval", default=False, type=str2bool)
    model_group.add_argument("--generate_every", default=25, type=int)
    model_group.add_argument("--generate_frames", default=128000, type=int,
                             help="waveform frames per generated eval clip (reference max_timesteps semantics)")
    # --bf16 comes from the shared setup group (utils/argparsers.py): here it
    # selects bf16 conv coders (RSSM scans stay f32)
    return parser.parse_args()


def main():
    args = build_args()

    def expand(vals, n):
        vals = list(vals)
        return tuple(vals * n) if len(vals) == 1 else tuple(vals)

    n_levels = len(args.strides)
    model = CWVAEAudio(
        z_size=expand(args.latent_size, n_levels),
        h_size=expand(args.hidden_size, n_levels),
        g_size=args.global_size,
        strides=tuple(args.strides),
        residual_posterior=args.residual_posterior,
        precision_posterior=args.precision_posterior,
        with_resets=args.with_resets,
        num_level_layers=args.num_level_layers,
        stride_per_layer=args.stride_per_layer,
        likelihood=args.likelihood,
        num_mix=args.num_mix,
        num_bins=2**args.num_bits,
        bf16=args.bf16,
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
            pad_strideable=True,
            rngs={"sample": rng},
        )
        return loss, (mets, outputs)

    # chunked eval carrying per-level (z, h) states; last chunk uses same
    # padding (reference experiment_clockwork_audio.py:255-266; metrics merged
    # with check_unique=False there — our metric names are already unique)
    import jax.numpy as jnp

    from functools import partial

    @partial(jax.jit, static_argnums=(5,))
    def eval_chunk(params, rng, x, x_sl, state0, is_last, beta, free_nats):
        _, mets, out = model.apply(
            {"params": params},
            x,
            x_sl,
            state0=state0,
            beta=beta,
            free_nats=free_nats,
            pad_strideable=False,
            pad_same=is_last,
            rngs={"sample": rng},
        )
        return mets, out

    def state_carry_eval(eval_step, params, rng, x, x_sl, scalars, tracker, source):
        chunks, lens = model.split_sequence(x, x_sl, length=args.random_segment_size or 4 * model.overall_stride)
        state0 = None
        out = None
        for i, (xs, sl) in enumerate(zip(chunks, lens)):
            is_last = i == len(chunks) - 1
            mets, out = eval_chunk(
                params, rng, jnp.asarray(xs), jnp.asarray(sl), state0, is_last,
                scalars.get("beta", 1.0), scalars.get("free_nats", 0.0),
            )
            state0 = out.state_n
            tracker.update(model.build_metrics(jax.device_get(mets)), source=source, check_unique=False)
        return out

    from common import make_generation_hook

    # generated audio every --generate_every eval epochs (reference
    # experiment_clockwork_audio.py:275 generates 128000 frames with mode obs)
    post_eval_hook = make_generation_hook(
        model, args, max_timesteps=args.generate_frames, method_kwargs=dict(use_mode_observations=True)
    )

    pipeline = build_audio_pipeline(
        args, n_devices=args.n_devices or jax.device_count(),
        # reference eval-loader geometry for this family (see build_audio_pipeline)
        eval_batch="train", eval_shuffle=True, eval_split_bs_mult=3,
    )
    run_audio_training(
        args,
        model,
        pipeline,
        loss_fn,
        annealers=annealers,
        best_metric_name="loss",
        script_name="clockwork_audio",
        state_carry_eval=state_carry_eval,
        post_eval_hook=post_eval_hook,
        # the conv coders carry the full-T activations and shard their time
        # axis over the seq mesh axis; the tiny post-encoder latent sequence
        # is gathered before the RSSM scans (tests/parallel)
        seq_parallel_ok=True,
        iw_kwargs=dict(pad_strideable=True),
    )


if __name__ == "__main__":
    main()
