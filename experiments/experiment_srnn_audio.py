"""Train the SRNN on audio waveforms (TPU rebuild of reference
``experiments/experiment_srnn_audio.py``). The reference's NaN/Inf
gradient-norm guard (``:236-240``) is the jitted ``apply_if_finite`` optax
wrapper (``--skip_nonfinite_updates`` on by default here, as there)."""

import jax

from blvm_tpu.models import SRNNAudio
from blvm_tpu.training import CosineAnnealer
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool

from common import build_audio_pipeline, run_audio_training
from experiment_vrnn_audio import add_statistics_normalization


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
    model_group.add_argument("--residual_posterior", default=True, type=str2bool)
    model_group.add_argument("--smoothing", default=True, type=str2bool)
    model_group.add_argument("--dropout", default=0.0, type=float)
    model_group.add_argument("--scan_unroll", default=1, type=int,
                             help="time-scan unroll factor (TPU perf knob, same math; 8 measured 1.31x on v5e)")
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
    model_group.add_argument("--skip_nonfinite_updates", default=True, type=str2bool)
    model_group.add_argument("--generate_every", default=25, type=int)
    model_group.add_argument("--generate_frames", default=128000, type=int,
                             help="waveform frames per generated eval clip (reference max_timesteps semantics)")
    return parser.parse_args()


def main():
    args = build_args()

    model = SRNNAudio(
        likelihood=args.likelihood,
        input_size=args.stack_frames,
        hidden_size=args.hidden_size,
        latent_size=args.latent_size,
        dropout=args.dropout,
        residual_posterior=args.residual_posterior,
        smoothing=args.smoothing,
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

    # chunked eval carrying d_0/a_0/z_0 between chunks
    # (reference experiment_srnn_audio.py:262-269)
    import jax.numpy as jnp

    @jax.jit
    def eval_chunk(params, rng, x, x_sl, d0, z0, beta, free_nats):
        _, mets, out = model.apply(
            {"params": params}, x, x_sl, beta=beta, free_nats=free_nats, d_0=d0, z_0=z0, rngs={"sample": rng}
        )
        return mets, out

    def state_carry_eval(eval_step, params, rng, x, x_sl, scalars, tracker, source):
        chunks, lens = model.split_sequence(x, x_sl, length=args.random_segment_size or 16 * args.stack_frames)
        B = x.shape[0]
        d0 = jnp.zeros((B, 2 * args.hidden_size))
        z0 = jnp.zeros((B, args.latent_size))
        out = None
        for xs, sl in zip(chunks, lens):
            mets, out = eval_chunk(
                params, rng, jnp.asarray(xs), jnp.asarray(sl), d0, z0,
                scalars.get("beta", 1.0), scalars.get("free_nats", 0.0),
            )
            d0, z0 = out.d_n, out.z_n
            tracker.update(model.build_metrics(jax.device_get(mets)), source=source)
        return out

    from common import make_generation_hook

    # generated audio every --generate_every eval epochs (reference
    # experiment_srnn_audio.py:281-286 generates 128000//stack_frames steps)
    post_eval_hook = make_generation_hook(model, args, max_timesteps=args.generate_frames // args.stack_frames)

    pipeline = build_audio_pipeline(
        args, n_devices=args.n_devices or jax.device_count(),
        # reference eval-loader geometry for this family (see build_audio_pipeline)
        eval_batch="train", eval_shuffle=False, eval_split_bs_mult=3,
    )
    add_statistics_normalization(args, pipeline)
    run_audio_training(
        args, model, pipeline, loss_fn, annealers=annealers, script_name="srnn_audio",
        state_carry_eval=state_carry_eval, post_eval_hook=post_eval_hook,
    )


if __name__ == "__main__":
    main()
