"""Train the frame-stacked autoregressive LSTM on audio waveforms.

TPU rebuild of reference ``experiments/experiment_lstm_audio.py`` — same CLI
(so ``benchmarks.txt`` run specs work unchanged).
"""

import jax
import jax.numpy as jnp

from blvm_tpu.models import LSTMAudio
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool

from common import build_audio_pipeline, make_generation_hook, run_audio_training


def build_args():
    parser = build_parser()
    parser.set_defaults(
        dataset="timit",
        epochs=1000,
        batch_len=16000 * 64,
        optimizer="Adam",
        lr=3e-4,
        test_every=10,
    )
    model_group = parser.add_argument_group("model")
    model_group.add_argument("--stack_size", default=64, type=int, help="waveform frames per input vector")
    model_group.add_argument("--hidden_size", default=256, type=int)
    model_group.add_argument("--num_layers", default=1, type=int)
    model_group.add_argument("--dropout", default=0, type=float)
    model_group.add_argument("--scan_unroll", default=1, type=int,
                             help="time-scan unroll factor (TPU perf knob, same math; neutral at the flagship "
                                  "config on v5e — see roofline_scan.py)")
    model_group.add_argument("--input_coding", default="mu_law", type=str, choices=["mu_law", "linear"])
    model_group.add_argument("--num_bits", default=16, type=int)
    model_group.add_argument("--num_mix", default=10, type=int)
    model_group.add_argument("--likelihood", default="DMoL", type=str)
    model_group.add_argument("--random_segment_size", default=None, type=int)
    model_group.add_argument("--split_eval", default=False, type=str2bool)
    model_group.add_argument("--generate_every", default=25, type=int)
    model_group.add_argument("--generate_frames", default=16000, type=int,
                             help="waveform frames per generated eval clip (0 disables)")
    return parser.parse_args()


def main():
    args = build_args()
    if args.likelihood != "DMoL":
        raise NotImplementedError("Only DMoL likelihood is supported")

    model = LSTMAudio(
        stack_size=args.stack_size,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        dropout=args.dropout,
        num_mix=args.num_mix,
        num_bins=2**args.num_bits,
        bf16=args.bf16,  # note: measured slower than f32 for the scan core on v5e
        unroll=args.scan_unroll,
    )

    def loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng, "dropout": rng}, deterministic=False
        )
        return loss, (mets, outputs)

    # chunked eval with carried LSTM state (reference experiment_lstm_audio.py:203-208,
    # whose state carry was broken by the s_n/sn name mismatch — fixed here)
    import jax.numpy as jnp
    from blvm_tpu.ops.sequence import split_sequence

    @jax.jit
    def eval_chunk(params, rng, x, x_sl, s0):
        _, mets, out = model.apply({"params": params}, x, x_sl, s_0=s0, rngs={"sample": rng})
        return mets, out.s_n

    def state_carry_eval(eval_step, params, rng, x, x_sl, scalars, tracker, source):
        length = args.random_segment_size or 16 * args.stack_size
        chunks, lens = split_sequence(x, x_sl, length=length, overlap=0)
        B = x.shape[0]
        s0 = (
            jnp.zeros((args.num_layers, B, args.hidden_size)),
            jnp.zeros((args.num_layers, B, args.hidden_size)),
        )
        for xs, sl in zip(chunks, lens):
            mets, s0 = eval_chunk(params, rng, jnp.asarray(xs), jnp.asarray(sl), s0)
            tracker.update(model.build_metrics(jax.device_get(mets)), source=source)

    # generated audio every --generate_every eval epochs (reference LSTMAudio
    # cannot generate — its generate raises NotImplementedError, lstm.py:133-135)
    post_eval_hook = None
    if args.generate_frames > 0:
        post_eval_hook = make_generation_hook(model, args, max_timesteps=args.generate_frames // args.stack_size)

    pipeline = build_audio_pipeline(args, n_devices=args.n_devices or jax.device_count())
    run_audio_training(
        args, model, pipeline, loss_fn, script_name="lstm_audio",
        state_carry_eval=state_carry_eval, post_eval_hook=post_eval_hook,
    )


if __name__ == "__main__":
    main()
