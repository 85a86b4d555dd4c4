"""Train WaveNet on audio waveforms (TPU rebuild of reference
``experiments/experiment_wavenet_audio.py``)."""

import jax

from blvm_tpu.models import WaveNet
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool

from common import build_audio_pipeline, make_rf_chunked_eval, run_audio_training


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
    model_group.add_argument("--n_layers", default=10, type=int, help="layers per stack")
    model_group.add_argument("--n_stacks", default=4, type=int)
    model_group.add_argument("--res_channels", default=64, type=int)
    model_group.add_argument("--kernel_size", default=2, type=int)
    model_group.add_argument("--base_dilation", default=2, type=int)
    model_group.add_argument("--input_coding", default="mu_law", type=str, choices=["mu_law", "linear"])
    model_group.add_argument("--input_embedding_dim", default=1, type=int)
    model_group.add_argument("--num_bits", default=16, type=int)
    model_group.add_argument("--num_mix", default=10, type=int)
    model_group.add_argument("--likelihood", default="DMoL", type=str)
    model_group.add_argument("--random_segment_size", default=None, type=int)
    model_group.add_argument("--n_stack_frames", default=1, type=int)
    model_group.add_argument("--split_eval", default=False, type=str2bool)
    model_group.add_argument("--generate_every", default=25, type=int)
    return parser.parse_args()


def main():
    args = build_args()

    model = WaveNet(
        likelihood=args.likelihood,
        embedding_dim=None if args.input_embedding_dim == 1 else args.input_embedding_dim,
        num_bins=2**args.num_bits,
        num_mix=args.num_mix,
        n_layers=args.n_layers,
        n_stacks=args.n_stacks,
        res_channels=args.res_channels,
        kernel_size=args.kernel_size,
        base_dilation=args.base_dilation,
        n_stack_frames=args.n_stack_frames,
        bf16=args.bf16,
    )

    def loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng}
        )
        return loss, (mets, outputs)

    # chunked eval with receptive-field overlap (no state — overlap replaces it;
    # reference experiment_wavenet_audio.py split-eval via model.split_sequence)
    state_carry_eval = make_rf_chunked_eval(model, args)

    # ancestral sampling every N test epochs (reference --generate_every)
    import numpy as np
    from blvm_tpu.utils.audio import save_wav

    gen_jit = None

    def post_eval_hook(state, epoch, run_dir, pipeline):
        nonlocal gen_jit
        if args.generate_every <= 0 or epoch % args.generate_every != 0:
            return
        if gen_jit is None:
            gen_jit = jax.jit(
                lambda params, key: model.apply(
                    {"params": params}, n_samples=2, n_frames=16000, rngs={"sample": key},
                    method=type(model).generate,
                )
            )
        samples = gen_jit(state.params, jax.random.PRNGKey(epoch))
        samples = pipeline.decode_transform(np.asarray(jax.device_get(samples)))
        audio_dir = run_dir / "audio"
        audio_dir.mkdir(exist_ok=True)
        for i in range(samples.shape[0]):
            save_wav(audio_dir / f"epoch{epoch:04d}_generated_{i}.wav", samples[i])

    from blvm_tpu.parallel import WAVENET_TP_RULES, WaveNetPipelineAdapter

    pipeline = build_audio_pipeline(
        args, n_devices=args.n_devices or jax.device_count(),
        # reference eval-loader geometry for this family (see build_audio_pipeline)
        eval_batch="train", eval_shuffle=True, eval_split_bs_mult=3,
    )
    run_audio_training(
        args, model, pipeline, loss_fn, script_name="wavenet_audio",
        state_carry_eval=state_carry_eval, post_eval_hook=post_eval_hook,
        tp_rules=WAVENET_TP_RULES, seq_parallel_ok=True,
        # --pipeline_axis_size N: GPipe the residual stack over a pipe mesh axis
        pp_adapter_factory=lambda n_stages, n_micro: WaveNetPipelineAdapter(
            model, n_stages=n_stages, n_micro=n_micro
        ),
        eval_offset=1,  # reference evals at (epoch-1) % test_every == 0 (experiment_wavenet_audio.py:216)
    )


if __name__ == "__main__":
    main()
