"""Train the STCN on audio waveforms (TPU rebuild of reference
``experiments/experiment_stcn_audio.py``)."""

import jax
import jax.numpy as jnp

from blvm_tpu.models import STCN
from blvm_tpu.training import CosineAnnealer
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool

from common import build_audio_pipeline, make_generation_hook, make_rf_chunked_eval, run_audio_training


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
    model_group.add_argument("--hidden_size", default=256, type=int, help="res_channels of the conv stacks")
    model_group.add_argument("--latent_size", default=[256, 128, 64, 32, 16], type=int, nargs="+")
    model_group.add_argument("--num_layers", default=5, type=int, help="WaveNet blocks per stack")
    model_group.add_argument("--num_stacks", default=None, type=int, help="WaveNet stacks (defaults to number of latents)")
    model_group.add_argument("--kernel_size", default=2, type=int)
    model_group.add_argument("--base_dilation", default=2, type=int)
    model_group.add_argument("--num_stack_frames", default=1, type=int)
    model_group.add_argument("--precision_posterior", default=True, type=str2bool)
    model_group.add_argument("--dense", default=True, type=str2bool)
    model_group.add_argument("--top_down", default=True, type=str2bool)
    model_group.add_argument("--input_coding", default="mu_law", type=str, choices=["mu_law", "linear"])
    model_group.add_argument("--num_bits", default=16, type=int)
    model_group.add_argument("--likelihood", default="DMoL", type=str)
    model_group.add_argument("--random_segment_size", default=None, type=int)
    model_group.add_argument("--beta_anneal_steps", default=50000, type=int)
    model_group.add_argument("--beta_start_value", default=0, type=float)
    model_group.add_argument("--free_nats_steps", default=0, type=int)
    model_group.add_argument("--free_nats_start_value", default=0.0625, type=float)
    model_group.add_argument("--split_eval", default=False, type=str2bool)
    model_group.add_argument("--generate_every", default=25, type=int,
                             help="log 2 ancestrally generated clips every N eval epochs (0 disables). "
                             "Capability added over the reference: its STCN.generate raises "
                             "NotImplementedError (stcn.py:435-442)")
    model_group.add_argument("--generate_frames", default=16000, type=int)
    return parser.parse_args()


def run(args):
    model = STCN(
        likelihood=args.likelihood,
        n_layers=args.num_layers,
        n_stacks=args.num_stacks,
        latent_size=tuple(args.latent_size),
        res_channels=args.hidden_size,
        kernel_size=args.kernel_size,
        base_dilation=args.base_dilation,
        n_stack_frames=args.num_stack_frames,
        precision_posterior=args.precision_posterior,
        dense=args.dense,
        top_down=args.top_down,
        bf16=args.bf16,
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

    from blvm_tpu.parallel import STCN_TP_RULES, STCNPipelineAdapter

    # chunked evaluation with receptive-field overlap (first chunk rf-padded;
    # the reference STCN cannot split-eval at all — stcn.py:328)
    state_carry_eval = make_rf_chunked_eval(model, args, scalar_names=("beta", "free_nats"))

    post_eval_hook = make_generation_hook(model, args, max_timesteps=args.generate_frames)

    pipeline = build_audio_pipeline(
        args, n_devices=args.n_devices or jax.device_count(),
        # reference eval-loader geometry for this family (see build_audio_pipeline)
        eval_batch="2xtrain", eval_shuffle=True, eval_split_bs_mult=1,
        # the reference STCN driver's --batch_len is RAW SAMPLES (it lacks the
        # other drivers' seconds conversion) — kept bug-for-bug
        batch_len_is_seconds=False,
    )
    run_audio_training(
        args, model, pipeline, loss_fn, annealers=annealers, best_metric_name="loss", script_name="stcn_audio",
        tp_rules=STCN_TP_RULES, state_carry_eval=state_carry_eval, seq_parallel_ok=True,
        post_eval_hook=post_eval_hook,
        # --pipeline_axis_size N: GPipe the encoder stack over a pipe mesh axis
        # (collect mode — stages hand the every-n-th skips to the latent
        # hierarchy; the most HBM-capacity-bound family, NOTES.md roofline)
        pp_adapter_factory=lambda n_stages, n_micro: STCNPipelineAdapter(
            model, n_stages=n_stages, n_micro=n_micro
        ),
        eval_offset=1,  # reference evals at (epoch-1) % test_every == 0 (experiment_stcn_audio.py:247)
    )


def main():
    run(build_args())


if __name__ == "__main__":
    main()
