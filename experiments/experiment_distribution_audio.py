"""No-model baseline: LL of data under a fixed DMoL + data moment statistics.

TPU rebuild of reference ``experiments/experiment_distribution_audio.py``:
µ-law → 2-component DMoL (loc ±0.551, scale 0.11); linear → 1 component
(scale 0.005). Reports bits/frame and running data moments.
"""

import jax.numpy as jnp
import numpy as np

from blvm_tpu.data import (
    AudioLoader,
    BaseDataset,
    Compose,
    DataLoader,
    DynamicTensorBatcher,
    LengthEvalSampler,
    MuLawEncode,
)
from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.evaluation import Tracker
from blvm_tpu.evaluation.metrics import BitsPerDimMetric, LLMetric, RunningMeanMetric, RunningVarianceMetric
from blvm_tpu.ops import discretized_logistic_mixture_ll, sequence_mask
from blvm_tpu.utils.argparsers import build_parser


def build_args():
    parser = build_parser()
    parser.set_defaults(dataset="timit", num_workers=4, batch_len=100 * 16000)
    group = parser.add_argument_group("model")
    group.add_argument("--input_coding", default="mu_law", type=str, choices=["mu_law", "linear"])
    group.add_argument("--num_bits", default=16, type=int)
    return parser.parse_args()


def main():
    args = build_args()
    dataset = DATASETS[args.dataset]

    encode = Compose(MuLawEncode(bits=args.num_bits)) if args.input_coding == "mu_law" else Compose()
    modalities = [(AudioLoader(dataset.audio_ext), encode, DynamicTensorBatcher(axis=-1))]

    loaders = []
    for source in [dataset.train, dataset.test]:
        ds = BaseDataset(source=source, modalities=modalities)
        sampler = LengthEvalSampler(source=source, field=dataset.audio_length, batch_len=args.batch_len)
        loaders.append((source, DataLoader(ds, batch_sampler=sampler, num_workers=args.num_workers)))

    if args.input_coding == "mu_law":
        logit_probs = jnp.ones(2)
        loc = jnp.array([[-0.551, 0.551]])
        log_scales = jnp.log(jnp.array([[0.11, 0.11]]))
    else:
        logit_probs = jnp.ones(1)
        loc = jnp.array([[0.0]])
        log_scales = jnp.log(jnp.array([[0.005]]))

    num_bins = 2**args.num_bits
    tracker = Tracker()

    for source, loader in loaders:
        for (x, x_sl), metadata in tracker.steps(loader, source=source):
            x = jnp.asarray(x)[..., None]  # (B, T, 1)
            x_sl_j = jnp.asarray(x_sl)

            mask = sequence_mask(x_sl_j, max_len=x.shape[1], dtype=jnp.float32)
            log_prob = discretized_logistic_mixture_ll(x, logit_probs, loc, log_scales, num_bins)
            log_likelihoods = (log_prob * mask).sum(axis=1)

            x_np = np.asarray(x)[..., 0]
            x_abs = np.abs(x_np)

            metrics = [LLMetric(log_likelihoods), BitsPerDimMetric(log_likelihoods, reduce_by=x_sl)]
            for i in range(x_np.shape[0]):
                n = int(x_sl[i])
                if n == 0:
                    continue
                metrics.append(RunningMeanMetric(x_np[i, :n], name="mean(x)", reduce_by=n))
                metrics.append(RunningVarianceMetric(x_np[i, :n], name="var(x)", reduce_by=n))
                metrics.append(RunningMeanMetric(x_abs[i, :n], name="mean(abs(x))", reduce_by=n))
                metrics.append(RunningVarianceMetric(x_abs[i, :n], name="var(abs(x))", reduce_by=n))
            tracker.update(metrics, check_unique=False)

    tracker.log()
    for source, values in tracker.values.items():
        print(source, {k: round(float(v), 4) for k, v in values.items()})


if __name__ == "__main__":
    main()
