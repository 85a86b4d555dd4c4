"""Dump learned representations z for every example of every split.

TPU rebuild of reference ``experiments/dump_representations.py``: restore a
trained model from a checkpoint directory (``--model_dir``; the reference used
wandb run ids), iterate all splits, average z over ``--num_samples`` stochastic
forward passes, truncate per z_sl, and save per-example ``.npy`` files next to
the audio with a model-derived extension — consumable by
``experiment_asr_ctc.py --data_type <ext>``.
"""

import os
from collections import defaultdict
from pathlib import Path

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
    MuLawEncode,
)
from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.evaluation import Tracker
from blvm_tpu.models.base import load_model
from blvm_tpu.settings import DATA_DIRECTORY
from blvm_tpu.utils.argparsers import build_parser
from blvm_tpu.utils.argparsing import str2bool


def build_args():
    parser = build_parser()
    parser.set_defaults(dataset="timit", num_workers=4)
    group = parser.add_argument_group("dump")
    group.add_argument("--model_dir", type=str, required=True, help="checkpoint directory of the trained model")
    group.add_argument("--model_tag", type=str, default=None, help="tag used in the output extension (default: dir name)")
    group.add_argument("--num_samples", type=int, default=1, help="stochastic forward passes to average z over")
    group.add_argument("--sample_rate", type=int, default=16000)
    group.add_argument("--input_coding", type=str, default="mu_law", choices=["mu_law", "linear"])
    group.add_argument("--num_bits", type=int, default=16)
    group.add_argument("--dry", type=str2bool, default=False)
    return parser.parse_args()


def main():
    args = build_args()
    model, params = load_model(args.model_dir)
    tag = args.model_tag or Path(args.model_dir).name

    dataset = DATASETS[args.dataset]
    datapath = os.path.join(str(DATA_DIRECTORY), dataset.name)

    encode = Compose(MuLawEncode(bits=args.num_bits)) if args.input_coding == "mu_law" else Compose()
    bucket = BucketSpec(mode="multiple", multiple=4096)
    modalities = [(AudioLoader(dataset.audio_ext), encode, DynamicTensorBatcher(axis=-1, bucket=bucket))]

    loaders = {}
    for source_name in [*dataset.valid_sets, *dataset.test_sets, dataset.train]:
        data = BaseDataset(source=source_name, modalities=modalities)
        sampler = LengthEvalSampler(
            source=source_name, field=dataset.audio_length, shuffle=False, batch_len=100 * args.sample_rate
        )
        loaders[source_name] = DataLoader(data, batch_sampler=sampler, num_workers=args.num_workers)

    @jax.jit
    def forward(params, x, x_sl, key):
        _, _, output = model.apply({"params": params}, x, x_sl, rngs={"sample": key})
        return output.z, output.z_sl

    tracker = Tracker()
    key = jax.random.PRNGKey(args.seed)

    for source_name, loader in loaders.items():
        for (x, x_sl), metadata in tracker.steps(loader, source=source_name):
            x = jnp.asarray(x)
            x_sl_j = jnp.asarray(x_sl)

            reps = defaultdict(list)
            lengths = {}
            for _ in range(args.num_samples):
                key, sub = jax.random.split(key)
                z, z_sl = forward(params, x, x_sl_j, sub)
                z = [z] if not isinstance(z, (list, tuple)) else list(z)
                z_sl = [z_sl] * len(z) if not isinstance(z_sl, (list, tuple)) else list(z_sl)
                for i, (zi, sli) in enumerate(zip(z, z_sl)):
                    reps[i].append(np.asarray(jax.device_get(zi)))
                    lengths[i] = np.asarray(jax.device_get(sli))

            for i in reps.keys():
                reps[i] = np.mean(np.stack(reps[i], 0), 0)  # average over samples

            example_ids = [m.example_id for m in metadata]
            for j, example_id in enumerate(example_ids):
                subpath = os.path.relpath(example_id, datapath)
                path = os.path.join(datapath, subpath)
                for i in reps.keys():
                    ext = f".{tag}-z{i}-n{args.num_samples}.npy"
                    z_ij = reps[i][j][: int(lengths[i][j])]
                    if args.dry:
                        print(f"Dry run: would save {z_ij.shape} to: {path}{ext}")
                    else:
                        os.makedirs(os.path.dirname(path), exist_ok=True)
                        np.save(path + ext, z_ij)

    print("Done.")


if __name__ == "__main__":
    main()
