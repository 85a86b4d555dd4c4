"""Shared experiment argument parser with argument groups.

Rebuild of reference ``blvm/utils/argparsers.py:14-88``: the same groups
(setup/data/training/optimizer/scheduler/wandb) so reference run-spec commands
(``benchmarks.txt``) parse unchanged. DDP flags are replaced by mesh flags
(``--n_devices``); AMP by ``--bf16`` (no loss scaler on TPU). Optimizer/
scheduler selection reflects into optax (``blvm_tpu/training/optim.py``).
"""

import argparse
import json
from functools import partial

from blvm_tpu.data.datasets import DATASETS
from blvm_tpu.utils.argparsing import float_or_str, int_or_str, parse_args_by_group, str2bool
from blvm_tpu.utils.rand import get_random_seed


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()

    setup_group = parser.add_argument_group("setup")
    setup_group.add_argument("--seed", type=int, default=get_random_seed())
    setup_group.add_argument("--device", type=int_or_str, default="auto")
    setup_group.add_argument("--use_amp", type=str2bool, default=False, help="accepted for compatibility; see --bf16")
    setup_group.add_argument("--bf16", type=str2bool, default=False, help="bfloat16 activations (likelihoods stay f32)")
    setup_group.add_argument("--num_workers", type=int, default=4, help="number of loader threads")
    setup_group.add_argument("--save_checkpoints", type=str2bool, default=False)
    setup_group.add_argument("--test_every", type=int, default=10, help="test every number of epochs")
    setup_group.add_argument("--run_dir", type=str, default=None, help="output directory (checkpoints, metrics.jsonl)")
    setup_group.add_argument("--profile_dir", type=str, default=None, help="jax.profiler trace dir (first epoch)")
    setup_group.add_argument(
        "--metric_fetch_lag",
        type=int,
        default=8,
        help="fetch step metrics K steps late so the per-step device_get never stalls "
        "the TPU async-dispatch pipeline (0 = synchronous per-step fetch). Exact: "
        "every step's metrics land before the epoch aggregate (running means are "
        "order-independent); the rate-limited console line trails by <= K steps. "
        "When debugging a failing step, set 0 — with a lag, a device error "
        "materializes up to K steps after the batch that caused it",
    )
    setup_group.add_argument(
        "--device_prefetch_depth",
        type=int,
        default=2,
        help="pad + device_put train batches this many steps ahead so the host-to-device "
        "transfer overlaps compute (1 = place at use time)",
    )
    setup_group.add_argument(
        "--log_norms",
        type=str2bool,
        default=False,
        help="log global grad/param norms each epoch (wandb.watch equivalent)",
    )
    setup_group.add_argument(
        "--init_checkpoint",
        type=str,
        default=None,
        help="initialize model parameters from a saved model checkpoint directory "
        "(model_params.msgpack) instead of random init; optimizer state starts fresh "
        "(unlike --resume, which restores the full run)",
    )
    setup_group.add_argument(
        "--sampler_shared_rng",
        type=str2bool,
        default=False,
        help="all samplers draw from ONE random.Random(seed) in construction order, "
        "reproducing the reference's global-random stream exactly (its samplers share "
        "python's global RNG — length_samplers.py:149,166). Used by the convergence "
        "parity harness to make both frameworks see identical batch plans",
    )

    data_group = parser.add_argument_group("data")
    data_group.add_argument("--dataset", type=str, default=None, choices=list(DATASETS.keys()))
    data_group.add_argument("--bucket_multiple", type=int, default=1024, help="time-axis shape bucket size")
    data_group.add_argument("--batch_size_bucket_base", type=int, default=8, help="pow2 batch-size bucket base")

    train_group = parser.add_argument_group("training")
    train_group.add_argument(
        "--eval_iw_samples",
        type=int,
        default=0,
        help="K>0: report the K-sample importance-weighted bound (bits/frame) at eval time",
    )
    train_group.add_argument("--epochs", type=int, default=10)
    train_group.add_argument("--batch_size", type=int, default=0, help="batch size in number of examples")
    train_group.add_argument("--batch_len", type=float_or_str, default=0, help="batch size in total timesteps")
    train_group.add_argument("--lr", type=float, default=3e-4)
    train_group.add_argument("--length_sampler", type=str2bool, default=False)
    train_group.add_argument("--debug_epoch_break_steps", type=int, default=None)
    train_group.add_argument(
        "--accum_steps",
        type=int,
        default=1,
        help="gradient-accumulation microbatches per optimizer step; the update is the "
        "frames-weighted full-batch gradient (exact), trading step latency for HBM "
        "footprint — the capacity escape for STCN-sized models (NOTES.md round 3)",
    )
    train_group.add_argument(
        "--accum_unroll",
        type=str2bool,
        default=False,
        help="trace accumulation microbatches unrolled (no scan barrier) so XLA can "
        "interleave the independent chains; mathematically the same update "
        "(float-tolerance tested, train_step.py)",
    )

    optim_group = parser.add_argument_group("optimizer")
    optim_group.add_argument("--optimizer", type=str, default="Adam")
    optim_group.add_argument("--optimizer_kwargs", type=json.loads, default=dict())
    optim_group.add_argument("--max_grad_norm", type=float, default=float("inf"))
    optim_group.add_argument("--max_grad_value", type=float, default=float("inf"))
    optim_group.add_argument("--lr_scheduler", type=str, default="ExponentialLR")
    optim_group.add_argument("--lr_scheduler_kwargs", type=json.loads, default=dict(gamma=1))

    parser.add_argument_group("scheduler")

    mesh_group = parser.add_argument_group("mesh")
    mesh_group.add_argument("--n_devices", type=int, default=None, help="devices in the data-parallel mesh (default all)")
    mesh_group.add_argument(
        "--model_axis_size",
        type=int,
        default=1,
        help="tensor-parallel mesh axis size (2-D (data, model) mesh; model-specific partition rules required)",
    )
    mesh_group.add_argument(
        "--seq_axis_size",
        type=int,
        default=1,
        help="sequence-parallel mesh axis size: batches shard their TIME axis over it "
        "(conv families only — WaveNet/STCN/CWVAE; GSPMD inserts dilated-conv halo exchanges "
        "over ICI). Scales max trainable sequence length beyond one chip's HBM",
    )
    mesh_group.add_argument(
        "--pipeline_axis_size",
        type=int,
        default=1,
        help="pipeline-parallel mesh axis size: the conv residual stack is cut into this many "
        "stages of whole dilation stacks (must divide n_stacks) and microbatches stream through "
        "them GPipe-style (WaveNet and STCN; see parallel/pipeline_parallel.py). Shards the "
        "DEPTH axis of activations and optimizer memory",
    )
    mesh_group.add_argument(
        "--pipeline_microbatches",
        type=int,
        default=4,
        help="microbatches in flight per pipelined step (bubble fraction = (stages-1)/(this+stages-1); "
        "the batch size must be divisible by it)",
    )
    mesh_group.add_argument(
        "--fsdp",
        type=str2bool,
        default=False,
        help="fully-sharded data parallelism (ZeRO-3): shard parameters AND Adam moments over the "
        "data axis instead of replicating them (per-device state memory scales 1/data_axis; GSPMD "
        "all-gathers params on use and reduce-scatters gradients). Composes with --model_axis_size",
    )
    mesh_group.add_argument(
        "--fsdp_min_size",
        type=int,
        default=None,
        help="leaves with fewer elements than this stay replicated under --fsdp "
        "(default 16384: gathering tiny biases costs more latency than replication costs HBM)",
    )
    mesh_group.add_argument(
        "--num_seeds",
        type=int,
        default=1,
        help="train this many independent replicas (different init/rng seeds) in ONE program: "
        "the seed axis is vmapped and sharded over the data axis (parallel/multiseed.py) — the "
        "TPU-native form of the reference's schedule_experiments.py process-per-seed sweeps. "
        "Must be a multiple of the data axis size; metrics log per seed as '<source>[s<i>]'",
    )
    mesh_group.add_argument(
        "--dist_coordinator",
        type=str,
        default=None,
        help="host:port of process 0 — joins a multi-host cluster via jax.distributed.initialize "
        "(or set BLVM_TPU_COORDINATOR/NUM_PROCESSES/PROCESS_ID, or BLVM_TPU_DIST=auto on TPU pods)",
    )
    mesh_group.add_argument("--dist_num_processes", type=int, default=None, help="total processes in the cluster")
    mesh_group.add_argument("--dist_process_id", type=int, default=None, help="this process's id (0-based)")

    wandb_group = parser.add_argument_group("wandb")
    wandb_group.add_argument("--entity", type=str, default=None)
    wandb_group.add_argument("--project", type=str, default=None)
    wandb_group.add_argument("--id", type=str, default=None)
    wandb_group.add_argument("--name", type=str, default=None)
    wandb_group.add_argument("--tags", type=str, nargs="+", default=None)
    wandb_group.add_argument("--group", type=str, default=None)
    wandb_group.add_argument("--notes", type=str, default=None)
    wandb_group.add_argument("--resume", type=str, default=None)
    wandb_group.add_argument("--mode", type=str, default=None, choices=["online", "offline", "disabled"])
    wandb_group.add_argument("--job_type", type=str, default=None)

    parser.parse_args_by_group = partial(parse_args_by_group, parser)

    # Multi-host must join the cluster BEFORE the first backend-initializing
    # JAX call, and the drivers' very next line is typically
    # ``jax.device_count()``. Hooking the join into parse_args puts it at the
    # earliest point every driver shares; a no-op without the dist flags/env.
    inner_parse = parser.parse_args

    def parse_args_then_join_cluster(*a, **kw):
        args = inner_parse(*a, **kw)
        from blvm_tpu.parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed(args)
        return args

    parser.parse_args = parse_args_then_join_cluster
    return parser
