"""Run scheduler: execute commands from a run file with bounded parallelism.

Rebuild of reference ``experiments/schedule_experiments.py:84-173``: reads a
run-spec file (``benchmarks.txt`` / ``phoneme.txt``), filters the python
command lines, optionally repeats/shuffles them, and executes with
``--num_parallel`` slots. GPU assignment by free memory becomes TPU-aware slot
assignment: on a single-chip host runs are serialized (one process owns the
chip); with ``--assign_devices`` each slot pins a disjoint device set via
``JAX_PLATFORMS``/``TPU_VISIBLE_DEVICES``-style env.
"""

import argparse
import itertools
import os
import random
import shlex
import subprocess
import sys
from concurrent.futures import FIRST_COMPLETED, ProcessPoolExecutor, wait


def read_commands(run_file: str):
    commands = []
    with open(run_file) as f:
        for line in f:
            line = line.strip().rstrip(";")
            if line.startswith("python"):
                commands.append(line)
    return commands


def execute(command: str, env_overrides=None):
    env = dict(os.environ)
    if env_overrides:
        env.update(env_overrides)
    print(f"Executing: {command}")
    result = subprocess.run(command, shell=True, env=env)
    return command, result.returncode


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_file", type=str, required=True, help="file with one run command per line")
    parser.add_argument("--num_parallel", type=int, default=1, help="concurrent runs")
    parser.add_argument("--num_repeats", type=int, default=1, help="repeat each command N times")
    parser.add_argument("--shuffle", action="store_true", help="shuffle command order")
    parser.add_argument(
        "--assign_devices",
        action="store_true",
        help="give each parallel slot a distinct device index (multi-chip hosts)",
    )
    parser.add_argument("--dry", action="store_true", help="print commands without executing")
    args = parser.parse_args()

    commands = read_commands(args.run_file)
    commands = [c for c in commands for _ in range(args.num_repeats)]
    if args.shuffle:
        random.shuffle(commands)

    print(f"Scheduled {len(commands)} commands with {args.num_parallel} parallel slots.")
    if args.dry:
        for c in commands:
            print(c)
        return

    device_cycler = itertools.cycle(range(args.num_parallel)) if args.assign_devices else None

    successes, failures = [], []
    try:
        with ProcessPoolExecutor(max_workers=args.num_parallel) as pool:
            pending = set()
            for command in commands:
                if len(pending) >= args.num_parallel:
                    done, pending = wait(pending, return_when=FIRST_COMPLETED)
                    for fut in done:
                        cmd, code = fut.result()
                        (successes if code == 0 else failures).append(cmd)

                env = None
                if device_cycler is not None:
                    env = {"TPU_VISIBLE_DEVICES": str(next(device_cycler))}
                pending.add(pool.submit(execute, command, env))

            for fut in pending:
                cmd, code = fut.result()
                (successes if code == 0 else failures).append(cmd)
    except KeyboardInterrupt:
        print("Interrupted; terminating children.")
        raise

    print(f"\n{len(successes)} succeeded, {len(failures)} failed.")
    for cmd in failures:
        print(f"FAILED: {cmd}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
