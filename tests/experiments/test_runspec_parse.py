"""Every benchmarks.txt / phoneme.txt run-spec command must parse through its
driver's argument parser (CLI parity with the reference run specs)."""

import importlib
import shlex
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT / "experiments"))


def iter_commands(run_file):
    for line in (REPO_ROOT / "experiments" / run_file).read_text().splitlines():
        line = line.strip().rstrip(";")
        if line.startswith("python"):
            yield line


def parse_with_driver(command, monkeypatch):
    parts = shlex.split(command)
    script = Path(parts[1]).stem
    monkeypatch.setattr(sys, "argv", [parts[1]] + parts[2:])
    driver = importlib.import_module(script)
    return driver.build_args()


BENCH_COMMANDS = list(iter_commands("benchmarks.txt"))
PHONEME_COMMANDS = [c for c in iter_commands("phoneme.txt") if "-dir" not in c and ".npy" not in c]


class TestRunSpecsParse:
    @pytest.mark.parametrize("command", BENCH_COMMANDS, ids=lambda c: shlex.split(c)[1].split("/")[-1] + str(hash(c) % 1000))
    def test_benchmark_commands_parse(self, command, monkeypatch):
        args = parse_with_driver(command, monkeypatch)
        assert args.dataset in ("timit", "librispeech_100h", "librilight_train_10h")
        assert args.epochs == 3

    @pytest.mark.parametrize("command", PHONEME_COMMANDS, ids=lambda c: str(hash(c) % 10000))
    def test_phoneme_commands_parse(self, command, monkeypatch):
        args = parse_with_driver(command, monkeypatch)
        assert args.hidden_size == 256
        assert args.bidirectional is True
