"""End-to-end scheduler test: bounded-parallelism execution of a run file with
success/failure accounting and exit codes (reference
``schedule_experiments.py:84-173`` semantics)."""

import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
SCHEDULER = REPO_ROOT / "experiments" / "schedule_experiments.py"


def run_scheduler(run_file, *extra):
    return subprocess.run(
        [sys.executable, str(SCHEDULER), "--run_file", str(run_file), *extra],
        capture_output=True, text=True, timeout=120,
    )


def test_all_commands_succeed(tmp_path):
    run_file = tmp_path / "runs.txt"
    run_file.write_text(
        "# comment line ignored\n"
        f"python -c \"open(r'{tmp_path}/a.out', 'w').write('a')\"\n"
        f"python -c \"open(r'{tmp_path}/b.out', 'w').write('b')\";\n"
        "echo not-a-python-line-is-skipped\n"
    )
    result = run_scheduler(run_file, "--num_parallel", "2")
    assert result.returncode == 0, result.stdout + result.stderr
    assert "2 succeeded, 0 failed" in result.stdout
    assert (tmp_path / "a.out").read_text() == "a"
    assert (tmp_path / "b.out").read_text() == "b"


def test_failure_accounting_and_exit_code(tmp_path):
    run_file = tmp_path / "runs.txt"
    run_file.write_text(
        "python -c \"print('fine')\"\n"
        "python -c \"import sys; sys.exit(3)\"\n"
    )
    result = run_scheduler(run_file, "--num_parallel", "1")
    assert result.returncode == 1
    assert "1 succeeded, 1 failed" in result.stdout
    assert "FAILED: python -c" in result.stdout


def test_num_repeats_and_dry(tmp_path):
    run_file = tmp_path / "runs.txt"
    run_file.write_text("python -c \"print('x')\"\n")
    result = run_scheduler(run_file, "--num_repeats", "3", "--dry")
    assert result.returncode == 0
    assert "Scheduled 3 commands" in result.stdout
