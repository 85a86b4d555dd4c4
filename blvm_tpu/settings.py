"""Layered environment/config system.

Mirrors the semantics of the reference config layer (``blvm/settings.py:15-92``):
value resolution order is ``os.environ`` > ``BLVM_TPU.env`` file > default.
Unlike the reference there is no interactive prompt (automation-friendly); the
defaults are repo-local so a fresh checkout works immediately.
"""

import logging
import os
from pathlib import Path

ENV_FILE_NAME = "BLVM_TPU.env"

_REPO_ROOT = Path(__file__).resolve().parent.parent


def read_env_file() -> dict:
    """Read KEY=VALUE lines from the env file next to the repo root, if present."""
    env_path = _REPO_ROOT / ENV_FILE_NAME
    values = {}
    if env_path.exists():
        for line in env_path.read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            values[key.strip()] = value.strip()
    return values


_ENV_FILE = read_env_file()


def get_envvar(key: str, default: str = None) -> str:
    """Resolve a config variable: os.environ > env file > default."""
    if key in os.environ:
        return os.environ[key]
    if key in _ENV_FILE:
        return _ENV_FILE[key]
    return default


def write_envvar(key: str, value: str) -> None:
    """Persist a config variable to the env file (creates it if missing)."""
    _ENV_FILE[key] = value
    env_path = _REPO_ROOT / ENV_FILE_NAME
    lines = [f"{k}={v}" for k, v in _ENV_FILE.items()]
    env_path.write_text("\n".join(lines) + "\n")


def require_envvar(key: str) -> str:
    value = get_envvar(key)
    if value is None:
        raise KeyError(
            f"Required configuration variable {key} is not set. "
            f"Set it in the environment or in {ENV_FILE_NAME}."
        )
    return value


DATA_ROOT_DIRECTORY = Path(get_envvar("BLVM_TPU_DATA_ROOT", str(_REPO_ROOT / "data_root")))
DATA_DIRECTORY = DATA_ROOT_DIRECTORY / "data"
SOURCE_DIRECTORY = DATA_ROOT_DIRECTORY / "source"
VOCAB_DIRECTORY = DATA_ROOT_DIRECTORY / "vocab"
CHECKPOINT_DIRECTORY = Path(get_envvar("BLVM_TPU_CHECKPOINT_DIR", str(_REPO_ROOT / "checkpoints")))
RUNS_DIRECTORY = Path(get_envvar("BLVM_TPU_RUNS_DIR", str(_REPO_ROOT / "runs")))
WANDB_PROJECT = get_envvar("BLVM_TPU_WANDB_PROJECT", "blvm-tpu")

# Directory creation is deferred (no import side effects writing to disk unless asked).
def ensure_directories() -> None:
    for d in (DATA_DIRECTORY, SOURCE_DIRECTORY, VOCAB_DIRECTORY, CHECKPOINT_DIRECTORY, RUNS_DIRECTORY):
        Path(d).mkdir(parents=True, exist_ok=True)


def _install_logger() -> logging.Logger:
    from blvm_tpu.utils.logger import ColoredLogsFormatter

    logger = logging.getLogger("blvm_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(ColoredLogsFormatter())
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("BLVM_TPU_LOG_LEVEL", "INFO"))
    return logger


LOGGER = _install_logger()
