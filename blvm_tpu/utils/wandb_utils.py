"""wandb integration: run lookup, resume detection, checkpoint restore.

Rebuild of reference ``blvm/utils/wandb.py:24-124``. wandb is OPTIONAL here
(the JSONL sink in the tracker is the always-on system of record); every
function degrades gracefully when wandb is not installed or not configured.
"""

import concurrent.futures
import os
from pathlib import Path
from typing import Optional

from blvm_tpu.settings import CHECKPOINT_DIRECTORY, LOGGER, WANDB_PROJECT


def _wandb():
    try:
        import wandb

        return wandb
    except ImportError:
        return None


def wandb_available() -> bool:
    return _wandb() is not None


def get_run(run_id: str, project: Optional[str] = None, entity: Optional[str] = None):
    """Fetch a run object from the wandb API (reference ``wandb.py:24-29``)."""
    wandb = _wandb()
    if wandb is None:
        raise RuntimeError("wandb is not installed; restore from a local checkpoint directory instead")
    api = wandb.Api()
    path = "/".join(p for p in (entity, project or WANDB_PROJECT, run_id) if p)
    return api.run(path)


def is_run_resumed() -> bool:
    """True when the current process is resuming a wandb run
    (reference ``wandb.py:32-38``)."""
    wandb = _wandb()
    if wandb is None:
        return False
    if os.environ.get("WANDB_RESUME") in ("allow", "must"):
        return True
    return bool(wandb.run is not None and wandb.run.resumed)


def find_run_on_disk(run_id: str, root: Optional[str] = None) -> Optional[str]:
    """Locate a previously-downloaded run directory (reference ``wandb.py:42-56``)."""
    root = Path(root or CHECKPOINT_DIRECTORY)
    if not root.exists():
        return None
    for candidate in sorted(root.glob(f"**/*{run_id}*")):
        if candidate.is_dir():
            return str(candidate)
    return None


def restore_run(run_or_id, project: Optional[str] = None, entity: Optional[str] = None, exclude: str = "", root: Optional[str] = None) -> str:
    """Download a run's checkpoint files with a thread pool; returns the local
    directory (reference ``wandb.py:59-124``). Cached if already on disk."""
    run = run_or_id if not isinstance(run_or_id, str) else get_run(run_or_id, project, entity)

    target = Path(root or CHECKPOINT_DIRECTORY) / f"{run.project}-{run.id}"
    if target.exists() and any(target.iterdir()):
        LOGGER.info(f"Using cached run files at {target}")
        return str(target)
    target.mkdir(parents=True, exist_ok=True)

    files = [f for f in run.files() if not (exclude and exclude in f.name)]

    def fetch(f):
        f.download(root=str(target), replace=True)
        return f.name

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        for name in pool.map(fetch, files):
            LOGGER.info(f"Downloaded {name}")

    return str(target)
