"""Run checkpoint/resume: model + optimizer state + schedules + epoch.

Rebuild of reference ``blvm/training/restore.py:16-99``: the model saves its
three-part checkpoint via ``BaseModel.save`` and the run adds a ``checkpoint``
file with epoch, optimizer state, LR-schedule and annealer states. Saving is
gated on best-eval-metric by the experiment drivers, exactly as the reference.
"""

import json
import os
from typing import Optional

import jax
from flax import serialization

from blvm_tpu.models.base import load_model
from blvm_tpu.settings import LOGGER

CHECKPOINT_OPT_STR = "checkpoint_opt_state.msgpack"
CHECKPOINT_META_STR = "checkpoint.json"


def save_run(
    directory: str,
    model=None,
    params=None,
    opt_state=None,
    annealers: Optional[dict] = None,
    tracker=None,
    step: Optional[int] = None,
):
    """Save model (class/kwargs/params) plus run state under ``directory``."""
    os.makedirs(directory, exist_ok=True)
    model.save(directory, params)

    if opt_state is not None:
        with open(os.path.join(directory, CHECKPOINT_OPT_STR), "wb") as f:
            f.write(serialization.to_bytes(opt_state))

    meta = {
        "epoch": tracker.epoch if tracker is not None else None,
        "step": int(step) if step is not None else None,
        "annealer_states": {k: a.state_dict() for k, a in (annealers or {}).items()},
    }
    with open(os.path.join(directory, CHECKPOINT_META_STR), "w") as f:
        json.dump(meta, f, indent=2)
    LOGGER.info(f"Saved checkpoint at {directory}")


def load_run(
    directory: str,
    model_class=None,
    tx=None,
    annealers: Optional[dict] = None,
    raise_errors: bool = True,
    opt_state_params_fn=None,
):
    """Load a run: returns ``(model, params, opt_state, meta)``.

    ``tx`` (the optax optimizer) is needed to rebuild the opt-state structure
    before byte-restoring it; pass None to skip optimizer state.
    ``opt_state_params_fn`` maps the loaded (canonical-layout) params to the
    layout the optimizer state was SAVED over — e.g. the pipeline-parallel
    stage-stacked layout (``parallel/pipeline_parallel.py``), whose Adam
    moments mirror that layout rather than the checkpointed params.
    """
    LOGGER.info(f"Loading run files from: {directory}")

    if model_class is not None:
        model, params = model_class.load(directory)
    else:
        model, params = load_model(directory)

    opt_state = None
    if tx is not None:
        opt_path = os.path.join(directory, CHECKPOINT_OPT_STR)
        try:
            opt_state = tx.init(opt_state_params_fn(params) if opt_state_params_fn else params)
            with open(opt_path, "rb") as f:
                opt_state = serialization.from_bytes(opt_state, f.read())
            opt_state = jax.tree_util.tree_map(jax.numpy.asarray, opt_state)
        except FileNotFoundError as exc:
            LOGGER.warning(f"Failed to load optimizer state: {exc}")
            if raise_errors:
                raise

    meta = {}
    meta_path = os.path.join(directory, CHECKPOINT_META_STR)
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except FileNotFoundError as exc:
        LOGGER.warning(f"Failed to load checkpoint file: {exc}")
        if raise_errors:
            raise

    for name, state in meta.get("annealer_states", {}).items():
        if annealers and name in annealers:
            annealers[name].load_state_dict(state)

    return model, params, opt_state, meta
