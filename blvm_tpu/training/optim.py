"""Optimizer and LR-schedule factories by name reflection into optax.

Role of reference ``blvm/utils/argparsers.py:79-88`` (``getattr(torch.optim,
name)``), rebuilt for optax. Gradient clipping (the reference's per-driver
``clip_grad_value_``/``clip_grad_norm_`` calls) composes into the optax chain.
"""

import math
from typing import Optional

import jax
import numpy as np
import optax

_OPTIMIZER_ALIASES = {
    # torch.optim names → optax names, so reference run-specs work unchanged
    "Adam": "adam",
    "AdamW": "adamw",
    "SGD": "sgd",
    "RMSprop": "rmsprop",
    "Adagrad": "adagrad",
    "Adadelta": "adadelta",
    "Adamax": "adamax",
    "RAdam": "radam",
    "NAdam": "nadam",
    "LAMB": "lamb",
    "LARS": "lars",
}


class EpochSchedule:
    """A learning-rate schedule denominated in EPOCHS, matching the reference's
    ``lr_scheduler.step()`` cadence: every torch-named scheduler in the
    reference drivers steps once per epoch, after the training section
    (``experiment_lstm_audio.py:258``, ``experiment_vrnn_audio.py:236``). A
    per-optimizer-step schedule with the same numbers would decay hundreds of
    times too fast — the "schedule units" drift class.

    ``factor(n)`` is the decay multiplier after ``n`` ``step()`` calls (torch
    ``get_last_lr`` semantics); the lr used DURING 1-indexed epoch ``k`` is
    therefore ``lr0 * factor(k - 1)``.
    """

    def __init__(self, init_value: float, factor):
        self.init_value = float(init_value)
        self.factor = factor

    def lr_at_epoch(self, epoch: int) -> float:
        return self.init_value * float(self.factor(max(0, int(epoch) - 1)))


def get_lr_schedule(name: Optional[str], learning_rate: float, **kwargs):
    """Resolve an LR schedule by name; None → constant learning rate.

    Torch names (``MultiStepLR``, ``ExponentialLR``, ``StepLR``,
    ``CosineAnnealingLR``, ``MultiplicativeLR``) return an
    :class:`EpochSchedule` — the reference steps these once per EPOCH
    (``experiment_lstm_audio.py:258``), so their milestones/step_size/T_max are
    epoch counts. optax names (``cosine_decay_schedule`` ...) return a
    per-optimizer-step optax schedule.
    """
    if name is None:
        return learning_rate

    def multistep(milestones=(), gamma=0.1):
        milestones = sorted(int(m) for m in milestones)
        return lambda n: gamma ** sum(1 for m in milestones if m <= n)

    def exponential(gamma=1.0):
        return lambda n: gamma**n

    def steplr(step_size=1, gamma=0.1):
        return lambda n: gamma ** (n // int(step_size))

    def cosine(T_max, eta_min=0.0):
        lr0 = learning_rate
        return lambda n: (eta_min + 0.5 * (lr0 - eta_min) * (1 + math.cos(math.pi * n / T_max))) / lr0

    torch_map = {
        "MultiStepLR": multistep,
        "ExponentialLR": exponential,
        "MultiplicativeLR": lambda lr_lambda=1.0: exponential(lr_lambda),
        "StepLR": steplr,
        "CosineAnnealingLR": cosine,
    }
    if name in torch_map:
        return EpochSchedule(learning_rate, torch_map[name](**kwargs))

    schedule_fn = getattr(optax, name, None)
    if schedule_fn is None:
        raise ValueError(f"Unknown LR schedule {name!r}")
    return schedule_fn(init_value=learning_rate, **kwargs)


def set_injected_learning_rate(opt_state, value):
    """Return ``opt_state`` with every ``InjectHyperparamsState``'s
    ``learning_rate`` replaced by ``value``, preserving each leaf's shape,
    dtype and sharding (so jitted steps see an identical avals signature — no
    recompile at schedule boundaries). Recurses through the (named)tuples and
    dicts optax states are made of, including ``apply_if_finite`` wrappers and
    vmapped multi-seed states."""

    def _like(old, val):
        arr = np.full(np.shape(old), val, dtype=getattr(old, "dtype", np.float32))
        if isinstance(old, jax.Array):
            return jax.device_put(arr, old.sharding)
        return arr

    def _walk(node):
        # optax <0.2 uses InjectHyperparamsState, ≥0.2 InjectStatefulHyperparamsState;
        # detect structurally: a namedtuple with a 'hyperparams' dict field
        if hasattr(node, "_fields") and "hyperparams" in getattr(node, "_fields", ()):
            hyperparams = dict(node.hyperparams)
            if "learning_rate" in hyperparams:
                hyperparams["learning_rate"] = _like(hyperparams["learning_rate"], value)
            return node._replace(hyperparams=hyperparams, inner_state=_walk(node.inner_state))
        if isinstance(node, tuple):
            items = [_walk(x) for x in node]
            return type(node)(*items) if hasattr(node, "_fields") else tuple(items)
        if isinstance(node, list):
            return [_walk(x) for x in node]
        if isinstance(node, dict):
            return {k: _walk(v) for k, v in node.items()}
        return node

    return _walk(opt_state)


def get_optimizer(
    name: str,
    learning_rate,
    clip_grad_norm: Optional[float] = None,
    clip_grad_value: Optional[float] = None,
    skip_nonfinite_updates: bool = False,
    **kwargs,
) -> optax.GradientTransformation:
    """Build an optax optimizer by name with optional clipping and NaN guard.

    ``skip_nonfinite_updates`` reproduces the SRNN driver's NaN/Inf gradient
    guard (zero grads, skip the update — ``experiment_srnn_audio.py:236-240``)
    as an optax wrapper, so the step stays fully jitted.
    """
    opt_name = _OPTIMIZER_ALIASES.get(name, name)
    opt_fn = getattr(optax, opt_name, None)
    if opt_fn is None:
        raise ValueError(f"Unknown optimizer {name!r} (resolved {opt_name!r})")

    chain = []
    if clip_grad_value:
        chain.append(optax.clip(clip_grad_value))
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(opt_fn(learning_rate, **kwargs))

    tx = optax.chain(*chain)
    if skip_nonfinite_updates:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    return tx
