"""Optimizer and LR-schedule factories by name reflection into optax.

Role of reference ``blvm/utils/argparsers.py:79-88`` (``getattr(torch.optim,
name)``), rebuilt for optax. Gradient clipping (the reference's per-driver
``clip_grad_value_``/``clip_grad_norm_`` calls) composes into the optax chain.
"""

from typing import Optional

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


def get_lr_schedule(name: Optional[str], learning_rate: float, **kwargs):
    """Resolve an optax schedule by name; None → constant learning rate.

    Accepts optax names (``cosine_decay_schedule`` ...) and the torch names the
    reference exposes (``ExponentialLR``, ``CosineAnnealingLR``, ``StepLR``,
    ``MultiplicativeLR``).
    """
    if name is None:
        return learning_rate

    torch_map = {
        "ExponentialLR": lambda: optax.exponential_decay(
            init_value=learning_rate, transition_steps=kwargs.pop("transition_steps", 1), decay_rate=kwargs.pop("gamma", 0.999), **kwargs
        ),
        "MultiplicativeLR": lambda: optax.exponential_decay(
            init_value=learning_rate, transition_steps=kwargs.pop("transition_steps", 1), decay_rate=kwargs.pop("lr_lambda", 0.999), **kwargs
        ),
        "StepLR": lambda: optax.exponential_decay(
            init_value=learning_rate,
            transition_steps=kwargs.pop("step_size", 1),
            decay_rate=kwargs.pop("gamma", 0.1),
            staircase=True,
            **kwargs,
        ),
        "CosineAnnealingLR": lambda: optax.cosine_decay_schedule(
            init_value=learning_rate, decay_steps=kwargs.pop("T_max"), **kwargs
        ),
    }
    if name in torch_map:
        return torch_map[name]()

    schedule_fn = getattr(optax, name, None)
    if schedule_fn is None:
        raise ValueError(f"Unknown LR schedule {name!r}")
    return schedule_fn(init_value=learning_rate, **kwargs)


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
