"""Optimizer introspection for logging (reference ``blvm/utils/optimization.py:6-17``).

optax exposes schedules as callables rather than per-param-group state, so the
equivalents resolve a schedule (or constant) at a step count.
"""

from typing import Dict, List, Union


def get_learning_rate(lr_or_schedule, step: int = 0) -> float:
    """Resolve a constant or optax schedule to its value at ``step``."""
    if callable(lr_or_schedule):
        return float(lr_or_schedule(step))
    return float(lr_or_schedule)


def get_learning_rates_list(lrs_or_schedules, step: int = 0) -> List[float]:
    if not isinstance(lrs_or_schedules, (list, tuple)):
        lrs_or_schedules = [lrs_or_schedules]
    return [get_learning_rate(lr, step) for lr in lrs_or_schedules]


def get_learning_rates_dict(lrs_or_schedules, step: int = 0) -> Dict[str, float]:
    values = get_learning_rates_list(lrs_or_schedules, step)
    if len(values) == 1:
        return {"learning_rate": values[0]}
    return {f"learning_rate_{i}": v for i, v in enumerate(values)}
