"""Device discovery and placement helpers.

Role of reference ``blvm/utils/device.py`` (nvidia-smi scraping, ``to_device``)
rebuilt for JAX: device enumeration comes from the runtime; "free device"
selection is unnecessary on TPU (one process owns the slice), but the scheduler
still uses :func:`visible_device_count` to decide process-level parallelism.
"""

from typing import Any, Optional

import jax


def get_devices(platform: Optional[str] = None):
    return jax.devices(platform) if platform else jax.devices()


def get_device(index: int = 0, platform: Optional[str] = None):
    return get_devices(platform)[index]


def visible_device_count() -> int:
    return jax.device_count()


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    return jax.process_index()


def to_device_recursive(tree: Any, device=None, sharding=None):
    """device_put a pytree (optionally with a sharding)."""
    target = sharding if sharding is not None else device
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, target), tree)


def default_backend() -> str:
    return jax.default_backend()
