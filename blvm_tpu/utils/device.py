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


def enable_persistent_compile_cache(
    cache_dir: str = "/tmp/jax_compile_cache", min_compile_time_secs: float = 10.0
) -> None:
    """Opt into XLA's persistent compile cache (no-op if unsupported).

    Repeat runs skip the multi-minute first jit of the big models. Shared by
    bench.py and the experiment drivers so the cache location/threshold stay
    in sync.
    """
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs)
    except Exception:
        pass
