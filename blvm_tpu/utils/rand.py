"""Seeding helpers (reference ``blvm/utils/rand.py:12-22``).

JAX RNG is explicit (keys thread through the program), so ``set_seed`` seeds
the host-side numpy/python RNGs used by samplers/transforms and returns a root
``jax.random`` key for the device side.
"""

import random
import time

import jax
import numpy as np


def get_random_seed() -> int:
    return int(time.time_ns() % (2**31))


def set_seed(seed: int):
    """Seed python+numpy and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
