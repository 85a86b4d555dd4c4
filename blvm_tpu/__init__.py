"""blvm_tpu — TPU-native (JAX/XLA/Pallas) framework for benchmarking generative
latent variable models of speech.

A ground-up rebuild of the capabilities of ``blvm`` (JakobHavtorn/benchmarking-lvms,
reference at /root/reference) designed for TPU hardware: static-shape bucketed
batching, ``lax.scan`` recurrent cores, XLA dilated convolutions with Pallas fused
kernels on the hot path, ``shard_map`` data parallelism over a device mesh, and
explicit PRNG key threading.
"""

__version__ = "0.1.0"

from blvm_tpu import settings  # noqa: F401  (env/config side effects)
