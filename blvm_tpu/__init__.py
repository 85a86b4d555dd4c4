"""blvm_tpu — TPU-native (JAX/XLA/Pallas) framework for benchmarking generative
latent variable models of speech.

A ground-up rebuild of the capabilities of ``blvm`` (JakobHavtorn/benchmarking-lvms,
reference at /root/reference) designed for TPU hardware: static-shape bucketed
batching, ``lax.scan`` recurrent cores, XLA dilated convolutions with bf16 mixed
precision on the hot path, GSPMD data/tensor parallelism over a device mesh, and
explicit PRNG key threading.
"""

__version__ = "0.1.0"

from types import SimpleNamespace as _SimpleNamespace

import jax as _jax

# Models return their outputs as SimpleNamespace (the reference's forward
# contract, SURVEY §2.5). Register it as a pytree so outputs flow through
# jit/grad/scan unchanged.
try:
    _jax.tree_util.register_pytree_node(
        _SimpleNamespace,
        lambda ns: (tuple(vars(ns)[k] for k in sorted(vars(ns))), tuple(sorted(vars(ns)))),
        lambda keys, values: _SimpleNamespace(**dict(zip(keys, values))),
    )
except ValueError:
    pass  # already registered (re-import)

from blvm_tpu import settings  # noqa: F401,E402  (env/config side effects)
