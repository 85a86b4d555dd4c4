"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Environment variables must be set before JAX initializes its backends, so this
conftest sets them at import time (pytest imports conftest before test modules).
This gives every test access to multi-device sharding semantics without TPU
hardware — the "multi-node without a cluster" capability described in SURVEY §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax and pins JAX_PLATFORMS before
# conftest runs, so the env var alone is not enough — override the live config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # match production f32 semantics


import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running tests (multi-process smoke, convergence)")


@pytest.fixture(autouse=True)
def _restore_depthwise_impl():
    """The fsdp/multiseed entry points flip the process-wide depthwise lowering
    to "fma" and the flip is sticky by design (trace-time global); without this
    snapshot/restore, any test that shards params would silently leak "fma"
    into every later-collected test (advisor round-4 finding)."""
    from blvm_tpu.modules import convolutions

    prev = convolutions._DEPTHWISE_IMPL
    yield
    convolutions._DEPTHWISE_IMPL = prev
