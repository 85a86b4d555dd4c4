"""DevicePrefetcher: batches arrive on device, order preserved, sharded."""

import numpy as np
import pytest

import jax

from blvm_tpu.data.dataloader import DevicePrefetcher
from blvm_tpu.parallel import batch_sharding, make_mesh


class TestDevicePrefetcher:
    def test_order_and_values(self):
        batches = [{"x": np.full((4, 3), i, np.float32)} for i in range(5)]
        out = list(DevicePrefetcher(batches, depth=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            np.testing.assert_array_equal(np.asarray(b["x"]), i)

    def test_sharded_prefetch(self):
        mesh = make_mesh(8)
        sharding = batch_sharding(mesh)
        batches = [{"x": np.arange(16, dtype=np.float32).reshape(16, 1)} for _ in range(3)]
        out = list(DevicePrefetcher(batches, sharding=sharding, depth=2))
        for b in out:
            assert b["x"].sharding.is_equivalent_to(sharding, ndim=2)

    def test_non_array_leaves_pass_through(self):
        batches = [{"x": np.ones(2, np.float32), "meta": "hello"}]
        out = list(DevicePrefetcher(batches))
        assert out[0]["meta"] == "hello"
