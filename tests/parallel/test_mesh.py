"""Tests for mesh construction, batch sharding and multi-host helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch
from blvm_tpu.parallel.mesh import pad_batch_to_devices, shard_examples_by_process


class TestMesh:
    def test_make_mesh_sizes(self):
        mesh = make_mesh(4)
        assert mesh.devices.size == 4
        mesh = make_mesh(8)
        assert mesh.devices.size == 8

    def test_shard_batch_layout(self):
        mesh = make_mesh(8)
        batch = {"x": np.ones((16, 10), np.float32), "x_sl": np.full(16, 10), "scalar": np.float32(2.0)}
        sharded = shard_batch(batch, mesh)
        # batch axis split over 8 devices
        assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
        assert sharded["scalar"].sharding.is_equivalent_to(replicated_sharding(mesh), ndim=0)
        np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])

    def test_computation_on_sharded_batch(self):
        mesh = make_mesh(8)
        x = np.arange(32, dtype=np.float32).reshape(32, 1)
        sharded = shard_batch({"x": x}, mesh)
        total = jax.jit(lambda b: b["x"].sum())(sharded)
        assert float(total) == x.sum()

    def test_pad_batch_to_devices(self):
        x = np.ones((5, 7), np.float32)
        sl = np.full(5, 7)
        x2, sl2 = pad_batch_to_devices(x, sl, 4)
        assert x2.shape[0] == 8
        np.testing.assert_array_equal(sl2[5:], 0)
        x3, sl3 = pad_batch_to_devices(x, sl, 5)
        assert x3.shape[0] == 5  # already divisible

    def test_shard_examples_by_process(self):
        examples = list(range(10))
        shards = [shard_examples_by_process(examples, pi, 3) for pi in range(3)]
        assert sorted(sum(shards, [])) == examples
        assert all(len(s) >= 3 for s in shards)

    def test_make_global_batch_single_process(self):
        """Single-host make_global_batch must equal shard_batch (the multi-host
        path is exercised by test_multihost.py)."""
        from blvm_tpu.parallel import make_global_batch

        mesh = make_mesh(8)
        batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2), "scalar": np.float32(3.0)}
        global_batch = make_global_batch(batch, mesh)
        assert global_batch["x"].sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
        assert global_batch["scalar"].sharding.is_equivalent_to(replicated_sharding(mesh), ndim=0)
        np.testing.assert_array_equal(np.asarray(global_batch["x"]), batch["x"])
        total = jax.jit(lambda b: b["x"].sum())(global_batch)
        assert float(total) == batch["x"].sum()
