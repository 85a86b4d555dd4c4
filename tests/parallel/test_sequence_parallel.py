"""Sequence (context) parallelism: the TIME axis of conv-family batches
shards over a ``seq`` mesh axis and GSPMD inserts the dilated-conv halo
exchanges. Numerical equivalence vs single-device is exact for the loss and
float-tolerance for params; the compiled HLO must contain NO all-gather of
the time axis (halos are small collective-permutes) — that property is what
makes the feature a memory-scaling lever rather than a resharding trap.

The reference has no model/sequence parallelism at all (SURVEY §2.8); this is
TPU-added capability: max trainable sequence length scales with the seq axis
instead of being bounded by one chip's HBM.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from blvm_tpu.models import STCN, WaveNet
from blvm_tpu.parallel import (
    STCN_TP_RULES,
    WAVENET_TP_RULES,
    leaf_sharding,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
)
from blvm_tpu.training import TrainState, get_optimizer


def make_state(model, x, x_sl, optimizer="Adam"):
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x, x_sl)
    )(jax.random.PRNGKey(0))
    tx = get_optimizer(optimizer, 1e-3)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, rng=jax.random.PRNGKey(2)
    )


def make_loss_fn(model):
    def loss_fn(params, rng, batch, scalars):
        loss, mets, _ = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng}
        )
        return loss, (mets, None)

    return loss_fn


def assert_params_close(state_a, state_b, atol=2e-5):
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestMeshAndSharding:
    def test_seq_mesh_axes(self):
        mesh = make_mesh(8, seq_axis_size=4)
        assert dict(mesh.shape) == {"data": 2, "seq": 4}
        mesh = make_mesh(8, seq_axis_size=2, model_axis_size=2)
        assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(8, seq_axis_size=3)

    def test_leaf_sharding_ranks(self):
        mesh = make_mesh(8, seq_axis_size=4)
        assert leaf_sharding(np.zeros(()), mesh).spec == P()
        assert leaf_sharding(np.zeros((8,)), mesh).spec == P("data")
        assert leaf_sharding(np.zeros((8, 64)), mesh).spec == P("data", "seq")
        with pytest.raises(ValueError):
            leaf_sharding(np.zeros((8, 63)), mesh)  # time not divisible by seq=4

    def test_without_seq_axis_unchanged(self):
        mesh = make_mesh(8)
        assert leaf_sharding(np.zeros((8, 64)), mesh).spec == P("data")

    def test_only_time_leaves_seq_shard(self):
        """Only SEQ_SHARDED_KEYS leaves ('x') shard their second axis: a
        rank-2 label matrix y (batch, text_len) must stay batch-only even
        when its length happens to divide the seq axis."""
        from blvm_tpu.parallel.mesh import batch_shardings

        mesh = make_mesh(8, seq_axis_size=4)
        batch = {"x": np.zeros((8, 64)), "x_sl": np.zeros((8,)), "y": np.zeros((8, 16)), "y_sl": np.zeros((8,))}
        sh = batch_shardings(batch, mesh)
        assert sh["x"].spec == P("data", "seq")
        assert sh["y"].spec == P("data")
        assert sh["x_sl"].spec == P("data")

    def test_numpy_batch_still_sharded_by_step(self):
        """A host/numpy batch passed WITHOUT shard_batch to a seq-mesh train
        step is still placed correctly (in-jit sharding constraint), not
        silently replicated."""
        model = WaveNet(n_layers=2, n_stacks=1, res_channels=16, num_mix=2)
        B, T = 4, 256
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, x, x_sl)
        new1, mets1 = make_train_step(loss_fn, mesh=mesh1, donate=False)(
            state1, {"x": x, "x_sl": x_sl}, {}
        )

        mesh = make_mesh(8, seq_axis_size=4)
        state = make_state(model, x, x_sl)
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        new8, mets8 = step(state, {"x": np.asarray(x), "x_sl": np.asarray(x_sl)}, {})
        np.testing.assert_allclose(float(mets1["loss"]), float(mets8["loss"]), rtol=1e-5)
        # the compiled step really placed x over (data, seq)
        hlo = step.lower(state, {"x": np.asarray(x), "x_sl": np.asarray(x_sl)}, {}).compile().as_text()
        assert "all-gather" not in hlo


class TestSPTrainStepEquivalence:
    def _run_pair(self, model, rules, B, T, sp_kwargs, atol=2e-5):
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, T)), jnp.float32)
        # ragged lengths: the masked loss must stay exact under a sharded mask
        x_sl = jnp.asarray([T, T, T - 7, T - 31] * (B // 4), jnp.int32)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, x, x_sl)
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        new1, mets1 = step1(state1, {"x": x, "x_sl": x_sl}, {})

        mesh = make_mesh(8, **sp_kwargs)
        state = make_state(model, x, x_sl)
        if sp_kwargs.get("model_axis_size", 1) > 1:
            state = shard_train_state(state, mesh, rules)
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        assert batch["x"].sharding.spec[1] == "seq"
        new8, mets8 = step(state, batch, {})

        np.testing.assert_allclose(float(mets1["loss"]), float(mets8["loss"]), rtol=1e-5)
        assert_params_close(new1, new8, atol=atol)

    def test_wavenet_dp_sp_matches_single_device(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        self._run_pair(model, WAVENET_TP_RULES, B=4, T=256, sp_kwargs=dict(seq_axis_size=4))

    def test_wavenet_3d_mesh_dp_sp_tp(self):
        """The full (data, seq, model) mesh: halo exchange + TP collectives
        compose in one step."""
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        self._run_pair(
            model, WAVENET_TP_RULES, B=4, T=256, sp_kwargs=dict(seq_axis_size=2, model_axis_size=2)
        )

    def test_wavenet_frame_stacked_dp_sp(self):
        """Frame stacking reshapes (B, T) -> (B, T/s, s*C); the sharded time
        axis must propagate through the reshape."""
        model = WaveNet(n_layers=2, n_stacks=2, res_channels=16, num_mix=2, n_stack_frames=8)
        self._run_pair(model, WAVENET_TP_RULES, B=4, T=512, sp_kwargs=dict(seq_axis_size=4))

    def test_stcn_dp_sp_matches_single_device(self):
        model = STCN(n_layers=2, latent_size=(8, 4), res_channels=16)
        self._run_pair(model, STCN_TP_RULES, B=4, T=256, sp_kwargs=dict(seq_axis_size=4))

    def test_cwvae_dp_sp_matches_single_device(self):
        """CWVAE: the conv coders carry the full-T activations (the HBM
        load) — GSPMD shards them over the seq axis; the tiny post-encoder
        latent sequence (T/prod(strides)) is gathered before the RSSM scans,
        which is cheap by construction. Enabled by the shift-mul depthwise
        lowering (the grouped-conv form miscompiles kernel grads under
        multi-axis sharding — modules/convolutions.py, pinned in
        tests/modules/test_depthwise_spmd.py).

        Uses SGD rather than the harness's Adam: GroupNorm reduces over the
        sharded time axis, so per-position values reassociate at float
        epsilon; Adam's g/sqrt(nu) normalization turns sub-ulp noise on
        near-zero gradients into O(lr) parameter flips, while SGD keeps the
        comparison linear in the noise. Loss is compared strictly either way.
        """
        from blvm_tpu.models import CWVAEAudio

        model = CWVAEAudio(
            z_size=4, h_size=8, strides=(4, 2), num_level_layers=2, stride_per_layer=2,
            likelihood="DMoL", num_mix=2,
        )
        B, T = 4, 256
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.asarray([T, T, T - 7, T - 31], jnp.int32)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, x, x_sl, optimizer="SGD")
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        new1, mets1 = step1(state1, {"x": x, "x_sl": x_sl}, {})

        mesh = make_mesh(8, seq_axis_size=4)
        state = make_state(model, x, x_sl, optimizer="SGD")
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        assert batch["x"].sharding.spec[1] == "seq"
        new8, mets8 = step(state, batch, {})

        np.testing.assert_allclose(float(mets1["loss"]), float(mets8["loss"]), rtol=1e-5)
        assert_params_close(new1, new8, atol=2e-5)

    def test_accum_dp_sp_matches_single_device(self):
        """Gradient accumulation (microbatch scan) composes with the seq axis."""
        model = WaveNet(n_layers=2, n_stacks=2, res_channels=16, num_mix=2)
        B, T = 8, 256
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, x, x_sl)
        new1, mets1 = make_train_step(loss_fn, mesh=mesh1, donate=False)(
            state1, {"x": x, "x_sl": x_sl}, {}
        )

        mesh = make_mesh(8, seq_axis_size=4)
        state = make_state(model, x, x_sl)
        step = make_train_step(
            loss_fn, mesh=mesh, donate=False, accum=2, loss_weight=lambda mb, m: mb["x_sl"].sum()
        )
        new8, mets8 = step(state, shard_batch({"x": x, "x_sl": x_sl}, mesh), {})
        np.testing.assert_allclose(float(mets1["loss"]), float(mets8["loss"]), rtol=1e-5)
        assert_params_close(new1, new8, atol=5e-5)


class TestNoTimeAllGather:
    def test_halo_exchange_not_allgather(self):
        """The compiled dp x sp WaveNet step must move halos (small
        collective-permutes), never all-gather the full time axis — the
        property that makes seq sharding an HBM-scaling lever."""
        model = WaveNet(n_layers=4, n_stacks=2, res_channels=16, num_mix=2)
        B, T = 4, 2048
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        loss_fn = make_loss_fn(model)

        mesh = make_mesh(8, seq_axis_size=4)
        state = make_state(model, x, x_sl)
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        hlo = step.lower(state, batch, {}).compile().as_text()

        assert "all-gather" not in hlo, "GSPMD all-gathered instead of halo-exchanging"
        assert "all-to-all" not in hlo
        # halos exist and are narrow: every collective-permute moves at most
        # receptive-field-wide (<= 2 * max_dilation) slices, not T/4 shards
        widths = [
            int(m.group(1))
            for m in re.finditer(r"collective-permute[^=]*= \w+\[\d+,(\d+)", hlo)
        ]
        assert widths, "no halo exchanges found"
        local_t = T // 4
        assert max(widths) < local_t // 4, f"halo width {max(widths)} ~ shard size {local_t}"
