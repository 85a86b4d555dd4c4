"""FSDP (ZeRO-3): shape-based state sharding over the data axis. The specs
must compose with tensor-parallel rules, leaves must actually land sharded
(1/N per-device bytes), and the sharded train step must match single-device
numerics exactly — GSPMD inserts the param all-gathers and the gradient
reduce-scatter, the math must not change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from blvm_tpu.models import WaveNet
from blvm_tpu.parallel import (
    WAVENET_TP_RULES,
    fsdp_shardings,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state_fsdp,
)
from blvm_tpu.training import TrainState, get_optimizer


def make_state(model, x, x_sl, has_sample_rng=True):
    rngs = {"params": jax.random.PRNGKey(0)}
    if has_sample_rng:
        rngs["sample"] = jax.random.PRNGKey(1)
    variables = jax.jit(lambda: model.init(rngs, x, x_sl))()
    tx = get_optimizer("Adam", 1e-3)
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


def run_steps(step, state, batches, mesh=None):
    losses = []
    for b in batches:
        b = b if mesh is None else shard_batch(b, mesh)
        state, mets = step(state, b, {})
        losses.append(float(mets["loss"]))
    return state, losses


def _path_names(path):
    return [str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))) for k in path]


def params_close(p1, p2, atol=2e-5):
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestFsdpSpecs:
    def test_largest_free_dim_shards(self):
        mesh = make_mesh(8)
        tree = {"w": jnp.zeros((2, 16, 24))}
        sh = fsdp_shardings(tree, mesh, min_leaf_elems=0)
        # 24 > 16, both divide 8 -> dim 2
        assert sh["w"].spec == P(None, None, "data")

    def test_small_leaf_replicated_by_default(self):
        mesh = make_mesh(8)
        tree = {"b": jnp.zeros((96,)), "w": jnp.zeros((256, 256))}
        sh = fsdp_shardings(tree, mesh)  # default min_leaf_elems = 2**14
        assert sh["b"].spec == P()
        assert sh["w"].spec == P("data")

    def test_no_divisible_dim_stays_replicated(self):
        mesh = make_mesh(8)
        tree = {"w": jnp.zeros((3, 5, 7))}
        sh = fsdp_shardings(tree, mesh, min_leaf_elems=0)
        assert sh["w"].spec == P()

    def test_composes_with_tp_rules(self):
        mesh = make_mesh(8, model_axis_size=2)
        # gate_kernel_t is TP column-parallel on dim 2; FSDP must pick dim 1
        tree = {"gate_kernel_t": jnp.zeros((2, 16, 16)), "rs_bias": jnp.zeros((32,))}
        sh = fsdp_shardings(tree, mesh, base_rules=WAVENET_TP_RULES, min_leaf_elems=0)
        assert sh["gate_kernel_t"].spec == P(None, "data", "model")
        assert sh["rs_bias"].spec == P("data")

    def test_missing_axis_raises(self):
        mesh = make_mesh(8)
        with pytest.raises(ValueError):
            fsdp_shardings({"w": jnp.zeros((8, 8))}, mesh, axis="nope")


class TestFsdpTrainEquivalence:
    def _batches(self, B, T, n=3):
        rng = np.random.default_rng(0)
        out = []
        for _ in range(n):
            x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
            out.append({"x": x, "x_sl": jnp.full((B,), T, jnp.int32)})
        return out

    def test_wavenet_fsdp_matches_single_device(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 128
        batches = self._batches(B, T)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        final1, losses1 = run_steps(step1, state1, batches)

        mesh = make_mesh(8)
        state = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        state = shard_train_state_fsdp(state, mesh, min_leaf_elems=0)
        # params AND Adam moments landed sharded: 1/8 of the bytes per device
        gk = state.params["res_stack"]["Conv1dResidualGLU_0"]["gate_kernel_t"]
        assert gk.sharding.spec != P()
        shard = gk.addressable_shards[0].data
        assert shard.size == gk.size // 8
        mu_gk = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
            if "mu" in _path_names(path) and _path_names(path)[-1] == "gate_kernel_t"
        ]
        assert mu_gk and all(m.sharding.spec == gk.sharding.spec for m in mu_gk)
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        final8, losses8 = run_steps(step, state, batches, mesh)

        np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
        params_close(final1.params, final8.params)

    def test_wavenet_fsdp_composes_with_tp(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 128
        batches = self._batches(B, T)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        final1, losses1 = run_steps(step1, state1, batches)

        mesh = make_mesh(8, model_axis_size=2)
        state = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        state = shard_train_state_fsdp(state, mesh, tp_rules=WAVENET_TP_RULES, min_leaf_elems=0)
        gk = state.params["res_stack"]["Conv1dResidualGLU_0"]["gate_kernel_t"]
        assert gk.sharding.spec == P(None, "data", "model")
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        final8, losses8 = run_steps(step, state, batches, mesh)

        np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
        params_close(final1.params, final8.params)

    def test_lstm_fsdp_matches_single_device(self):
        """Recurrent scan core: the sharded kernels thread a lax.scan —
        GSPMD must hoist ONE all-gather out of the loop, and the numbers
        must still match single-device."""
        from blvm_tpu.models import LSTMAudio

        model = LSTMAudio(stack_size=16, hidden_size=32, num_mix=2)
        B, T = 8, 256
        batches = self._batches(B, T)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        final1, losses1 = run_steps(step1, state1, batches)

        mesh = make_mesh(8)
        state = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        state = shard_train_state_fsdp(state, mesh, min_leaf_elems=0)
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        final8, losses8 = run_steps(step, state, batches, mesh)

        np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
        params_close(final1.params, final8.params)

    def test_wavenet_fsdp_composes_with_pipeline(self):
        """pp x fsdp: stage-stacked block params shard their leading stage
        axis over ``pipe`` AND a free dim over ``data`` (Adam moments too);
        GSPMD all-gathers the data shards at use inside the step and the
        3-step trajectory still equals single-device."""
        from blvm_tpu.parallel import PIPELINE_PP_RULES, WaveNetPipelineAdapter

        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 64
        batches = self._batches(B, T)
        loss_fn = make_loss_fn(model)

        mesh1 = make_mesh(1)
        state1 = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        final1, losses1 = run_steps(step1, state1, batches)

        mesh = make_mesh(8, pipe_axis_size=2)  # dp=4 x pipe=2
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        # like the driver: convert to the pipeline layout BEFORE TrainState.create
        # so the Adam moments mirror the stage-stacked shapes
        state0 = make_state(model, batches[0]["x"], batches[0]["x_sl"])
        state = TrainState.create(
            apply_fn=model.apply,
            params=adapter.to_pipeline(state0.params),
            tx=get_optimizer("Adam", 1e-3),
            rng=state0.rng,
        )
        state = shard_train_state_fsdp(state, mesh, tp_rules=PIPELINE_PP_RULES, min_leaf_elems=0)

        gk = state.params["res_stack"]["stages"]["block_0"]["gate_kernel_t"]
        assert gk.sharding.spec[0] == "pipe" and "data" in gk.sharding.spec
        shard = gk.addressable_shards[0].data
        assert shard.size == gk.size // 8  # 1/(pipe*data) of the bytes
        mu_gk = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
            if "mu" in _path_names(path) and _path_names(path)[-1] == "gate_kernel_t"
        ]
        assert mu_gk and all(m.sharding.spec == gk.sharding.spec for m in mu_gk)

        step = make_train_step(adapter.make_loss_fn(mesh), mesh=mesh, donate=False)
        final8, losses8 = run_steps(step, state, batches, mesh)

        np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
        from blvm_tpu.parallel import from_pipeline_params

        params_close(final1.params, jax.jit(lambda p: from_pipeline_params(p, 2))(final8.params))
