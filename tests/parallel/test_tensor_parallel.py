"""Tensor parallelism: partition-rule resolution and numerical equivalence of
a dp×tp-sharded WaveNet train step vs single-device execution (GSPMD inserts
the collectives; the math must not change)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from blvm_tpu.models import WaveNet
from blvm_tpu.parallel import (
    WAVENET_TP_RULES,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
    tree_shardings,
)
from blvm_tpu.training import TrainState, get_optimizer


def make_state(model, x, x_sl):
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x, x_sl)
    )(jax.random.PRNGKey(0))
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


class TestPartitionRules:
    def test_wavenet_rules_resolve(self):
        mesh = make_mesh(8, model_axis_size=2)
        model = WaveNet(n_layers=2, n_stacks=1, res_channels=16, num_mix=2)
        x = jnp.zeros((2, 64))
        params = jax.eval_shape(
            lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x, jnp.full((2,), 64)),
            jax.random.PRNGKey(0),
        )["params"]
        shardings = tree_shardings(params, mesh, WAVENET_TP_RULES)
        blk = shardings["res_stack"]["Conv1dResidualGLU_0"]
        assert blk["gate_kernel_t"].spec == P(None, None, "model")
        assert blk["gate_kernel_s"].spec == P(None, None, "model")
        assert blk["gate_bias_t"].spec == P("model")
        assert blk["gate_bias_s"].spec == P("model")
        assert blk["rs_kernel"].spec == P(None, "model", None)
        assert blk["rs_bias"].spec == P()  # replicated
        assert shardings["causal"]["Conv1d_0"]["kernel"].spec == P()

    def test_indivisible_dim_falls_back_to_replicated(self):
        mesh = make_mesh(8, model_axis_size=2)
        # res_channels=15 -> gate out 30 not divisible by 2 after... 30 % 2 == 0,
        # so use a leaf directly: a (3,) bias cannot shard over model=2
        tree = {"gate_bias_t": jnp.zeros((3,))}
        shardings = tree_shardings(tree, mesh, WAVENET_TP_RULES)
        assert shardings["gate_bias_t"].spec == P()

    def test_mesh_validation(self):
        with pytest.raises(ValueError):
            make_mesh(6, model_axis_size=4)


class TestTPTrainStepEquivalence:
    def test_dp_tp_step_matches_single_device(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 128
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        loss_fn = make_loss_fn(model)

        # single device
        mesh1 = make_mesh(1)
        state1 = make_state(model, x, x_sl)
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        new1, mets1 = step1(state1, {"x": x, "x_sl": x_sl}, {})

        # 4-way data x 2-way tensor parallel
        mesh = make_mesh(8, model_axis_size=2)
        state = make_state(model, x, x_sl)
        state = shard_train_state(state, mesh, WAVENET_TP_RULES)
        # parameters actually landed sharded over the model axis
        gk = state.params["res_stack"]["Conv1dResidualGLU_0"]["gate_kernel_t"]
        assert gk.sharding.spec == P(None, None, "model")
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        new8, mets8 = step(state, shard_batch({"x": x, "x_sl": x_sl}, mesh), {})

        np.testing.assert_allclose(float(mets1["loss"]), float(mets8["loss"]), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(new1.params), jax.tree_util.tree_leaves(new8.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_stcn_dp_tp_step_matches_single_device(self):
        """STCN's dilated stacks reuse Conv1dResidualGLU, so the same rules
        shard them; the dp x tp step must match single-device numerically."""
        from blvm_tpu.models import STCN
        from blvm_tpu.parallel import STCN_TP_RULES

        model = STCN(n_layers=2, latent_size=(8, 4), res_channels=16)

        def loss_fn(params, rng, batch, scalars):
            loss, mets, _ = model.apply(
                {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng}
            )
            return loss, (mets, None)

        B, T = 8, 64
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (B, T)), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)

        mesh1 = make_mesh(1)
        state1 = make_state(model, x, x_sl)
        step1 = make_train_step(loss_fn, mesh=mesh1, donate=False)
        new1, mets1 = step1(state1, {"x": x, "x_sl": x_sl}, {})

        mesh = make_mesh(8, model_axis_size=2)
        state = shard_train_state(make_state(model, x, x_sl), mesh, STCN_TP_RULES)
        gk = state.params["res_stack"]["Conv1dResidualGLU_0"]["gate_kernel_t"]
        assert gk.sharding.spec == P(None, None, "model")
        step = make_train_step(loss_fn, mesh=mesh, donate=False)
        new8, mets8 = step(state, shard_batch({"x": x, "x_sl": x_sl}, mesh), {})

        np.testing.assert_allclose(float(mets1["loss"]), float(mets8["loss"]), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(new1.params), jax.tree_util.tree_leaves(new8.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_optimizer_moments_sharded(self):
        """Adam mu/nu inherit the parameter shardings (ZeRO-style TP memory)."""
        model = WaveNet(n_layers=2, n_stacks=1, res_channels=16, num_mix=2)
        B, T = 4, 64
        x = jnp.zeros((B, T), jnp.float32)
        x_sl = jnp.full((B,), T, jnp.int32)
        mesh = make_mesh(8, model_axis_size=2)
        state = shard_train_state(make_state(model, x, x_sl), mesh, WAVENET_TP_RULES)
        import jax.tree_util as jtu

        mus = [
            leaf
            for path, leaf in jtu.tree_leaves_with_path(state.opt_state)
            if "mu" in jtu.keystr(path) and "gate_kernel_t" in jtu.keystr(path)
        ]
        assert mus, "no Adam mu leaf found for gate_kernel_t"
        assert all(m.sharding.spec == P(None, None, "model") for m in mus)
