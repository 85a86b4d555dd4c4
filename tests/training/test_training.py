"""Tests for annealers, optimizer factory, and run checkpoint/restore."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from blvm_tpu.training import CosineAnnealer, get_lr_schedule, get_optimizer, load_run, save_run


class TestCosineAnnealer:
    @pytest.mark.parametrize("anneal_steps", [1, 10, 100])
    @pytest.mark.parametrize("constant_steps", [0, 5])
    @pytest.mark.parametrize("start,end", [(0.0, 1.0), (1.0, 0.0), (2.0, 0.5)])
    def test_endpoints_and_monotonicity(self, anneal_steps, constant_steps, start, end):
        a = CosineAnnealer(anneal_steps, constant_steps, start, end)
        values = [a.step() for _ in range(anneal_steps + constant_steps + 5)]

        if constant_steps:
            assert all(v == start for v in values[:constant_steps])
        assert values[-1] == end

        ramp = values[constant_steps : constant_steps + anneal_steps + 1]
        diffs = np.diff(ramp)
        if end > start:
            assert np.all(diffs >= -1e-12)
        elif end < start:
            assert np.all(diffs <= 1e-12)

    def test_value_none_before_first_step(self):
        a = CosineAnnealer(10)
        assert a.value is None
        a.step()
        assert a.value is not None

    def test_invalid_inputs(self):
        with pytest.raises(ValueError):
            CosineAnnealer(-1)
        with pytest.raises(ValueError):
            CosineAnnealer(10, start_value=float("inf"))

    def test_state_dict_roundtrip(self):
        a = CosineAnnealer(10, start_value=0, end_value=1)
        for _ in range(4):
            a.step()
        b = CosineAnnealer(10, start_value=0, end_value=1)
        b.load_state_dict(a.state_dict())
        assert a.step() == b.step()


class TestOptimFactory:
    def test_torch_alias(self):
        tx = get_optimizer("Adam", 1e-3)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert np.all(np.isfinite(np.asarray(updates["w"])))

    def test_clipping_composes(self):
        tx = get_optimizer("SGD", 1.0, clip_grad_norm=1.0)
        params = {"w": jnp.zeros(4)}
        state = tx.init(params)
        big = {"w": jnp.full(4, 100.0)}
        updates, _ = tx.update(big, state, params)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(updates["w"])), 1.0, rtol=1e-5)

    def test_nonfinite_guard_skips(self):
        tx = get_optimizer("SGD", 1.0, skip_nonfinite_updates=True)
        params = {"w": jnp.zeros(2)}
        state = tx.init(params)
        updates, state = tx.update({"w": jnp.array([jnp.nan, 1.0])}, state, params)
        np.testing.assert_array_equal(np.asarray(updates["w"]), 0.0)  # skipped

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_optimizer("NotAnOptimizer", 1e-3)

    def test_lr_schedules(self):
        s = get_lr_schedule("ExponentialLR", 1.0, gamma=0.5, transition_steps=1)
        np.testing.assert_allclose(float(s(2)), 0.25, rtol=1e-6)
        assert get_lr_schedule(None, 3e-4) == 3e-4


class TestSaveLoadRun:
    def test_roundtrip_with_optimizer_and_annealers(self, tmp_path):
        from blvm_tpu.models import LSTMAudio

        model = LSTMAudio(stack_size=8, hidden_size=8, num_mix=2)
        x = jnp.zeros((1, 32))
        x_sl = jnp.array([32])
        variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        tx = optax.adam(1e-3)
        opt_state = tx.init(variables["params"])

        annealers = {"beta": CosineAnnealer(10)}
        annealers["beta"].step()

        class FakeTracker:
            epoch = 7

        save_run(str(tmp_path), model=model, params=variables["params"], opt_state=opt_state, annealers=annealers, tracker=FakeTracker(), step=42)

        model2, params2, opt_state2, meta = load_run(str(tmp_path), tx=tx, annealers={"beta": CosineAnnealer(10)})
        assert meta["epoch"] == 7 and meta["step"] == 42
        for a, b in zip(jax.tree_util.tree_leaves(variables["params"]), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert jax.tree_util.tree_structure(opt_state) == jax.tree_util.tree_structure(opt_state2)
