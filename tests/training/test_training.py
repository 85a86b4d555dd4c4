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
        from blvm_tpu.training.optim import EpochSchedule

        s = get_lr_schedule("ExponentialLR", 1.0, gamma=0.5)
        assert isinstance(s, EpochSchedule)
        # lr during epoch 3 has seen two per-epoch step() calls (torch cadence)
        np.testing.assert_allclose(s.lr_at_epoch(3), 0.25, rtol=1e-6)
        assert get_lr_schedule(None, 3e-4) == 3e-4
        # optax names stay per-optimizer-step schedules
        opt_s = get_lr_schedule("cosine_decay_schedule", 1.0, decay_steps=10)
        assert callable(opt_s) and not isinstance(opt_s, EpochSchedule)

    @pytest.mark.parametrize(
        "name,kwargs",
        [
            ("MultiStepLR", dict(milestones=[2, 5, 9], gamma=0.1)),
            ("ExponentialLR", dict(gamma=0.9)),
            ("StepLR", dict(step_size=3, gamma=0.5)),
            ("CosineAnnealingLR", dict(T_max=10)),
            ("MultiplicativeLR", dict(lr_lambda=0.95)),
        ],
    )
    def test_torch_schedule_oracle(self, name, kwargs):
        """Epoch-denominated schedules match torch's lr_scheduler per epoch:
        the reference calls ``lr_scheduler.step()`` once per epoch
        (``experiment_lstm_audio.py:258``), so the lr used during epoch k is
        torch's lr after k-1 step() calls."""
        torch = pytest.importorskip("torch")

        lr0 = 3e-4
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr0)
        tkw = dict(kwargs)
        if name == "MultiplicativeLR":
            factor = tkw.pop("lr_lambda")
            tkw["lr_lambda"] = lambda e: factor
        sched = getattr(torch.optim.lr_scheduler, name)(opt, **tkw)

        ours = get_lr_schedule(name, lr0, **kwargs)
        for epoch in range(1, 13):
            torch_lr = opt.param_groups[0]["lr"]
            np.testing.assert_allclose(
                ours.lr_at_epoch(epoch), torch_lr, rtol=1e-12, err_msg=f"{name} epoch {epoch}"
            )
            sched.step()

    def test_injected_epoch_lr_changes_updates(self):
        """inject_hyperparams + set_injected_learning_rate actually moves the
        lr seen by a jitted update, without changing the opt_state treedef."""
        from blvm_tpu.training.optim import set_injected_learning_rate

        tx = optax.inject_hyperparams(
            lambda learning_rate: get_optimizer("SGD", learning_rate, clip_grad_value=10.0)
        )(learning_rate=1.0)
        params = {"w": jnp.ones(3)}
        opt_state = tx.init(params)

        @jax.jit
        def upd(opt_state, grads):
            updates, new_state = tx.update(grads, opt_state, params)
            return updates, new_state

        grads = {"w": jnp.ones(3)}
        u1, opt_state = upd(opt_state, grads)
        np.testing.assert_allclose(np.asarray(u1["w"]), -1.0)

        new_state = set_injected_learning_rate(opt_state, 0.25)
        assert jax.tree_util.tree_structure(new_state) == jax.tree_util.tree_structure(opt_state)
        u2, _ = upd(new_state, grads)
        np.testing.assert_allclose(np.asarray(u2["w"]), -0.25)


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
