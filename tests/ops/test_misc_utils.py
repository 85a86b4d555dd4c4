"""Small-surface tests: convenience modules, optimization shim, wandb gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestConvenienceModules:
    def test_permute(self):
        from blvm_tpu.modules.convenience import Permute

        x = jnp.zeros((2, 3, 4))
        out = Permute(axes=(1, 0))(x)
        assert out.shape == (2, 4, 3)

    def test_view(self):
        from blvm_tpu.modules.convenience import View

        x = jnp.arange(24).reshape(2, 3, 4)
        out = View(shape=(-1,))(x)
        assert out.shape == (2, 12)

    def test_add_constant(self):
        from blvm_tpu.modules.convenience import AddConstant

        np.testing.assert_array_equal(np.asarray(AddConstant(constant=2.0)(jnp.zeros(3))), 2.0)


class TestOptimizationShim:
    def test_constant_and_schedule(self):
        import optax

        from blvm_tpu.utils.optimization import get_learning_rate, get_learning_rates_dict

        assert get_learning_rate(3e-4) == pytest.approx(3e-4)
        sched = optax.exponential_decay(1.0, transition_steps=1, decay_rate=0.5)
        assert get_learning_rate(sched, 2) == pytest.approx(0.25)
        assert get_learning_rates_dict(3e-4) == {"learning_rate": pytest.approx(3e-4)}


class TestWandbGating:
    def test_unavailable_paths(self):
        from blvm_tpu.utils import wandb_utils

        # wandb is not installed in this image: everything degrades gracefully
        if not wandb_utils.wandb_available():
            assert wandb_utils.is_run_resumed() is False
            with pytest.raises(RuntimeError):
                wandb_utils.get_run("someid")
            assert wandb_utils.find_run_on_disk("nonexistent-run-id") is None
