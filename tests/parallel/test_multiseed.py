"""Multi-seed training (vmap over a sharded seed axis, parallel/multiseed.py):
K seeds in one program must train exactly like K independent runs, with the
seed axis sharded over the data axis and zero cross-seed collectives."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models import LSTMAudio
from blvm_tpu.parallel import (
    make_mesh,
    make_multiseed_eval_step,
    make_multiseed_train_step,
    make_train_step,
    multiseed_train_state,
    slice_seed,
)
from blvm_tpu.training import TrainState, get_optimizer


K = 8  # one seed per device on the 8-device test mesh
B, T = 4, 64


@pytest.fixture(scope="module")
def setup():
    model = LSTMAudio(stack_size=8, hidden_size=16, num_layers=1, num_mix=3)
    tx = get_optimizer("Adam", 1e-3)
    x0 = jnp.zeros((B, T))
    x0_sl = jnp.full((B,), T, jnp.int32)

    def make_state(key):
        kp, kr = jax.random.split(key)
        variables = model.init({"params": kp, "sample": jax.random.PRNGKey(0)}, x0, x0_sl)
        return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx, rng=kr)

    def loss_fn(params, rng, batch, scalars):
        loss, mets, outputs = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng, "dropout": rng}, deterministic=False
        )
        return loss, (mets, outputs)

    rng = np.random.default_rng(0)
    batches = [
        {
            "x": jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32),
            "x_sl": jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32),
        }
        for _ in range(3)
    ]
    keys = jax.random.split(jax.random.PRNGKey(42), K)
    return model, make_state, loss_fn, batches, keys


class TestEquivalence:
    def test_matches_independent_runs(self, setup):
        """3 multiseed steps == K independent single-seed runs (same keys)."""
        model, make_state, loss_fn, batches, keys = setup

        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        ms_step = make_multiseed_train_step(loss_fn, K, mesh=mesh, donate=False)
        ms_losses = []
        for b in batches:
            stacked, mets = ms_step(stacked, b, {})
            ms_losses.append(np.asarray(mets["loss"]))

        # reference: K fully independent runs of the standard step on 1 device
        mesh1 = make_mesh(1)
        single_step = make_train_step(loss_fn, mesh=mesh1, donate=False)
        for i in range(K):
            state_i = jax.jit(make_state)(keys[i])
            for t, b in enumerate(batches):
                state_i, mets_i = single_step(state_i, b, {})
                np.testing.assert_allclose(float(mets_i["loss"]), ms_losses[t][i], rtol=1e-5, atol=1e-6)
            for a, c in zip(
                jax.tree_util.tree_leaves(state_i.params),
                jax.tree_util.tree_leaves(slice_seed(jax.device_get(stacked.params), i)),
            ):
                np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)

    def test_accum_matches_independent_accum_runs(self, setup):
        """num_seeds x accum_steps: the vmapped accumulated step must equal K
        independent single-seed accumulated runs (same microbatch split, same
        fold_in rng indices, same frames-weighted gradient merge)."""
        model, make_state, loss_fn, batches, keys = setup
        weight = lambda mb, mets: mb["x_sl"].sum()

        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        ms_step = make_multiseed_train_step(
            loss_fn, K, mesh=mesh, donate=False, accum=2, loss_weight=weight
        )
        ms_losses = []
        for b in batches:
            stacked, mets = ms_step(stacked, b, {})
            ms_losses.append(np.asarray(mets["loss"]))
        assert np.asarray(mets["log_prob"]).shape == (K, B)  # re-concatenated per-example leaves

        mesh1 = make_mesh(1)
        single_step = make_train_step(loss_fn, mesh=mesh1, donate=False, accum=2, loss_weight=weight)
        for i in range(K):
            state_i = jax.jit(make_state)(keys[i])
            for t, b in enumerate(batches):
                state_i, mets_i = single_step(state_i, b, {})
                np.testing.assert_allclose(float(mets_i["loss"]), ms_losses[t][i], rtol=1e-5, atol=1e-6)
            for a, c in zip(
                jax.tree_util.tree_leaves(state_i.params),
                jax.tree_util.tree_leaves(slice_seed(jax.device_get(stacked.params), i)),
            ):
                np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)

    def test_log_norms_per_seed(self, setup):
        """num_seeds x log_norms: (K,) norm vectors matching independent runs."""
        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        ms_step = make_multiseed_train_step(loss_fn, K, mesh=mesh, donate=False, log_norms=True)
        _, mets = ms_step(stacked, batches[0], {})
        gn = np.asarray(mets["grad_norm"])
        assert gn.shape == (K,)

        mesh1 = make_mesh(1)
        single_step = make_train_step(loss_fn, mesh=mesh1, donate=False, log_norms=True)
        for i in (0, K - 1):
            state_i = jax.jit(make_state)(keys[i])
            _, mets_i = single_step(state_i, batches[0], {})
            np.testing.assert_allclose(float(mets_i["grad_norm"]), gn[i], rtol=1e-5, atol=1e-6)

    def test_seeds_differ(self, setup):
        """Different seed keys must produce different params and losses."""
        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        ms_step = make_multiseed_train_step(loss_fn, K, mesh=mesh, donate=False)
        stacked, mets = ms_step(stacked, batches[0], {})
        losses = np.asarray(mets["loss"])
        assert len(set(np.round(losses, 10))) == K


class TestSharding:
    def test_seed_axis_sharded_no_collectives(self, setup):
        """State leaves shard their seed axis over data; the compiled step has
        no cross-seed collectives (each seed trains on its own devices)."""
        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        keys8 = jax.random.split(jax.random.PRNGKey(1), 8)
        stacked = multiseed_train_state(make_state, keys8, mesh)

        leaf = jax.tree_util.tree_leaves(stacked.params)[0]
        assert leaf.sharding.spec[0] == "data"
        # one whole seed per device: no leaf shard spans two seeds
        for shard in leaf.addressable_shards:
            assert shard.data.shape[0] == 1

        ms_step = make_multiseed_train_step(loss_fn, 8, mesh=mesh, donate=False)
        compiled = ms_step.lower(stacked, batches[0], {}).compile()
        hlo = compiled.as_text()
        for op in ("all-reduce", "all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
            assert op not in hlo, f"unexpected cross-seed collective: {op}"

    def test_indivisible_seed_count_rejected(self, setup):
        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        with pytest.raises(ValueError, match="multiple of the data axis"):
            make_multiseed_train_step(loss_fn, 3, mesh=mesh)


class TestSweepCheckpoint:
    def test_round_trip_continues_exactly(self, setup, tmp_path):
        """save_multiseed_sweep -> load_multiseed_sweep restores every seed's
        params/moments/rng/step bitwise; the next step equals the
        uninterrupted run's."""
        from blvm_tpu.parallel import load_multiseed_sweep, save_multiseed_sweep

        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        ms_step = make_multiseed_train_step(loss_fn, K, mesh=mesh, donate=False)
        for b in batches[:2]:
            stacked, _ = ms_step(stacked, b, {})
        save_multiseed_sweep(str(tmp_path), stacked, K, epoch=2, best_value=1.25)

        fresh = multiseed_train_state(make_state, keys, mesh)
        restored, meta = load_multiseed_sweep(str(tmp_path), fresh, K, mesh=mesh)
        assert meta["epoch"] == 2 and meta["best_value"] == 1.25
        for a, c in zip(
            jax.tree_util.tree_leaves(jax.device_get(stacked.params)),
            jax.tree_util.tree_leaves(jax.device_get(restored.params)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        # leading seed axis stays sharded over data
        leaf = jax.tree_util.tree_leaves(restored.params)[0]
        assert leaf.sharding.spec[0] == "data"

        s1, m1 = ms_step(stacked, batches[2], {})
        s2, m2 = ms_step(restored, batches[2], {})
        np.testing.assert_array_equal(np.asarray(m1["loss"]), np.asarray(m2["loss"]))
        np.testing.assert_array_equal(np.asarray(s1.step), np.asarray(s2.step))

    def test_num_seeds_mismatch_rejected(self, setup, tmp_path):
        from blvm_tpu.parallel import load_multiseed_sweep, save_multiseed_sweep

        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        save_multiseed_sweep(str(tmp_path), stacked, K, epoch=1)
        with pytest.raises(ValueError, match="--num_seeds"):
            load_multiseed_sweep(str(tmp_path), stacked, K // 2, mesh=mesh)


class TestEval:
    def test_eval_step_shapes(self, setup):
        model, make_state, loss_fn, batches, keys = setup
        mesh = make_mesh(8)
        stacked = multiseed_train_state(make_state, keys, mesh)
        eval_step = make_multiseed_eval_step(loss_fn, K, mesh=mesh)
        mets, outputs = eval_step(stacked.params, jax.random.PRNGKey(0), batches[0], {})
        assert np.asarray(mets["loss"]).shape == (K,)
        assert np.asarray(mets["log_prob"]).shape == (K, B)
        # per-seed eval equals the single-seed forward with the same key
        keys_k = jax.random.split(jax.random.PRNGKey(0), K)
        for i in range(K):
            loss_i, _, _ = model.apply(
                {"params": slice_seed(jax.device_get(stacked.params), i)},
                batches[0]["x"],
                batches[0]["x_sl"],
                rngs={"sample": keys_k[i], "dropout": keys_k[i]},
                deterministic=False,
            )
            np.testing.assert_allclose(float(loss_i), np.asarray(mets["loss"])[i], rtol=1e-5)
