"""Tests for bench.py's scan-chain timing mode and the raw (jit=False) step.

The scan chain embeds N train steps in one jitted ``lax.scan`` so a single
dispatch covers all the work (NOTES.md round-3: fast steps are otherwise
dispatch-latency-bound on the relay). These tests pin the property that makes
the measurement honest: the scan-chain body is the SAME update as the jitted
per-step path — identical loss trajectory and identical final parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from blvm_tpu.parallel import make_mesh, make_train_step
from blvm_tpu.training import TrainState, get_optimizer


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, x_sl):
        h = nn.Dense(8)(x)
        loss = (h**2).mean()
        return loss, {"loss": loss}, None


@pytest.fixture()
def tiny_setup():
    make_mesh(1)
    model = _Tiny()
    batches = [
        {"x": jnp.full((4, 16), 0.5 + 0.1 * i, jnp.float32), "x_sl": jnp.full((4,), 16, jnp.int32)}
        for i in range(3)
    ]
    v = jax.jit(lambda k: model.init({"params": k}, batches[0]["x"], batches[0]["x_sl"]))(jax.random.PRNGKey(0))
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], tx=get_optimizer("Adam", 1e-2), rng=jax.random.PRNGKey(1)
    )

    def loss_fn(params, rng, batch, scalars):
        loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"])
        return loss, (mets, None)

    return state, loss_fn, batches


def _run_per_step(loss_fn, state, batches, n):
    step = make_train_step(loss_fn, donate=False)
    losses = []
    for i in range(n):
        state, mets = step(state, batches[i % len(batches)], {})
        losses.append(float(mets["loss"]))
    return state, losses


def _run_scan_chain(loss_fn, state, batches, n):
    raw_step = make_train_step(loss_fn, jit=False)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[batches[i % len(batches)] for i in range(n)])

    @jax.jit
    def chain(state, stacked):
        def body(s, b):
            s2, mets = raw_step(s, b, {})
            return s2, mets["loss"]

        return jax.lax.scan(body, state, stacked)

    state, losses = chain(state, stacked)
    return state, [float(l) for l in np.asarray(losses)]


def test_scan_chain_matches_per_step_trajectory(tiny_setup):
    state, loss_fn, batches = tiny_setup
    n = 7
    s_ref, losses_ref = _run_per_step(loss_fn, state, batches, n)
    s_scan, losses_scan = _run_scan_chain(loss_fn, state, batches, n)
    np.testing.assert_allclose(losses_scan, losses_ref, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        s_scan.params,
        s_ref.params,
    )
    assert int(s_scan.step) == int(s_ref.step) == n


def test_raw_step_is_unjitted_passthrough(tiny_setup):
    state, loss_fn, batches = tiny_setup
    raw = make_train_step(loss_fn, jit=False)
    jitted = make_train_step(loss_fn, donate=False)
    s_raw, mets_raw = raw(state, batches[0], {})
    s_jit, mets_jit = jitted(state, batches[0], {})
    np.testing.assert_allclose(float(mets_raw["loss"]), float(mets_jit["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        s_raw.params,
        s_jit.params,
    )


def test_scan_chain_time_helper_runs():
    """bench.scan_chain_time returns sane (state, per_step, losses)."""
    import bench

    make_mesh(1)
    model = _Tiny()
    batches = [
        {"x": jnp.full((2, 8), 1.0, jnp.float32), "x_sl": jnp.full((2,), 8, jnp.int32)} for _ in range(2)
    ]
    v = jax.jit(lambda k: model.init({"params": k}, batches[0]["x"], batches[0]["x_sl"]))(jax.random.PRNGKey(0))
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], tx=get_optimizer("Adam", 1e-2), rng=jax.random.PRNGKey(1)
    )

    def loss_fn(params, rng, batch, scalars):
        loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"])
        return loss, (mets, None)

    state2, per_step, l0, l1 = bench.scan_chain_time(loss_fn, state, batches, 5)
    assert per_step > 0
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0  # optimizing a convex quadratic: loss must fall
    assert int(state2.step) == 10  # warm chain + timed chain


def test_bench_family_eval_runs():
    """bench.bench_family_eval produces a sane JSON record from a builder."""
    import bench

    make_mesh(1)

    def tiny_builder(bf16):
        model = _Tiny()
        batches = [
            {"x": jnp.full((2, 8), float(i + 1), jnp.float32), "x_sl": jnp.full((2,), 8, jnp.int32)}
            for i in range(2)
        ]

        def loss_fn(params, rng, batch, scalars):
            loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"])
            return loss, (mets, None)

        return model, loss_fn, batches, 2 * 8, "f32"

    rec = bench.bench_family_eval("tiny", tiny_builder, bf16=False, steps_a=3, steps_b=6)
    assert rec["metric"] == "tiny_eval_throughput_waveform_samples_per_sec"
    assert rec["value"] > 0 and rec["ms_per_step"] > 0
    assert np.isfinite(rec["loss_first"]) and np.isfinite(rec["loss_last"])
    assert rec["timing_mode"] == "scan_chain"


def test_wavenet_analytic_flops_stacking():
    """The stacking-aware FLOP count must reduce to the s=1 formula and scale
    the conv-stack work by 1/s while keeping the per-waveform-frame DMoL dense.
    """
    import bench

    saved = bench.WN_B, bench.WN_T, bench.WN_S
    try:
        bench.WN_B, bench.WN_T, bench.WN_S = 8, 16000, 1
        fwd1, train1 = bench.wavenet_analytic_flops()
        assert train1 == 3 * fwd1
        # s=1 closed form (the pre-grid formula)
        res, mix = bench.WN_RES, bench.WN_MIX
        blocks = bench.WN_LAYERS * bench.WN_STACKS * (2 * 2 * res * 2 * res + 2 * res * 2 * res)
        expected = 8 * 16000 * (blocks + 4 * res + 2 * res * res + 2 * res * 3 * mix)
        assert fwd1 == expected

        # s=64: conv-stack terms drop by 64x, DMoL dense unchanged per frame
        bench.WN_S = 64
        fwd64, _ = bench.wavenet_analytic_flops()
        lik = 8 * 16000 * 2 * res * 3 * mix
        conv1, conv64 = fwd1 - lik, fwd64 - lik
        # head widens to res*s and causal reads s channels, so conv64 is a bit
        # more than conv1/64 x (blocks share), but far below the s=1 cost
        assert conv64 < conv1
        per_frame_s = (blocks + 2 * 2 * 64 * res + 2 * res * res * 64)
        assert conv64 == (8 * 16000 // 64) * per_frame_s
    finally:
        bench.WN_B, bench.WN_T, bench.WN_S = saved
