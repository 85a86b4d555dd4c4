"""Gradient-accumulation equivalence (make_train_step(accum=...)).

The accumulated step must produce the SAME optimizer update as the monolithic
full-batch step. For every audio model the loss is total_nats / total_frames,
so the full-batch gradient is the frames-weighted mean of microbatch
gradients:

    grad(Σ_i nats_i / Σ_i w_i) = Σ_i w_i · grad(nats_i / w_i) / Σ_i w_i

WaveNet's loss path is deterministic (the sample rng only produces outputs),
so the equivalence is testable to float tolerance — this pins the weighting
math that the stochastic families (STCN, the accumulation target) share.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blvm_tpu.models import WaveNet
from blvm_tpu.parallel import make_mesh, make_train_step
from blvm_tpu.training import TrainState, get_optimizer


@pytest.fixture(scope="module")
def wavenet_setup():
    make_mesh(1)
    model = WaveNet(n_layers=2, n_stacks=2, res_channels=8, num_mix=2, num_bins=256)
    rf = model.receptive_field
    B, T = 4, rf + 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    x_sl = jnp.asarray([T, T - 7, T - 20, T - 3], jnp.int32)  # ragged
    batch = {"x": x, "x_sl": x_sl}
    variables = jax.jit(lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x, x_sl))(
        jax.random.PRNGKey(0)
    )

    def loss_fn(params, rng_key, b, scalars):
        loss, mets, _ = model.apply({"params": params}, b["x"], b["x_sl"], rngs={"sample": rng_key})
        return loss, (mets, None)

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=get_optimizer("Adam", 1e-3),
            rng=jax.random.PRNGKey(2),
        )

    return model, loss_fn, batch, fresh_state


FRAMES_WEIGHT = lambda mb, mets: mb["x_sl"].sum()


def test_accum2_update_equals_full_batch(wavenet_setup):
    model, loss_fn, batch, fresh_state = wavenet_setup
    step1 = make_train_step(loss_fn, donate=False)
    step2 = make_train_step(loss_fn, donate=False, accum=2, loss_weight=FRAMES_WEIGHT)
    s1, mets1 = step1(fresh_state(), batch, {})
    s2, mets2 = step2(fresh_state(), batch, {})
    # merged scalar loss must equal the full-batch loss
    np.testing.assert_allclose(float(mets2["loss"]), float(mets1["loss"]), rtol=1e-6)
    # per-example leaves re-concatenated to the full batch
    np.testing.assert_allclose(np.asarray(mets2["log_prob"]), np.asarray(mets1["log_prob"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mets2["x_sl"]), np.asarray(mets1["x_sl"]))
    # the optimizer update is the same update
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        s2.params,
        s1.params,
    )


def test_accum4_update_equals_full_batch(wavenet_setup):
    model, loss_fn, batch, fresh_state = wavenet_setup
    step1 = make_train_step(loss_fn, donate=False)
    step4 = make_train_step(loss_fn, donate=False, accum=4, loss_weight=FRAMES_WEIGHT)
    s1, mets1 = step1(fresh_state(), batch, {})
    s4, mets4 = step4(fresh_state(), batch, {})
    np.testing.assert_allclose(float(mets4["loss"]), float(mets1["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        s4.params,
        s1.params,
    )


def test_all_padding_microbatch_is_masked(wavenet_setup):
    """Zero-length padding rows grouped into one microbatch (the driver pads
    batches to a multiple of accum*n_devices) must not poison the update:
    their microbatch loss is 0/0 = NaN but its weight is 0."""
    model, loss_fn, batch, fresh_state = wavenet_setup
    B, T = batch["x"].shape
    padded = {
        "x": jnp.concatenate([batch["x"], jnp.zeros((2, T), jnp.float32)]),
        "x_sl": jnp.concatenate([batch["x_sl"], jnp.zeros((2,), jnp.int32)]),
    }
    step1 = make_train_step(loss_fn, donate=False)
    step3 = make_train_step(loss_fn, donate=False, accum=3, loss_weight=FRAMES_WEIGHT)
    # 6 rows / accum=3 -> microbatches of 2; the third is all padding
    s3, mets3 = step3(fresh_state(), padded, {})
    s1, mets1 = step1(fresh_state(), batch, {})
    assert np.isfinite(float(mets3["loss"]))
    np.testing.assert_allclose(float(mets3["loss"]), float(mets1["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        s3.params,
        s1.params,
    )


def test_accum_rejects_bad_config(wavenet_setup):
    model, loss_fn, batch, fresh_state = wavenet_setup
    with pytest.raises(ValueError, match="accum"):
        make_train_step(loss_fn, accum=0)
    with pytest.raises(ValueError, match="outputs"):
        make_train_step(loss_fn, accum=2, return_outputs=True)
    step3 = make_train_step(loss_fn, donate=False, accum=3)
    with pytest.raises(ValueError, match="divisible"):
        step3(fresh_state(), batch, {})  # B=4 not divisible by 3


def test_accum_unroll_bitwise_equals_scan(wavenet_setup):
    """The unrolled-accum form is the same traced math as the scan form
    (same fold_in indices, same weighted sums) — results must match to float
    tolerance (XLA may schedule/reassociate the two forms differently),
    including the stacked metric merge and the updated params."""
    model, loss_fn, batch, fresh_state = wavenet_setup
    scan = make_train_step(loss_fn, donate=False, accum=2, loss_weight=FRAMES_WEIGHT)
    unrolled = make_train_step(loss_fn, donate=False, accum=2, loss_weight=FRAMES_WEIGHT, accum_unroll=True)
    s_scan, m_scan = scan(fresh_state(), batch, {})
    s_unr, m_unr = unrolled(fresh_state(), batch, {})
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=0),
        m_unr,
        m_scan,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        s_unr.params,
        s_scan.params,
    )
