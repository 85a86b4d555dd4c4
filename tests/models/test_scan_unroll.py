"""Scan-unroll equivalence: ``unroll`` is a pure scheduling knob.

``lax.scan(..., unroll=k)`` executes the identical per-iteration math in the
identical order — it only changes how XLA schedules the loop body (measured
1.42x on the VRNN flagship step and 1.31x on SRNN on v5e; see
``scripts/perf/roofline_scan.py``). These tests pin that contract: loss and
gradients under ``unroll=8`` match ``unroll=1`` on the same parameters and
RNG streams, for every model family exposing the knob. The parameter tree is
unaffected (``unroll`` is a module field, not a parameter), so checkpoints
transfer across unroll settings — asserted via the shared-params apply.

The reference has no analog (torch loops per timestep in Python,
``blvm/models/vrnn.py:306-308``); this knob exists because the TPU scan is
per-iteration-latency bound, not FLOP bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blvm_tpu.models import CWVAEAudio, LSTMAudio, SimpleLSTMASR, SRNNAudio, VRNNAudio

UNROLL = 8


def _loss_and_grads(model, params, args, rngs):
    def loss(p):
        out = model.apply({"params": p}, *args, rngs=rngs)
        return out[0]

    l, g = jax.value_and_grad(loss)(params)
    return l, g


def _assert_tree_close(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def _check_family(make_model, args, rngs, rtol=1e-5, atol=1e-6):
    m1 = make_model(1)
    mk = make_model(UNROLL)
    variables = m1.init({**{"params": jax.random.PRNGKey(0)}, **rngs}, *args)
    params = variables["params"]
    l1, g1 = _loss_and_grads(m1, params, args, rngs)
    lk, gk = _loss_and_grads(mk, params, args, rngs)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lk), rtol=rtol, atol=atol)
    _assert_tree_close(g1, gk, rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def audio_batch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96)), jnp.float32)
    x_sl = jnp.array([96, 64], jnp.int32)
    return x, x_sl


def test_vrnn_unroll_equivalent(audio_batch):
    _check_family(
        lambda u: VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=u),
        audio_batch,
        {"sample": jax.random.PRNGKey(1)},
    )


def test_srnn_unroll_equivalent(audio_batch):
    _check_family(
        lambda u: SRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=u),
        audio_batch,
        {"sample": jax.random.PRNGKey(1)},
    )


def test_lstm_audio_unroll_equivalent(audio_batch):
    _check_family(
        lambda u: LSTMAudio(stack_size=16, hidden_size=24, num_mix=2, num_bins=256, unroll=u),
        audio_batch,
        {"sample": jax.random.PRNGKey(1)},
    )


def test_cwvae_unroll_equivalent():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128)), jnp.float32)
    x_sl = jnp.array([128, 128], jnp.int32)
    _check_family(
        lambda u: CWVAEAudio(z_size=8, h_size=16, strides=(4, 2), num_level_layers=2, stride_per_layer=2, unroll=u),
        (x, x_sl),
        {"sample": jax.random.PRNGKey(1)},
    )


def test_lstm_asr_unroll_equivalent():
    rng = np.random.default_rng(0)
    vocab = tuple(chr(97 + i) for i in range(6))
    x = jnp.asarray(rng.normal(size=(2, 20, 8)), jnp.float32)
    x_sl = jnp.array([20, 14], jnp.int32)
    y = jnp.asarray(rng.integers(1, 6, size=(2, 5)), jnp.int32)
    y_sl = jnp.array([5, 3], jnp.int32)
    _check_family(
        lambda u: SimpleLSTMASR(vocab=vocab, input_size=8, hidden_size=16, num_layers=2, bidirectional=True, unroll=u),
        (x, x_sl, y, y_sl),
        {"sample": jax.random.PRNGKey(1)},
    )


def test_generation_unroll_equivalent(audio_batch):
    """The generation rollout scans take the same knob: identical samples
    (nn.scan splits the per-step keys the same way at any unroll)."""
    x, x_sl = audio_batch
    for cls in (VRNNAudio, SRNNAudio):
        m1 = cls(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=1)
        mk = cls(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=UNROLL)
        variables = m1.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)
        out1 = m1.apply(variables, n_samples=2, max_timesteps=9, rngs={"sample": jax.random.PRNGKey(3)}, method=cls.generate)
        outk = mk.apply(variables, n_samples=2, max_timesteps=9, rngs={"sample": jax.random.PRNGKey(3)}, method=cls.generate)
        np.testing.assert_allclose(np.asarray(out1[0][0]), np.asarray(outk[0][0]), rtol=1e-5, atol=1e-6)


def test_unroll_composes_with_data_parallel(audio_batch):
    """GSPMD x nn.scan unroll: gradients of the unrolled scan on an 8-device
    mesh match single-device gradients (the batch axis of the scan carry is
    sharded; unrolling must not disturb the inserted collectives)."""
    from blvm_tpu.parallel import make_mesh, shard_batch

    x, x_sl = audio_batch
    x = jnp.tile(x, (4, 1))  # B=8 so the mesh's data axis divides the batch
    x_sl = jnp.tile(x_sl, 4)
    model = VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=UNROLL)
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)

    def loss(p, batch):
        l, _, _ = model.apply(p, batch["x"], batch["x_sl"], rngs={"sample": jax.random.PRNGKey(2)})
        return l

    grad_fn = jax.jit(jax.grad(loss))
    make_mesh(1)
    g1 = grad_fn(variables, {"x": x, "x_sl": x_sl})
    mesh = make_mesh(8)
    g8 = grad_fn(variables, shard_batch({"x": x, "x_sl": x_sl}, mesh))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_unroll_not_in_param_tree(audio_batch):
    """Checkpoints transfer: unroll never appears in the parameter structure."""
    x, x_sl = audio_batch
    m1 = VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=1)
    m8 = VRNNAudio(likelihood="DMoL", input_size=16, hidden_size=24, latent_size=8, unroll=UNROLL)
    p1 = m1.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)["params"]
    p8 = m8.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, x_sl)["params"]
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p8)
    _assert_tree_close(p1, p8, rtol=0, atol=0)
