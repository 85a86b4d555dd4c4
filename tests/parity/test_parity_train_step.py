"""Training-dynamics parity: full torch optimizer steps vs the optax chain.

Forward parity (the per-family ``test_parity_*`` modules) cannot catch
divergence in training dynamics — stop-gradient placement, clip semantics and
ordering, Adam eps convention. This module closes that gap: for each of the
six model families it transplants the torch reference's weights, then runs
N full reference-driver training steps (``loss.backward()`` →
``clip_grad_value_`` → ``clip_grad_norm_`` → ``Adam.step()``, the chain at
``/root/reference/experiments/experiment_vrnn_audio.py:223-231``; the
LSTM/WaveNet drivers use the same chain without clipping,
``experiment_lstm_audio.py:183-189``) against the jitted optax train step, in
float64 on CPU, on identical per-step batches. Asserts:

  * per-step loss trajectories equal (rtol 1e-6 — f64 leaves no hiding room),
  * final parameters equal after N updates (rtol 1e-5),
  * for the clipped families, that both clips actually BIND (clip thresholds
    are derived from the measured step-1 gradients, so the value-clip and the
    global-norm-clip paths are genuinely exercised, not vacuously equal).

Stochasticity is removed identically on both sides by the same
mean-posterior-sample patch the forward parity tests use.

The f64 jax loss trajectories are frozen as goldens
(``goldens/train_step_<family>.npz`` — initial params, batches, trajectory)
and replayed WITHOUT torch by ``test_train_step_golden``; regenerate with
``python -m tests.parity.test_parity_train_step`` from the repo root.
"""

import importlib
import json
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests.parity import reference_loader as ref  # noqa: E402

try:
    ref.load_reference()
    HAVE_REFERENCE = True
except ImportError:
    HAVE_REFERENCE = False

GOLDEN_DIR = Path(__file__).with_name("goldens")
N_STEPS = 4
LR = 3e-4  # every reference driver's Adam default


# ---------------------------------------------------------------------------
# family registry (builders live in the sibling forward-parity modules)
# ---------------------------------------------------------------------------


def _families():
    import tests.parity.test_parity_cwvae as m_cwvae
    import tests.parity.test_parity_lstm as m_lstm
    import tests.parity.test_parity_srnn as m_srnn
    import tests.parity.test_parity_stcn as m_stcn
    import tests.parity.test_parity_vrnn as m_vrnn
    import tests.parity.test_parity_wavenet as m_wavenet

    return {
        "lstm": dict(
            build=lambda mp: m_lstm.build_pair(),
            retransplant=m_lstm.transplant,
            model_cls="LSTMAudio",
            model_kwargs=dict(stack_size=8, hidden_size=16, num_layers=2, num_mix=3, num_bins=256),
            fwd_kwargs={},
            lengths=lambda model: (256, 192, 100),
            clipped=False,
            patch_modules=[],
        ),
        "wavenet": dict(
            build=lambda mp: m_wavenet.build_pair(),
            retransplant=m_wavenet.transplant,
            model_cls="WaveNet",
            model_kwargs=dict(n_layers=3, n_stacks=2, res_channels=8, num_mix=3, num_bins=256),
            fwd_kwargs={},
            lengths=lambda model: (model.receptive_field + 40, model.receptive_field + 17),
            clipped=False,
            patch_modules=[],
        ),
        "vrnn": dict(
            build=lambda mp: m_vrnn.build_pair(mp, "DMoL"),
            retransplant=m_vrnn.transplant,
            model_cls="VRNNAudio",
            model_kwargs=dict(likelihood="DMoL", input_size=8, hidden_size=16, latent_size=4),
            fwd_kwargs=dict(beta=0.8, free_nats=1.0),
            lengths=lambda model: (64, 43),
            clipped=True,
            patch_modules=["blvm_tpu.models.vrnn"],
        ),
        "srnn": dict(
            build=lambda mp: m_srnn.build_pair(mp, "DMoL", True),
            retransplant=lambda sd: m_srnn.transplant(sd, smoothing=True),
            model_cls="SRNNAudio",
            model_kwargs=dict(likelihood="DMoL", input_size=8, hidden_size=16, latent_size=4, smoothing=True),
            fwd_kwargs=dict(beta=0.8, free_nats=1.0),
            lengths=lambda model: (64, 43),
            clipped=True,
            patch_modules=["blvm_tpu.models.srnn"],
        ),
        "stcn": dict(
            build=lambda mp: m_stcn.build_pair(mp, "DMoL", True),
            retransplant=m_stcn.transplant,
            model_cls="STCN",
            model_kwargs=dict(likelihood="DMoL", n_layers=2, latent_size=(8, 4), res_channels=16, top_down=True),
            fwd_kwargs=dict(beta=0.9, free_nats=0.5),
            lengths=lambda model: (64, 43),
            clipped=True,
            patch_modules=["blvm_tpu.models.stcn.stcn"],
        ),
        "cwvae": dict(
            build=lambda mp: m_cwvae.build_pair(mp),
            retransplant=m_cwvae.transplant,
            model_cls="CWVAEAudio",
            model_kwargs={**m_cwvae.KW, "strides": tuple(m_cwvae.KW["strides"])},
            fwd_kwargs=dict(beta=0.7, free_nats=2.0),
            lengths=lambda model: (64, 41),
            clipped=True,
            patch_modules=["blvm_tpu.modules.rssm"],
        ),
    }


FAMILY_NAMES = ["lstm", "wavenet", "vrnn", "srnn", "stcn", "cwvae"]


import contextlib


@contextlib.contextmanager
def _torch_f64():
    """Default-f64 torch: the reference hardcodes default-dtype ``torch.zeros``
    for initial recurrent states (e.g. ``blvm/models/lstm.py:83-84``), so
    ``.double()`` alone leaves f32 islands that crash f64 forward passes."""
    import torch

    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(old)


def make_batches(lengths, n_steps, seed=5):
    """n_steps distinct f64 batches with the same (static) shape."""
    B, T = len(lengths), max(lengths)
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        x = rng.uniform(-1, 1, (B, T)).astype(np.float64)
        for i, sl in enumerate(lengths):
            x[i, sl:] = 0.0
        batches.append((x, np.asarray(lengths, np.int64)))
    return batches


# ---------------------------------------------------------------------------
# the two training loops under comparison
# ---------------------------------------------------------------------------


def run_torch_steps(ref_model, batches, fwd_kwargs, clip_value=None, clip_norm=None):
    """The reference driver chain: backward → value clip → norm clip → Adam."""
    import torch

    opt = torch.optim.Adam(ref_model.parameters(), lr=LR)
    losses = []
    for x, x_sl in batches:
        loss, _, _ = ref_model(torch.from_numpy(x), torch.from_numpy(x_sl), **fwd_kwargs)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        if clip_value is not None:
            torch.nn.utils.clip_grad_value_(ref_model.parameters(), clip_value)
        if clip_norm is not None:
            torch.nn.utils.clip_grad_norm_(ref_model.parameters(), clip_norm)
        opt.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def probe_torch_grads(ref_model, batch, fwd_kwargs):
    """(max |g|, global ‖g‖) of the step-1 gradient — used to derive clip
    thresholds that provably bind."""
    import torch

    x, x_sl = batch
    loss, _, _ = ref_model(torch.from_numpy(x), torch.from_numpy(x_sl), **fwd_kwargs)
    ref_model.zero_grad(set_to_none=True)
    loss.backward()
    grads = [p.grad for p in ref_model.parameters() if p.grad is not None]
    max_abs = max(float(g.abs().max()) for g in grads)
    global_norm = float(torch.sqrt(sum((g ** 2).sum() for g in grads)))
    ref_model.zero_grad(set_to_none=True)
    return max_abs, global_norm


def run_jax_steps(model, params, batches, fwd_kwargs, clip_value=None, clip_norm=None):
    """The production optax chain (training/optim.py: value clip → global-norm
    clip → Adam), jitted once, on the same batches."""
    from blvm_tpu.training.optim import get_optimizer

    tx = get_optimizer("Adam", LR, clip_grad_norm=clip_norm, clip_grad_value=clip_value)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, x_sl):
        def loss_of(p):
            loss, _, _ = model.apply(
                {"params": p}, x, x_sl, **fwd_kwargs, rngs={"sample": jax.random.PRNGKey(0)}
            )
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state_new = tx.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)
        return params_new, opt_state_new, loss

    losses = []
    for x, x_sl in batches:
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(x_sl.astype(np.int32)))
        losses.append(float(loss))
    return np.asarray(losses), params


def _setup_family(cfg, monkeypatch):
    """Build the pair, cast both sides to f64, return (ref_model, model,
    params64, batches, clip_value, clip_norm)."""
    ref_model, model, _ = cfg["build"](monkeypatch)
    ref_model = ref_model.double().train()
    # copy=True: the transplant helpers' .numpy() views SHARE memory with the
    # torch parameters, and torch's in-place Adam updates would otherwise
    # silently rewrite the "initial" jax params during run_torch_steps
    params = jax.tree_util.tree_map(
        lambda a: np.array(a, np.float64, copy=True), cfg["retransplant"](ref_model.state_dict())
    )
    batches = make_batches(cfg["lengths"](model), N_STEPS)

    clip_value = clip_norm = None
    if cfg["clipped"]:
        max_abs, global_norm = probe_torch_grads(ref_model, batches[0], cfg["fwd_kwargs"])
        # thresholds strictly below the measured step-1 gradient stats: both
        # the elementwise value clip and the global-norm clip must bind
        clip_value, clip_norm = 0.5 * max_abs, 0.7 * global_norm
    return ref_model, model, params, batches, clip_value, clip_norm


# ---------------------------------------------------------------------------
# live torch-vs-optax comparison
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout unavailable")
@pytest.mark.parametrize("family", FAMILY_NAMES)
def test_train_step_parity(family, monkeypatch):
    cfg = _families()[family]
    with jax.enable_x64(True), _torch_f64():
        ref_model, model, params, batches, clip_value, clip_norm = _setup_family(cfg, monkeypatch)

        torch_losses = run_torch_steps(
            ref_model, batches, cfg["fwd_kwargs"], clip_value=clip_value, clip_norm=clip_norm
        )
        jax_losses, jax_params = run_jax_steps(
            model, params, batches, cfg["fwd_kwargs"], clip_value=clip_value, clip_norm=clip_norm
        )

        # per-step loss trajectory: step k's loss sees k-1 optimizer updates
        np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-6, atol=1e-9)
        # the trajectory must actually evolve (otherwise the comparison is vacuous)
        assert np.abs(np.diff(torch_losses)).max() > 0

        # final parameters after N full update steps
        final_ref = cfg["retransplant"]({k: v for k, v in ref_model.state_dict().items()})
        flat_ref = dict(_flatten(final_ref))
        flat_jax = dict(_flatten(jax.tree_util.tree_map(np.asarray, jax_params)))
        assert flat_ref.keys() == flat_jax.keys()
        # atol floor: equivalent-but-differently-associated float ops (e.g.
        # torch's sqrt(v)/sqrt(bc2) vs optax's sqrt(v/bc2), per-tensor-then-
        # global norms) wiggle near-zero elements by ~1e-9/step; 3e-8 over
        # N_STEPS is <0.01% of a single lr=3e-4 Adam update
        for path in flat_ref:
            np.testing.assert_allclose(
                flat_jax[path], flat_ref[path], rtol=1e-5, atol=3e-8, err_msg=f"{family}: {path}"
            )


def _flatten(tree, prefix=""):
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            yield from _flatten(value, path)
        else:
            yield path, np.asarray(value)


# ---------------------------------------------------------------------------
# frozen-golden replay (no torch / reference checkout needed)
# ---------------------------------------------------------------------------


def _golden_files():
    return sorted(GOLDEN_DIR.glob("train_step_*.npz")) if GOLDEN_DIR.is_dir() else []


@pytest.mark.skipif(not _golden_files(), reason="no train-step goldens generated")
@pytest.mark.parametrize("path", _golden_files(), ids=lambda p: p.stem)
def test_train_step_golden(path, monkeypatch):
    from tests.parity.test_goldens import unflatten

    import blvm_tpu.models

    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    for module_name in meta["patch_modules"]:
        module = importlib.import_module(module_name)
        monkeypatch.setattr(module, "rsample_gaussian", lambda key, mu, sd: mu)

    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in meta["model_kwargs"].items()}
    model = getattr(blvm_tpu.models, meta["model_cls"])(**kwargs)
    params = unflatten({k[2:]: data[k] for k in data.files if k.startswith("p|")})
    batches = [(data["x"][i], data["x_sl"]) for i in range(data["x"].shape[0])]

    with jax.enable_x64(True):
        losses, _ = run_jax_steps(
            model, params, batches, meta["fwd_kwargs"],
            clip_value=meta["clip_value"], clip_norm=meta["clip_norm"],
        )
    np.testing.assert_allclose(losses, data["losses"], rtol=1e-6, atol=1e-9)


def make_goldens():
    """Freeze the (torch-verified) f64 jax trajectories as replay fixtures."""
    from tests.parity.make_goldens import _Setter, flatten_params

    GOLDEN_DIR.mkdir(exist_ok=True)
    with jax.enable_x64(True), _torch_f64():
        for family, cfg in _families().items():
            ref_model, model, params, batches, clip_value, clip_norm = _setup_family(cfg, _Setter())
            losses, _ = run_jax_steps(
                model, params, batches, cfg["fwd_kwargs"], clip_value=clip_value, clip_norm=clip_norm
            )
            arrays = {f"p|{k}": v for k, v in flatten_params(params).items()}
            arrays["x"] = np.stack([x for x, _ in batches])
            arrays["x_sl"] = batches[0][1]
            arrays["losses"] = losses
            meta = dict(
                family=family,
                model_cls=cfg["model_cls"],
                model_kwargs=cfg["model_kwargs"],
                fwd_kwargs=cfg["fwd_kwargs"],
                patch_modules=cfg["patch_modules"],
                clip_value=clip_value,
                clip_norm=clip_norm,
            )
            arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
            np.savez_compressed(GOLDEN_DIR / f"train_step_{family}.npz", **arrays)
            print(f"train_step_{family}: losses {losses}")


if __name__ == "__main__":
    make_goldens()
