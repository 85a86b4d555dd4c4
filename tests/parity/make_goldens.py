"""Freeze reference-model forward results as golden regression fixtures.

Runs the torch reference from /root/reference once per model family (weights
transplanted exactly as in the live parity tests), and writes
``tests/parity/goldens/<family>.npz`` holding the transplanted flax params,
the input batch, and the reference's loss/ELBO/log-prob/KL. The companion
``test_goldens.py`` then replays these WITHOUT torch or the reference checkout
— so bit-parity regressions are caught even in environments where the
reference is unavailable, and the frozen numbers survive reference edits.

Usage: python tests/parity/make_goldens.py   (from the repo root)
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

GOLDEN_DIR = Path(__file__).with_name("goldens")


class _Setter:
    """Minimal monkeypatch stand-in for the build_pair(monkeypatch=...) tests."""

    def setattr(self, obj, name, value):
        setattr(obj, name, value)


def flatten_params(params, prefix=""):
    flat = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(flatten_params(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def make_batch(seed, lengths, T=None):
    B = len(lengths)
    T = T or max(lengths)
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    for i, sl in enumerate(lengths):
        x[i, sl:] = 0.0
    return x, np.asarray(lengths, np.int32)


def run_reference(ref_model, x, x_sl, **call_kwargs):
    import torch

    with torch.no_grad():
        loss, _, out = ref_model(torch.from_numpy(x), torch.from_numpy(x_sl.astype(np.int64)), **call_kwargs)
    golden = {"loss": float(loss)}
    for name, attr in [("elbo", "elbo"), ("log_prob", "log_prob"), ("log_prob", "ll"), ("kl", "kl"), ("kl", "kld")]:
        value = getattr(out, attr, None)
        if value is not None and name not in golden:
            golden[name] = value.numpy()
    if hasattr(out, "klds"):
        golden["klds"] = np.stack([k.numpy() for k in out.klds])
    return golden


def save(family, model_cls, kwargs, params, x, x_sl, call_kwargs, golden, patch_modules):
    GOLDEN_DIR.mkdir(exist_ok=True)
    arrays = {f"p|{k}": v for k, v in flatten_params(params).items()}
    arrays["x"] = x
    arrays["x_sl"] = x_sl
    for k, v in golden.items():
        arrays[f"g|{k}"] = np.asarray(v)
    meta = dict(family=family, model_class=model_cls, kwargs=kwargs,
                call_kwargs=call_kwargs, patch_modules=patch_modules)
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(GOLDEN_DIR / f"{family}.npz", **arrays)
    print(f"{family}: loss={golden['loss']:.6f} -> goldens/{family}.npz")


def main():
    from tests.parity import test_parity_cwvae, test_parity_lstm, test_parity_srnn
    from tests.parity import test_parity_stcn, test_parity_vrnn, test_parity_wavenet

    mp = _Setter()

    # LSTM
    ref_model, _, params = test_parity_lstm.build_pair()
    x, x_sl = make_batch(42, (256, 192, 100))
    golden = run_reference(ref_model, x, x_sl)
    save("lstm", "LSTMAudio",
         dict(stack_size=8, hidden_size=16, num_layers=2, num_mix=3, num_bins=256),
         params, x, x_sl, {}, golden, [])

    # WaveNet
    ref_model, model, params = test_parity_wavenet.build_pair()
    rf = model.receptive_field
    x, x_sl = make_batch(3, (rf + 40, rf + 17))
    golden = run_reference(ref_model, x, x_sl, pad_receptive_field=True)
    save("wavenet", "WaveNet",
         dict(n_layers=3, n_stacks=2, res_channels=8, num_mix=3, num_bins=256),
         params, x, x_sl, dict(pad_receptive_field=True), golden, [])

    # VRNN (mean-rsample patch)
    ref_model, _, params = test_parity_vrnn.build_pair(mp, "DMoL")
    x, x_sl = make_batch(11, (64, 43))
    golden = run_reference(ref_model, x, x_sl, beta=0.7, free_nats=2.0)
    save("vrnn", "VRNNAudio",
         dict(likelihood="DMoL", input_size=8, hidden_size=16, latent_size=4),
         params, x, x_sl, dict(beta=0.7, free_nats=2.0), golden, ["blvm_tpu.models.vrnn"])

    # SRNN
    ref_model, _, params = test_parity_srnn.build_pair(mp, "DMoL", smoothing=True)
    x, x_sl = make_batch(23, (64, 43))
    golden = run_reference(ref_model, x, x_sl, beta=0.8, free_nats=1.0)
    save("srnn", "SRNNAudio",
         dict(likelihood="DMoL", input_size=8, hidden_size=16, latent_size=4, smoothing=True),
         params, x, x_sl, dict(beta=0.8, free_nats=1.0), golden, ["blvm_tpu.models.srnn"])

    # STCN
    ref_model, _, params = test_parity_stcn.build_pair(mp, "DMoL", top_down=True)
    x, x_sl = make_batch(31, (64, 43))
    golden = run_reference(ref_model, x, x_sl, beta=0.9, free_nats=0.5)
    save("stcn", "STCN",
         dict(likelihood="DMoL", n_layers=test_parity_stcn.N_LAYERS,
              latent_size=list(test_parity_stcn.LATENTS), res_channels=test_parity_stcn.RES, top_down=True),
         params, x, x_sl, dict(beta=0.9, free_nats=0.5), golden, ["blvm_tpu.models.stcn.stcn"])

    # CWVAE
    ref_model, _, params = test_parity_cwvae.build_pair(mp)
    x, x_sl = make_batch(7, (64, 41))
    golden = run_reference(ref_model, x, x_sl, beta=0.7, free_nats=2.0)
    kw = dict(test_parity_cwvae.KW)
    save("cwvae", "CWVAEAudio", kw, params, x, x_sl, dict(beta=0.7, free_nats=2.0),
         golden, ["blvm_tpu.modules.rssm"])


if __name__ == "__main__":
    main()
