"""Import the reference torch implementation from /root/reference for parity
tests, stubbing its unavailable soft dependencies.

The reference's model math needs only torch; its package imports pull in
display/IO extras (torchinfo, blessed, torchaudio, wandb, ...) that are not in
this image and play no role in a forward pass. Each stub below is the minimal
attribute surface the reference's import-time code touches.

Also provides the torch→flax weight-transplant helpers shared by the per-model
parity tests (tensor layout conventions: torch Linear keeps (out, in), flax
Dense keeps (in, out); torch Conv1d keeps (out, in, k), our Conv1d keeps
(k, in, out); torch LSTM/GRU keep (4H|3H, in), our scan cells keep (in, 4H|3H)
— gate orders are identical by design, blvm_tpu/modules/recurrent.py:13-14).
"""

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


_loaded = False


def load_reference():
    """Return the reference ``blvm`` package (imported once, stubs in place).

    Raises ImportError if /root/reference is unavailable so tests can skip.
    """
    global _loaded
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "blvm")):
        raise ImportError("reference checkout not present")
    if not _loaded:
        os.environ.setdefault("BLVM_DATA_ROOT_DIRECTORY", "/tmp/blvm_ref_data")
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)

        class _TensorType:
            def __class_getitem__(cls, item):
                return object

        class _Terminal:
            def __getattr__(self, name):
                return lambda s="": s

        _stub("torchinfo", summary=lambda *a, **k: None)
        _stub("editdistance", eval=lambda a, b: 0)
        _stub("wandb")
        torchaudio = _stub("torchaudio", load=None, info=None)
        torchaudio.transforms = _stub(
            "torchaudio.transforms",
            MelSpectrogram=object,
            MuLawEncoding=object,
            MuLawDecoding=object,
            Resample=object,
        )
        torchaudio.functional = _stub("torchaudio.functional")
        _stub("soundfile")
        _stub("librosa")
        _stub("torchtyping", TensorType=_TensorType, patch_typeguard=lambda *a, **k: None)
        _stub("blessed", Terminal=_Terminal)
        _loaded = True

    import blvm  # noqa: F401

    return sys.modules["blvm"]


# ---------------------------------------------------------------------------
# torch state_dict -> flax params transplant helpers
# ---------------------------------------------------------------------------


def t2n(tensor):
    return np.asarray(tensor.detach().cpu().numpy())


def linear_params(sd, prefix):
    """torch nn.Linear -> our Dense: kernel is the transposed weight."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def mlp_params(sd, prefix, torch_indices=(0, 2, 4)):
    """torch nn.Sequential(Linear, ReLU, ...) -> our MLP {Dense_i}."""
    return {
        f"Dense_{i}": linear_params(sd, f"{prefix}.{torch_index}")
        for i, torch_index in enumerate(torch_indices)
    }


def lstm_params(sd, prefix, num_layers=1):
    """torch nn.LSTM -> our scan LSTM (same i,f,g,o gate order)."""
    params = {}
    for layer in range(num_layers):
        params[f"w_ih_{layer}"] = t2n(sd[f"{prefix}.weight_ih_l{layer}"]).T
        params[f"w_hh_{layer}"] = t2n(sd[f"{prefix}.weight_hh_l{layer}"]).T
        params[f"b_ih_{layer}"] = t2n(sd[f"{prefix}.bias_ih_l{layer}"])
        params[f"b_hh_{layer}"] = t2n(sd[f"{prefix}.bias_hh_l{layer}"])
    return params


def gru_cell_params(sd, prefix):
    """torch nn.GRUCell -> our GRUCell (same r,z,n gate order)."""
    return {
        "w_ih": t2n(sd[f"{prefix}.weight_ih"]).T,
        "w_hh": t2n(sd[f"{prefix}.weight_hh"]).T,
        "b_ih": t2n(sd[f"{prefix}.bias_ih"]),
        "b_hh": t2n(sd[f"{prefix}.bias_hh"]),
    }


def gru_params(sd, prefix):
    """torch nn.GRU (single layer) -> our GRU."""
    return {
        "w_ih": t2n(sd[f"{prefix}.weight_ih_l0"]).T,
        "w_hh": t2n(sd[f"{prefix}.weight_hh_l0"]).T,
        "b_ih": t2n(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh": t2n(sd[f"{prefix}.bias_hh_l0"]),
    }


def conv1d_params(sd, prefix):
    """torch nn.Conv1d (out, in, k) -> our Conv1d kernel (k, in, out)."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def residual_glu_params(sd, prefix):
    """Reference Conv1dResidualGLU -> our block.

    The reference's fused gate conv stacks [tanh half | sigmoid half] on the
    output channels (GatedTanhUnit chunks in that order); our block stores the
    two branches as separate column-parallel params (see
    blvm_tpu/models/wavenet/modules.py:Conv1dResidualGLU).
    """
    gate = conv1d_params(sd, f"{prefix}.conv")
    rs = conv1d_params(sd, f"{prefix}.conv1x1rs")
    half = gate["kernel"].shape[-1] // 2
    return {
        "gate_kernel_t": gate["kernel"][..., :half],
        "gate_kernel_s": gate["kernel"][..., half:],
        "gate_bias_t": gate["bias"][:half],
        "gate_bias_s": gate["bias"][half:],
        "rs_kernel": rs["kernel"],
        "rs_bias": rs["bias"],
    }
