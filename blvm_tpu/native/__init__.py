"""Native (C++) host-side kernels, loaded via ctypes.

Builds ``native/audio_native.cpp`` on first use (cached shared object under
``native/``) and exposes the decode/µ-law/stacking hot paths with the GIL
released. Everything degrades gracefully to numpy when no compiler is
available — ``available()`` gates all call sites.
"""

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from blvm_tpu.settings import LOGGER

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "audio_native.cpp"
_SO = _REPO_ROOT / "native" / "libaudio_native.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        LOGGER.debug(f"native build failed: {exc}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True

    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None

    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as exc:
        LOGGER.debug(f"native load failed: {exc}")
        return None

    i16p = ctypes.POINTER(ctypes.c_int16)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    f32 = ctypes.c_float

    lib.decode_pcm16.argtypes = [i16p, i64, f32p]
    lib.mu_law_encode.argtypes = [f32p, i64, f32, f32p]
    lib.mu_law_decode.argtypes = [f32p, i64, f32, f32p]
    lib.decode_pcm16_mu_law.argtypes = [i16p, i64, f32, f32p]
    lib.stack_frames.argtypes = [f32p, i64, i64, f32p]

    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_pcm16(raw: np.ndarray) -> np.ndarray:
    """int16 array → float32 in [-1, 1)."""
    lib = _load()
    raw = np.ascontiguousarray(raw, dtype="<i2")
    out = np.empty(raw.size, dtype=np.float32)
    lib.decode_pcm16(_as_ptr(raw, ctypes.c_int16), raw.size, _as_ptr(out, ctypes.c_float))
    return out.reshape(raw.shape)


def mu_law_encode(x: np.ndarray, mu: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.size, dtype=np.float32)
    lib.mu_law_encode(_as_ptr(x, ctypes.c_float), x.size, ctypes.c_float(mu), _as_ptr(out, ctypes.c_float))
    return out.reshape(x.shape)


def mu_law_decode(y: np.ndarray, mu: float) -> np.ndarray:
    lib = _load()
    y = np.ascontiguousarray(y, dtype=np.float32)
    out = np.empty(y.size, dtype=np.float32)
    lib.mu_law_decode(_as_ptr(y, ctypes.c_float), y.size, ctypes.c_float(mu), _as_ptr(out, ctypes.c_float))
    return out.reshape(y.shape)


def decode_pcm16_mu_law(raw: np.ndarray, mu: float) -> np.ndarray:
    """Fused PCM16 decode + µ-law companding (one pass over the samples)."""
    lib = _load()
    raw = np.ascontiguousarray(raw, dtype="<i2")
    out = np.empty(raw.size, dtype=np.float32)
    lib.decode_pcm16_mu_law(
        _as_ptr(raw, ctypes.c_int16), raw.size, ctypes.c_float(mu), _as_ptr(out, ctypes.c_float)
    )
    return out.reshape(raw.shape)


def stack_frames(x: np.ndarray, stack: int) -> np.ndarray:
    """(T,) float32 → (ceil(T/stack), stack) with right zero padding."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    n_stacks = -(-x.size // stack)
    out = np.empty(n_stacks * stack, dtype=np.float32)
    lib.stack_frames(_as_ptr(x, ctypes.c_float), x.size, stack, _as_ptr(out, ctypes.c_float))
    return out.reshape(n_stacks, stack)
