"""Composable per-example host-side transforms (numpy).

Rebuild of reference ``blvm/data/transforms.py``. These run on the host in the
data pipeline (before device_put); device-side jittable equivalents of the
numeric ones (µ-law, normalize) live in the same classes via ``apply_jnp`` so
models/experiments can also fuse them into compiled code.

Fixed vs reference: ``Quantize(rescale=True)`` referenced an undefined ``Scale``
class (``transforms.py:253``) — implemented properly here.
"""

import math
from typing import Callable, List, Optional, Union

import numpy as np


class Transform:
    def __call__(self, x, ctx: Optional[dict] = None):
        """``ctx`` (optional) carries example identity for transforms that
        need deterministic per-example randomness: the dataset passes
        ``{"example_id": ..., "epoch": ...}`` (see ``BaseDataset.set_epoch``).
        Stateless transforms ignore it."""
        return self.forward(x)

    def forward(self, x):
        raise NotImplementedError()

    def __repr__(self):
        name = self.__class__.__name__
        attrs = vars(self)
        var_str = ", ".join(f"{k}={v}" for k, v in attrs.items() if not k.startswith("_"))
        return f"{name}({var_str})"


class Compose(Transform):
    def __init__(self, *transforms):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, x, ctx: Optional[dict] = None):
        for transform in self.transforms:
            x = transform(x, ctx) if isinstance(transform, Transform) else transform(x)
        return x

    def forward(self, x):
        return self(x)

    def __repr__(self):
        parts = [str(t) for t in self.transforms]
        if len(", ".join(parts)) < 110:
            return f"{self.__class__.__name__}({', '.join(parts)})"
        return self.__class__.__name__ + "(\n    " + ",\n    ".join(parts) + "\n)"


class TextCleaner(Transform):
    def __init__(self, *cleaner_fcns: Callable):
        self.cleaner_fcns = cleaner_fcns

    def forward(self, x: str):
        for fcn in self.cleaner_fcns:
            x = fcn(x)
        return x


class EncodeInteger(Transform):
    def __init__(self, tokenizer, token_map):
        self.tokenizer = tokenizer
        self.token_map = token_map

    def forward(self, x: str):
        return self.token_map.encode(self.tokenizer(x))


class DecodeInteger(Transform):
    def __init__(self, join_token, token_map):
        self.join_token = join_token
        self.token_map = token_map

    def forward(self, x):
        return self.join_token.join(self.token_map.decode(x))


class StackTensor(Transform):
    def __init__(self, n_frames: int, axis: int = -1):
        """Frame-stack along ``axis`` with a new trailing stack dim (host-side
        numpy twin of ``blvm_tpu.ops.stack_tensor`` — keeps data off-device)."""
        self.n_frames = n_frames
        self.axis = axis

    def forward(self, x):
        x = np.asarray(x)
        axis = self.axis if self.axis >= 0 else x.ndim + self.axis
        padding = (-x.shape[axis]) % self.n_frames
        if padding:
            pad_width = [(0, 0)] * x.ndim
            pad_width[axis] = (0, padding)
            x = np.pad(x, pad_width)
        split_shape = list(x.shape)
        split_shape[axis : axis + 1] = [x.shape[axis] // self.n_frames, self.n_frames]
        x = x.reshape(split_shape)
        return np.moveaxis(x, axis + 1, -1)


class RandomSegment(Transform):
    def __init__(self, length: int, seed: Optional[int] = None):
        """Randomly crop a segment of ``length`` from an example of shape (T, *).

        Unlike the reference (global torch RNG, ``transforms.py:101-110``) the
        crop is a PURE FUNCTION of (seed, example_id, epoch) when the caller
        supplies a ``ctx`` (the dataset does): deterministic regardless of
        loader-thread interleaving or host count — every multi-host process
        computes the same crop for the same example, so loader workers cannot
        desync the hosts' batch shapes (round-3 verdict item 3). Fresh crops
        each epoch come from folding the dataset's ``set_epoch`` counter into
        the hash. Direct calls without ``ctx`` fall back to a sequential RNG.
        """
        self.length = length
        self.seed = 0 if seed is None else int(seed)
        self._rng = np.random.default_rng(seed)

    def __call__(self, x, ctx: Optional[dict] = None):
        high = max(x.shape[0] - self.length, 1)
        if ctx and ctx.get("example_id") is not None:
            import hashlib

            key = f"{self.seed}|{ctx.get('epoch', 0)}|{ctx['example_id']}".encode()
            digest = hashlib.blake2b(key, digest_size=8).digest()
            start_idx = int(int.from_bytes(digest, "little") % high)
        else:
            start_idx = int(self._rng.integers(0, high))
        return x[start_idx : start_idx + self.length]

    def forward(self, x):
        return self(x)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, f_min: float = 0.0, f_max: Optional[float] = None):
    """HTK-style triangular mel filterbank, (n_mels, n_fft // 2 + 1)."""
    f_max = f_max or sample_rate / 2.0
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), dtype=np.float32)
    for m in range(1, n_mels + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        for k in range(left, center):
            if center > left:
                fb[m - 1, k] = (k - left) / (center - left)
        for k in range(center, right):
            if right > center:
                fb[m - 1, k] = (right - k) / (right - center)
    return fb


class LogMelSpectrogram(Transform):
    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 400,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        n_mels: int = 80,
        normalize_frq_bins: bool = True,
    ) -> None:
        """Log-mel spectrogram with per-frequency-bin normalization
        (reference ``transforms.py:113-166``), computed with numpy STFT.

        Input waveform (T,) → output (n_mels, frames).
        """
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.n_mels = n_mels
        self.normalize_frq_bins = normalize_frq_bins
        self._window = np.hanning(self.win_length + 1)[:-1].astype(np.float32)
        self._fb = mel_filterbank(sample_rate, n_fft, n_mels)

    def forward(self, waveform):
        x = np.asarray(waveform, dtype=np.float32).reshape(-1)
        # center-pad like torchaudio's default
        pad = self.n_fft // 2
        x = np.pad(x, (pad, pad), mode="reflect")
        n_frames = 1 + (len(x) - self.n_fft) // self.hop_length
        idx = np.arange(self.n_fft)[None, :] + self.hop_length * np.arange(n_frames)[:, None]
        frames = x[idx]
        if self.win_length < self.n_fft:
            lpad = (self.n_fft - self.win_length) // 2
            window = np.pad(self._window, (lpad, self.n_fft - self.win_length - lpad))
        else:
            window = self._window
        spec = np.abs(np.fft.rfft(frames * window, n=self.n_fft, axis=-1)) ** 2  # power
        mel = spec @ self._fb.T  # (frames, n_mels)
        logmel = 10.0 * np.log10(np.clip(mel, 1e-10, None)).T  # (n_mels, frames)

        if self.normalize_frq_bins:
            logmel = logmel - logmel.mean(axis=-1, keepdims=True)
            logmel = logmel / (logmel.std(axis=-1, keepdims=True) + 1e-10)
        return logmel.astype(np.float32)


class Normalize(Transform):
    def __init__(self, mean=None, std=None, axis: int = -1):
        self.mean = mean
        self.std = std
        self.axis = axis

    def forward(self, x):
        mean = x.mean(self.axis) if self.mean is None else self.mean
        std = x.std(self.axis) if self.std is None else self.std
        return (x - mean) / std


class Denormalize(Transform):
    def __init__(self, mean=None, std=None):
        self.mean = mean
        self.std = std

    def forward(self, x):
        return x * self.std + self.mean


class MuLawEncode(Transform):
    def __init__(self, bits: int = 8):
        """Continuous µ-law companding of PCM in [-1, 1]:
        ``sign(x) log(1 + µ|x|) / log(1 + µ)`` (reference ``transforms.py:192-201``)."""
        self.bits = bits
        self.mu = 2**bits - 1
        self._divisor = math.log(self.mu + 1)

    def forward(self, x):
        x = np.asarray(x)
        from blvm_tpu import native

        if native.available() and x.dtype == np.float32:
            return native.mu_law_encode(x, float(self.mu))
        return np.sign(x) * np.log1p(self.mu * np.abs(x)) / self._divisor

    def apply_jnp(self, x):
        import jax.numpy as jnp

        return jnp.sign(x) * jnp.log1p(self.mu * jnp.abs(x)) / self._divisor


class MuLawDecode(Transform):
    def __init__(self, bits: int = 8):
        self.bits = bits
        self.mu = 2**bits - 1
        self._divisor = math.log(self.mu + 1)

    def forward(self, x):
        x = np.asarray(x)
        from blvm_tpu import native

        if native.available() and x.dtype == np.float32:
            return native.mu_law_decode(x, float(self.mu))
        return np.sign(x) * (np.exp(np.abs(x) * self._divisor) - 1.0) / self.mu

    def apply_jnp(self, x):
        import jax.numpy as jnp

        return jnp.sign(x) * (jnp.exp(jnp.abs(x) * self._divisor) - 1.0) / self.mu


class Scale(Transform):
    def __init__(self, low: float, high: float, min_val: float, max_val: float):
        """Affine rescale from [min_val, max_val] to [low, high]."""
        self.low = low
        self.high = high
        self.min_val = min_val
        self.max_val = max_val

    def forward(self, x):
        x = (np.asarray(x, dtype=np.float32) - self.min_val) / (self.max_val - self.min_val)
        return x * (self.high - self.low) + self.low


class Quantize(Transform):
    def __init__(
        self,
        low: float = -1.0,
        high: float = 1.0,
        bits: Optional[int] = 8,
        bins: Optional[int] = None,
        force_out_int64: bool = True,
        rescale: bool = False,
    ):
        """Quantize values in [low, high] to integer bin indices in [0, 2**bits - 1].

        Bucketization matches ``torch.bucketize(right=False)`` over boundaries
        ``linspace(-1, 1, bins)``: index = number of boundaries strictly below x
        ... i.e. first boundary >= x (reference ``transforms.py:216-260``).
        With ``rescale=True`` output is mapped back to floats in [low, high]
        (reference's broken ``Scale`` path, implemented here).
        """
        assert (bits is None) != (bins is None), "Must set one and only one of `bits` and `bins`"
        self.low = low
        self.high = high
        self.bits = bins // 8 if bits is None else bits
        self.bins = 2**bits if bins is None else bins
        self.boundaries = np.linspace(-1.0, 1.0, self.bins)
        self.out_dtype = np.int64 if force_out_int64 or self.bits > 32 else np.int32
        self.rescale = Scale(low=low, high=high, min_val=0, max_val=self.bins - 1) if rescale else None

    def forward(self, x):
        # side='left' matches torch.bucketize(right=False): count of boundaries b with b < x
        x_quantized = np.searchsorted(self.boundaries, np.asarray(x), side="left").astype(self.out_dtype)
        if self.rescale is not None:
            x_quantized = self.rescale(x_quantized)
        return x_quantized
