"""Native C++ audio kernels: build, parity with numpy, and wiring."""

import numpy as np
import pytest

from blvm_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


class TestNativeKernels:
    def test_decode_pcm16(self):
        ints = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
        got = native.decode_pcm16(ints)
        np.testing.assert_allclose(got, ints.astype(np.float32) / 32768.0, rtol=1e-7)

    def test_mu_law_roundtrip_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, 10_000).astype(np.float32)
        mu = 2**16 - 1

        enc_native = native.mu_law_encode(x, mu)
        enc_np = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        np.testing.assert_allclose(enc_native, enc_np, atol=1e-6)

        dec = native.mu_law_decode(enc_native, mu)
        np.testing.assert_allclose(dec, x, atol=1e-4)

    def test_fused_decode_mu_law(self):
        ints = np.array([-16384, 0, 8192], dtype="<i2")
        mu = 255.0
        got = native.decode_pcm16_mu_law(ints, mu)
        x = ints.astype(np.float32) / 32768.0
        expected = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_stack_frames(self):
        x = np.arange(10, dtype=np.float32)
        got = native.stack_frames(x, 4)
        assert got.shape == (3, 4)
        np.testing.assert_array_equal(got[2], [8, 9, 0, 0])

    def test_transform_wiring(self):
        """MuLawEncode uses the native path for float32 inputs."""
        from blvm_tpu.data import MuLawDecode, MuLawEncode

        x = np.linspace(-1, 1, 999, dtype=np.float32)
        enc = MuLawEncode(bits=16)
        dec = MuLawDecode(bits=16)
        np.testing.assert_allclose(dec(enc(x)), x, atol=1e-4)
