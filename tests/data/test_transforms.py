"""Tests for host-side transforms: µ-law round trip, quantize, stacking, buckets."""

import numpy as np
import pytest

from blvm_tpu.data import (
    BucketSpec,
    Compose,
    MuLawDecode,
    MuLawEncode,
    Normalize,
    Quantize,
    RandomSegment,
    StackTensor,
    bucket_length,
)
from blvm_tpu.data.transforms import LogMelSpectrogram, Scale


class TestMuLaw:
    def test_roundtrip(self):
        x = np.linspace(-1, 1, 1001, dtype=np.float32)
        enc = MuLawEncode(bits=8)
        dec = MuLawDecode(bits=8)
        np.testing.assert_allclose(dec(enc(x)), x, atol=1e-5)

    def test_range_preserved(self):
        x = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
        y = MuLawEncode(8)(x)
        np.testing.assert_allclose(y, [-1.0, 0.0, 1.0], atol=1e-6)

    def test_compression_expands_small_values(self):
        y = MuLawEncode(8)(np.array([0.01]))
        assert y[0] > 0.1  # µ-law boosts small amplitudes

    def test_matches_formula(self):
        x = np.array([0.5])
        mu = 255.0
        expected = np.log(1 + mu * 0.5) / np.log(1 + mu)
        np.testing.assert_allclose(MuLawEncode(8)(x), expected, rtol=1e-6)

    def test_jnp_matches_numpy(self):
        x = np.linspace(-1, 1, 101, dtype=np.float32)
        enc = MuLawEncode(8)
        np.testing.assert_allclose(np.asarray(enc.apply_jnp(x)), enc(x), atol=1e-6)


class TestQuantize:
    def test_range_and_dtype(self):
        q = Quantize(bits=8)
        x = np.linspace(-1, 1, 1000)
        out = q(x)
        assert out.dtype == np.int64
        assert out.min() >= 0 and out.max() <= 255

    def test_matches_torch_bucketize_semantics(self):
        # torch.bucketize(right=False): index of first boundary >= x
        q = Quantize(bits=2)  # boundaries linspace(-1, 1, 4) = [-1, -1/3, 1/3, 1]
        x = np.array([-1.0, -0.5, 0.0, 0.5, 1.0])
        out = q(x)
        np.testing.assert_array_equal(out, [0, 1, 2, 3, 3])

    def test_rescale(self):
        q = Quantize(bits=8, rescale=True)
        x = np.linspace(-1, 1, 100)
        out = q(x)
        assert out.dtype == np.float32
        assert -1.0 <= out.min() and out.max() <= 1.0


class TestStackAndSegment:
    def test_stack_shape(self):
        x = np.arange(10)
        out = StackTensor(4)(x)
        assert out.shape == (3, 4)
        np.testing.assert_array_equal(out[2], [8, 9, 0, 0])

    def test_random_segment_deterministic_with_seed(self):
        x = np.arange(100)
        t1 = RandomSegment(10, seed=1)
        t2 = RandomSegment(10, seed=1)
        np.testing.assert_array_equal(t1(x), t2(x))
        assert t1(x).shape == (10,)

    def test_random_segment_short_input_returned(self):
        x = np.arange(5)
        out = RandomSegment(10, seed=0)(x)
        np.testing.assert_array_equal(out, x)


class TestCompose:
    def test_order(self):
        c = Compose(MuLawEncode(8), Quantize(bits=8))
        out = c(np.array([0.0, 0.5]))
        assert out.dtype == np.int64


class TestLogMel:
    def test_shape_and_normalization(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=16000).astype(np.float32)
        t = LogMelSpectrogram(n_mels=40)
        out = t(x)
        assert out.shape[0] == 40
        np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-4)


class TestBuckets:
    def test_multiple(self):
        spec = BucketSpec(mode="multiple", multiple=1000)
        assert bucket_length(1, spec) == 1000
        assert bucket_length(1000, spec) == 1000
        assert bucket_length(1001, spec) == 2000

    def test_pow2(self):
        spec = BucketSpec(mode="pow2", base=128)
        assert bucket_length(100, spec) == 128
        assert bucket_length(129, spec) == 256
        assert bucket_length(1000, spec) == 1024

    def test_boundaries(self):
        spec = BucketSpec(boundaries=(100, 200, 400))
        assert bucket_length(50, spec) == 100
        assert bucket_length(250, spec) == 400
        assert bucket_length(900, spec) == 1200  # multiples of last boundary

    def test_none_identity(self):
        assert bucket_length(123, None) == 123


class TestRandomSegmentDeterminism:
    def test_pure_function_of_seed_example_epoch(self):
        from blvm_tpu.data.transforms import RandomSegment

        x = np.arange(5000, dtype=np.float32)
        t = RandomSegment(1000, seed=3)
        ctx = {"example_id": "/data/ex_7", "epoch": 2}
        a = t(x, ctx)
        b = RandomSegment(1000, seed=3)(x, ctx)  # fresh instance, same ctx
        np.testing.assert_array_equal(a, b)
        assert len(a) == 1000

        # different epoch or example -> (almost surely) different crop
        c = t(x, {"example_id": "/data/ex_7", "epoch": 3})
        d = t(x, {"example_id": "/data/ex_8", "epoch": 2})
        assert not np.array_equal(a, c) or not np.array_equal(a, d)

    def test_thread_interleaving_cannot_desync(self):
        """Two 'hosts' cropping the same examples in different orders (as
        loader threads would) must produce identical crops per example."""
        from blvm_tpu.data.transforms import RandomSegment

        xs = {f"ex{i}": np.arange(3000 + 17 * i, dtype=np.float32) for i in range(8)}
        host_a = RandomSegment(512, seed=1)
        host_b = RandomSegment(512, seed=1)
        crops_a = {k: host_a(v, {"example_id": k, "epoch": 5}) for k, v in xs.items()}
        crops_b = {k: host_b(v, {"example_id": k, "epoch": 5}) for k, v in reversed(list(xs.items()))}
        for k in xs:
            np.testing.assert_array_equal(crops_a[k], crops_b[k])

    def test_dataset_set_epoch_changes_crops(self, tmp_path):
        import csv
        import wave

        from blvm_tpu.data import AudioLoader, BaseDataset, Compose, DynamicTensorBatcher, RandomSegment

        stem = tmp_path / "a"
        data = (np.sin(np.arange(4000) / 10) * 20000).astype("<i2")
        with wave.open(str(stem) + ".wav", "wb") as f:
            f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
            f.writeframes(data.tobytes())
        src = tmp_path / "src.txt"
        with open(src, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["filename", "length.wav.samples"])
            w.writeheader(); w.writerow({"filename": str(stem), "length.wav.samples": 4000})

        ds = BaseDataset(
            source=str(src),
            modalities=[(AudioLoader("wav"), Compose(RandomSegment(1000, seed=0)), DynamicTensorBatcher())],
        )
        ds.set_epoch(1)
        (x1, _) = ds[0]
        (x1b, _) = ds[0]
        np.testing.assert_array_equal(x1, x1b)  # same epoch -> same crop
        ds.set_epoch(2)
        (x2, _) = ds[0]
        assert not np.array_equal(x1, x2)
