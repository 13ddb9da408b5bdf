"""Native C++ core vs Python reference parity."""

import numpy as np
import pytest

from tpu_audio import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestResample:
    def test_matches_numpy(self, rng):
        from tpu_audio.ops.resample import resample as np_resample

        x = rng.standard_normal(22050).astype(np.float32) * 0.3
        ref = np_resample(x, 22050, 16000)
        got = native.resample(x, 22050, 16000)
        assert abs(len(got) - len(ref)) <= 1
        n = min(len(got), len(ref))
        np.testing.assert_allclose(got[:n], ref[:n], atol=1e-5)

    def test_identity(self, rng):
        x = rng.standard_normal(100).astype(np.float32)
        np.testing.assert_array_equal(native.resample(x, 16000, 16000), x)

    def test_vs_scipy(self, rng):
        scipy_signal = pytest.importorskip("scipy.signal")
        x = rng.standard_normal(44100).astype(np.float32) * 0.3
        got = native.resample(x, 44100, 16000)
        ref = scipy_signal.resample_poly(x.astype(np.float64), 160, 441)
        n = min(len(got), len(ref))
        # different filter designs: compare in the interior, loose tolerance
        err = np.abs(got[100:n-100] - ref[100:n-100]).max()
        assert err < 0.02


class TestBPE:
    def test_matches_python_bpe(self):
        from tpu_audio.models.whisper.tokenizer import BPE

        ranks = {bytes([i]): i for i in range(256)}
        ranks[b"th"] = 256
        ranks[b"he"] = 257
        ranks[b"the"] = 258
        ranks[b" the"] = 259
        py = BPE(ranks)
        nat = native.NativeBPE(ranks)
        for piece in [b"the", b" the", b"there", b"xyz", b"t"]:
            assert nat.encode_piece(piece) == py._bpe_merge(piece), piece


class TestDTW:
    def test_matches_python(self, rng):
        from tpu_audio.models.whisper.timing import dtw as py_dtw

        x = rng.standard_normal((12, 40)).astype(np.float32)
        ti_p, tj_p = py_dtw(x.astype(np.float64))
        ti_n, tj_n = native.dtw(x)
        np.testing.assert_array_equal(ti_n, ti_p)
        np.testing.assert_array_equal(tj_n, tj_p)


class TestRingBuffer:
    def test_write_read_roundtrip(self, rng):
        rb = native.RingBuffer(1024)
        data = rng.standard_normal(600).astype(np.float32)
        assert rb.write(data) == 600
        assert rb.available == 600
        out = rb.read(600)
        np.testing.assert_array_equal(out, data)
        assert rb.available == 0

    def test_wraparound(self, rng):
        rb = native.RingBuffer(256)
        for _ in range(10):
            data = rng.standard_normal(200).astype(np.float32)
            assert rb.write(data) == 200
            np.testing.assert_array_equal(rb.read(200), data)

    def test_capacity_limit(self, rng):
        rb = native.RingBuffer(100)
        data = rng.standard_normal(150).astype(np.float32)
        assert rb.write(data) == 100
        assert rb.read(200).shape[0] == 100
