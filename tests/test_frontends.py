"""Parity tests: framework front-ends vs independent NumPy references.

Mirrors the reference's fidelity requirement (bit-level mel parity,
BASELINE.md) — tolerances are float32 round-off of a different FFT
algorithm, not approximation slack.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests import ref_dsp
from tpu_audio.ops import frontends, stft, windows


def make_audio(rng, seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1333 * t)
    sig += 0.05 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


class TestSTFT:
    def test_power_matches_fft(self, rng):
        x = make_audio(rng)
        power = np.asarray(frontends.whisper_log_mel(jnp.asarray(x)))
        assert power.shape == (len(x) // 160, 80)

    def test_stft_power_vs_numpy(self, rng):
        x = make_audio(rng, seconds=0.5)
        got = np.asarray(stft.stft_power(jnp.asarray(x), windows.hann(400), 400, 160))
        ref = np.abs(ref_dsp.stft_np(x.astype(np.float64), ref_dsp.hann_sym(400), 400, 160)) ** 2
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_istft_roundtrip(self, rng):
        x = make_audio(rng, seconds=0.3)
        win = windows.hann(400, periodic=True)
        spec = stft.stft_complex(jnp.asarray(x), win, 400, 100)
        recon = np.asarray(stft.istft(spec, win, 400, 100, length=len(x)))
        np.testing.assert_allclose(recon, x, atol=1e-4)


class TestWhisperMel:
    def test_parity(self, rng):
        x = make_audio(rng)
        got = np.asarray(frontends.whisper_log_mel(jnp.asarray(x), n_mels=80))
        ref = ref_dsp.whisper_log_mel_np(x.astype(np.float64), n_mels=80)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_128_mels_and_padding(self, rng):
        x = make_audio(rng, seconds=0.5)
        got = np.asarray(frontends.whisper_log_mel(jnp.asarray(x), n_mels=128, padding=480000 - len(x)))
        assert got.shape == (3000, 128)


class TestS3Mel:
    def test_s3_tokenizer_mel(self, rng):
        x = make_audio(rng, seconds=0.5)
        got = np.asarray(frontends.s3_log_mel(jnp.asarray(x)))
        assert got.shape[0] == 128
        # same pipeline as whisper but periodic window / 128 mels: check stats sane
        assert np.isfinite(got).all()

    def test_s3gen_parity(self, rng):
        x = make_audio(rng, seconds=0.4, sr=24000)
        got = np.asarray(frontends.s3gen_mel(jnp.asarray(x)))
        ref = ref_dsp.s3gen_mel_np(x.astype(np.float64))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=3e-4)


class TestFunASR:
    def test_mel_parity(self, rng):
        x = make_audio(rng)
        got = np.asarray(frontends.funasr_log_mel(jnp.asarray(x)))
        ref = ref_dsp.funasr_log_mel_np(x.astype(np.float64))
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_lfr(self, rng):
        feats = rng.standard_normal((101, 80)).astype(np.float32)
        got = np.asarray(frontends.apply_lfr(jnp.asarray(feats)))
        ref = ref_dsp.lfr_np(feats)
        assert got.shape == (17, 560)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_cmvn(self, rng):
        feats = jnp.asarray(rng.standard_normal((50, 560)).astype(np.float32))
        out = np.asarray(frontends.apply_cmvn(feats))
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)

    def test_full_pipeline_shape(self, rng):
        x = make_audio(rng)
        feats = np.asarray(frontends.funasr_features(jnp.asarray(x)))
        assert feats.shape[1] == 560


class TestKaldiFbank:
    def test_parity(self, rng):
        x = make_audio(rng)
        got = np.asarray(frontends.kaldi_fbank(jnp.asarray(x)))
        ref = ref_dsp.kaldi_fbank_np(x.astype(np.float64))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=3e-4)


class TestTorchParity:
    """Cross-check the Whisper mel against torch's STFT (third implementation)."""

    def test_whisper_vs_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = make_audio(rng)
        window = torch.hann_window(400, periodic=False, dtype=torch.float64)
        spec = torch.stft(torch.tensor(x, dtype=torch.float64), 400, 160,
                          window=window, center=True, pad_mode="reflect",
                          return_complex=True)
        power = (spec.abs() ** 2).numpy().T[:-1]
        mel = power @ ref_dsp.mel_fb_slaney(16000, 400, 80, fmax=8000).T
        log = np.log10(np.maximum(mel, 1e-10))
        log = np.maximum(log, log.max() - 8.0)
        ref = (log + 4.0) / 4.0
        got = np.asarray(frontends.whisper_log_mel(jnp.asarray(x), n_mels=80))
        np.testing.assert_allclose(got, ref, atol=2e-5)
