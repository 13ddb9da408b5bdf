"""Parity vs golden fixtures captured from the ACTUAL MLX Swift reference.

BASELINE.md: "bit-level mel + waveform parity vs MLX Swift reference
outputs". The torch-parity suite (tests/torch_ref/) is independent evidence
but a third implementation; these tests compare against .npy arrays dumped
by the reference's own Swift code via tools/dump_reference_fixtures.swift
(capture recipe in tests/golden_mlx/README.md — requires a Mac, so this
environment ships the harness without the fixtures and skips).

Tolerance policy:
  - inputs: BIT-identical (the LCG is exact integer math in both languages)
  - mel filterbanks: ≤1e-6 (pure closed-form float math)
  - log-mel spectrograms: ≤2e-4 in normalized log-mel units (limited by
    MLX-Metal rfft vs XLA-CPU DFT-matmul float32 accumulation order)
  - HiFT waveform with the reference's own NSF source injected: the decode
    path is deterministic; fp16-weight noise bounds it at cosine ≥0.999

Reference provenance per fixture: tools/dump_reference_fixtures.swift.
"""

import os
from pathlib import Path

import numpy as np
import pytest

FIXDIR = Path(__file__).parent / "golden_mlx"
WEIGHTS = os.environ.get("TPU_AUDIO_WEIGHTS", "")


def _fix(name: str) -> np.ndarray:
    p = FIXDIR / name
    if not p.exists():
        pytest.skip(f"fixture {name} not captured yet "
                    "(see tests/golden_mlx/README.md)")
    return np.load(p)


def lcg_audio(n: int, seed: int) -> np.ndarray:
    """Bit-identical reimplementation of the Swift dump tool's generator."""
    state = seed & 0xFFFFFFFF
    out = np.empty(n, np.float32)
    for i in range(n):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        # (state >> 8) has 24 bits → exact in float32; /2^24 and -0.5 exact
        out[i] = np.float32(state >> 8) / np.float32(1 << 24) - np.float32(0.5)
    return out


# ----------------------------------------------------------- deterministic DSP

def test_input_16k_bit_identical():
    ref = _fix("input_16k.npy")
    ours = lcg_audio(32000, 1234)
    assert ref.shape == ours.shape
    assert np.array_equal(ref, ours), "LCG input drifted — nothing else is comparable"


def test_input_24k_bit_identical():
    ref = _fix("input_24k.npy")
    assert np.array_equal(ref, lcg_audio(48000, 5678))


def test_mel_filters_whisper_128():
    ref = _fix("mel_filters_whisper_128.npy")
    from tpu_audio.ops import mel_filters

    ours = mel_filters.slaney(16000, 400, 128, 0.0, 8000.0).astype(np.float32)
    assert ref.shape == ours.shape
    assert np.max(np.abs(ref - ours)) <= 1e-6


@pytest.mark.parametrize("n_mels", [80, 128])
def test_whisper_log_mel(n_mels):
    ref = _fix(f"whisper_mel_{n_mels}.npy")
    from tpu_audio.ops import frontends

    ours = np.asarray(frontends.whisper_log_mel(lcg_audio(32000, 1234),
                                                n_mels=n_mels))
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    err = np.max(np.abs(ref - ours))
    assert err <= 2e-4, f"whisper mel {n_mels}: max err {err:.2e}"


def test_s3tokenizer_log_mel():
    # logMelSpectrogramChatterbox (S3TokenizerUtils.swift:160-208): periodic
    # hann 400/160, drop last frame, Slaney 128, log10 max−8, (x+4)/4, (M,T)
    ref = _fix("s3tok_mel_128.npy")
    from tpu_audio.ops import frontends

    ours = np.asarray(frontends.s3_log_mel(lcg_audio(32000, 1234)))
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    err = np.max(np.abs(ref - ours))
    assert err <= 2e-4, f"s3tok mel: max err {err:.2e}"


def test_s3gen_mel():
    # s3genMelSpectrogram (S3GenMel.swift:43-102): 1920/480 magnitude mel,
    # natural log, (M, T')
    ref = _fix("s3gen_mel_80.npy")
    from tpu_audio.ops import frontends

    ours = np.asarray(frontends.s3gen_mel(lcg_audio(48000, 5678)))
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    err = np.max(np.abs(ref - ours))
    assert err <= 2e-4, f"s3gen mel: max err {err:.2e}"


def test_harness_self_consistency(tmp_path, monkeypatch):
    """Prove the comparison plumbing runs end-to-end: write fixtures from
    our own implementation and check every deterministic test passes
    against them. (Catches shape/transpose drift in the harness itself
    before anyone burns a Mac session capturing real fixtures.)"""
    from tpu_audio.ops import frontends, mel_filters

    a16, a24 = lcg_audio(32000, 1234), lcg_audio(48000, 5678)
    np.save(tmp_path / "input_16k.npy", a16)
    np.save(tmp_path / "input_24k.npy", a24)
    np.save(tmp_path / "mel_filters_whisper_128.npy",
            mel_filters.slaney(16000, 400, 128, 0.0, 8000.0).astype(np.float32))
    for m in (80, 128):
        np.save(tmp_path / f"whisper_mel_{m}.npy",
                np.asarray(frontends.whisper_log_mel(a16, n_mels=m)))
    np.save(tmp_path / "s3tok_mel_128.npy",
            np.asarray(frontends.s3_log_mel(a16)))
    np.save(tmp_path / "s3gen_mel_80.npy", np.asarray(frontends.s3gen_mel(a24)))
    import sys

    monkeypatch.setattr(sys.modules[__name__], "FIXDIR", tmp_path)
    test_input_16k_bit_identical()
    test_input_24k_bit_identical()
    test_mel_filters_whisper_128()
    test_whisper_log_mel(80)
    test_whisper_log_mel(128)
    test_s3tokenizer_log_mel()
    test_s3gen_mel()


# -------------------------------------------------------- weight-gated parity

needs_weights = pytest.mark.skipif(
    not (WEIGHTS and Path(WEIGHTS).is_dir()),
    reason="real weights unavailable; set TPU_AUDIO_WEIGHTS")


@needs_weights
def test_hift_waveform_parity():
    """HiFT vocoder decode (HiFiGAN.swift:595-619) on the reference's own
    mel AND its own captured NSF source — removes both RNG paths, leaving
    only the deterministic conv/iSTFT stack to compare."""
    mel = _fix("hift_mel.npy")          # (1, 80, T)
    source = _fix("hift_source.npy")    # (1, 1, T*480)
    ref_wav = _fix("hift_waveform.npy")  # (1, T*480)
    os.environ.setdefault("HF_HUB_CACHE", WEIGHTS)
    from tpu_audio.codecs.s3gen import hift
    from tpu_audio.models.chatterbox import load as cbload

    try:
        loaded = cbload.load("fp16")
    except Exception as e:  # snapshot absent from the local cache
        pytest.skip(f"chatterbox fp16 weights not in {WEIGHTS}: {e}")
    s3_params, s3_cfg = loaded[2], loaded[3]
    ours = np.asarray(hift.decode(s3_params["mel2wav"], s3_cfg.hift,
                                  np.transpose(mel, (0, 2, 1)),
                                  source[:, 0, :]))
    n = min(ours.shape[-1], ref_wav.shape[-1])
    a, b = ours[0, :n].astype(np.float64), ref_wav[0, :n].astype(np.float64)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos >= 0.999, f"HiFT waveform cosine {cos:.5f}"
    assert np.max(np.abs(a - b)) <= 2e-2


@needs_weights
def test_whisper_tiny_encoder_parity():
    """Encoder features + first decoder-step logits vs the Swift model
    (WhisperModel.swift:59-95) on the identical mel window."""
    ref_feat = _fix("whisper_tiny_features.npy")   # (1, 1500, 384)
    ref_logits = _fix("whisper_tiny_logits.npy")   # (1, 1, vocab)
    os.environ.setdefault("HF_HUB_CACHE", WEIGHTS)
    from tpu_audio.models.whisper import load as wload
    from tpu_audio.models.whisper import model as wmodel
    from tpu_audio.ops import frontends

    try:
        params, cfg, tok = wload.load("tiny", "fp16")
    except Exception as e:
        pytest.skip(f"whisper tiny weights not in {WEIGHTS}: {e}")
    mel = frontends.whisper_log_mel(lcg_audio(32000, 1234), n_mels=80,
                                    padding=480000 - 32000)[:3000]
    feat = np.asarray(wmodel.encode(params, cfg, mel[None]))
    # fp16 reference vs f32 here: feature-level tolerance, logits argmax exact
    cos = float(np.sum(feat * ref_feat)
                / (np.linalg.norm(feat) * np.linalg.norm(ref_feat) + 1e-12))
    assert cos >= 0.999, f"encoder features cosine {cos:.5f}"
    logits = np.asarray(wmodel.forward_cross_qk(
        params, cfg, np.array([[50258]]), feat)[0])[:, -1]
    assert int(np.argmax(logits)) == int(np.argmax(ref_logits[0, -1]))
