"""Model-specific audio feature front-ends.

Each function is a pure jnp function of a fixed-length waveform; shapes are
static so the whole front-end compiles into a couple of MXU GEMMs (see
ops/stft.py). Conventions are replicated bit-for-bit from the reference:

  - whisper_log_mel:      package/STT/Whisper/WhisperAudio.swift:78-137
  - s3_log_mel (S3Tokenizer/Chatterbox): package/Codec/S3Tokenizer/
    S3TokenizerUtils.swift:102-200 (periodic Hann, 128 mels, drop last frame)
  - s3gen_mel:            package/Codec/S3Gen/Mel/S3GenMel.swift:44-120
    (1920/480, natural log, magnitude not power, center=False w/ manual pad)
  - funasr_features:      package/STT/FunASR/FunASRAudio.swift:49-235
    (Hamming, HTK mel over n_fft/2 bins, natural log, LFR 7/6, CMVN)
  - kaldi_fbank:          package/Codec/S3Gen/CAMPPlus.swift:31-105
    (snip-edges framing, DC removal, preemphasis 0.97, Povey window,
     zero-pad to 512, HTK integer-bin mels, natural log)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.ops import mel_filters, windows
from tpu_audio.ops.stft import dft_basis, frame, stft_power

_HIGHEST = jax.lax.Precision.HIGHEST

# Whisper audio constants (package/STT/Whisper/WhisperAudio.swift:15-26)
WHISPER_SAMPLE_RATE = 16000
WHISPER_N_FFT = 400
WHISPER_HOP = 160
WHISPER_CHUNK_SECONDS = 30
WHISPER_N_SAMPLES = WHISPER_CHUNK_SECONDS * WHISPER_SAMPLE_RATE
WHISPER_N_FRAMES = WHISPER_N_SAMPLES // WHISPER_HOP


def _log10_norm(mel: jax.Array) -> jax.Array:
    """Whisper-style log compression: log10, clip to max-8, (x+4)/4."""
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0


def whisper_log_mel(audio: jax.Array, n_mels: int = 80, padding: int = 0) -> jax.Array:
    """(T,) 16 kHz waveform → (frames, n_mels) normalized log-mel."""
    if padding > 0:
        audio = jnp.pad(audio, (0, padding))
    power = stft_power(audio, windows.hann(WHISPER_N_FFT), WHISPER_N_FFT, WHISPER_HOP)
    power = power[:-1]  # python whisper drops the final time frame
    fb = jnp.asarray(mel_filters.slaney(WHISPER_SAMPLE_RATE, WHISPER_N_FFT, n_mels,
                                        fmax=8000.0))
    mel = jnp.matmul(power, fb.T, precision=_HIGHEST)
    return _log10_norm(mel)


def s3_log_mel(audio: jax.Array, n_mels: int = 128, padding: int = 0) -> jax.Array:
    """S3Tokenizer front-end: (T,) 16 kHz → (n_mels, frames)."""
    if padding > 0:
        audio = jnp.pad(audio, (0, padding))
    win = windows.hann(400, periodic=True)
    power = stft_power(audio, win, 400, 160)
    power = power[:-1]
    fb = jnp.asarray(mel_filters.slaney(16000, 400, n_mels))
    mel = jnp.matmul(power, fb.T, precision=_HIGHEST)
    return _log10_norm(mel).T


def s3gen_mel(audio: jax.Array, n_fft: int = 1920, n_mels: int = 80,
              sample_rate: int = 24000, hop: int = 480,
              fmin: float = 0.0, fmax: float = 8000.0) -> jax.Array:
    """S3Gen/HiFT mel: (..., T) 24 kHz → (..., n_mels, frames), natural log of
    **magnitude** (not power)."""
    pad = (n_fft - hop) // 2
    padding = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
    audio = jnp.pad(audio, padding, mode="reflect")
    win = windows.hann(n_fft, periodic=True)
    mag = stft_power(audio, win, n_fft, hop, center=False, magnitude=True)
    fb = jnp.asarray(mel_filters.slaney(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(mag, fb.T, precision=_HIGHEST)
    mel = jnp.log(jnp.maximum(mel, 1e-5))
    return jnp.swapaxes(mel, -1, -2)


def funasr_log_mel(audio: jax.Array, n_mels: int = 80,
                   n_fft: int = 400, hop: int = 160) -> jax.Array:
    """FunASR mel: Hamming window, HTK triangles over the first n_fft/2 bins,
    natural log. (T,) → (frames, n_mels)."""
    power = stft_power(audio, windows.hamming(n_fft), n_fft, hop)
    power = power[..., : n_fft // 2]
    fb = jnp.asarray(mel_filters.torchaudio_htk(16000, n_fft, n_mels))
    mel = jnp.matmul(power, fb.T, precision=_HIGHEST)
    return jnp.log(jnp.maximum(mel, 1e-10))


def apply_lfr(features: jax.Array, lfr_m: int = 7, lfr_n: int = 6) -> jax.Array:
    """Low-frame-rate stacking: (T, D) → (ceil(T/n), m*D).

    Left-pads (m-1)//2 copies of the first frame, right-pads with the last
    frame, then gathers m consecutive frames every n.
    """
    t, d = features.shape
    t_lfr = -(-t // lfr_n)
    left = (lfr_m - 1) // 2
    total_needed = (t_lfr - 1) * lfr_n + lfr_m
    right = max(0, total_needed - (t + left))
    padded = jnp.concatenate(
        [jnp.broadcast_to(features[0], (left, d)), features]
        + ([jnp.broadcast_to(features[-1], (right, d))] if right else []),
        axis=0,
    )
    idx = np.arange(t_lfr)[:, None] * lfr_n + np.arange(lfr_m)[None, :]
    return padded[idx].reshape(t_lfr, lfr_m * d)


def apply_cmvn(features: jax.Array, mean: jax.Array | None = None,
               istd: jax.Array | None = None) -> jax.Array:
    """Cepstral mean/variance normalization. With precomputed stats the
    convention is (x + mean) * istd (mean stored as negative shift); without,
    per-utterance standardization."""
    if mean is not None and istd is not None:
        return (features + mean) * istd
    mu = jnp.mean(features, axis=0, keepdims=True)
    std = jnp.sqrt(jnp.var(features, axis=0, keepdims=True)) + 1e-6
    return (features - mu) / std


def funasr_features(audio: jax.Array, n_mels: int = 80,
                    lfr_m: int = 7, lfr_n: int = 6,
                    normalize: bool = True) -> jax.Array:
    """Full FunASR preprocessing: mel → LFR → CMVN. (T,) → (T', n_mels*lfr_m)."""
    feats = funasr_log_mel(audio, n_mels=n_mels)
    feats = apply_lfr(feats, lfr_m, lfr_n)
    if normalize:
        feats = apply_cmvn(feats)
    return feats


def kaldi_fbank(audio: jax.Array, sample_rate: int = 16000, n_mels: int = 80,
                frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                fmin: float = 20.0) -> jax.Array:
    """Kaldi-compatible fbank (CAMPPlus): (T,) → (frames, n_mels)."""
    win_length = int(sample_rate * frame_length_ms / 1000)
    hop = int(sample_rate * frame_shift_ms / 1000)
    n_fft = 1 << (win_length - 1).bit_length()

    frames = frame(audio, win_length, hop)  # snip_edges framing
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = jnp.concatenate(
        [frames[..., :1], frames[..., 1:] - 0.97 * frames[..., :-1]], axis=-1
    )
    pre = pre * jnp.asarray(windows.povey(win_length))
    pre = jnp.pad(pre, [(0, 0)] * (pre.ndim - 1) + [(0, n_fft - win_length)])

    basis = jnp.asarray(dft_basis(n_fft))
    spec = jnp.matmul(pre.astype(jnp.float32), basis, precision=_HIGHEST)
    k = n_fft // 2 + 1
    power = spec[..., :k] ** 2 + spec[..., k:] ** 2

    fb = jnp.asarray(mel_filters.kaldi_htk(sample_rate, n_fft, n_mels, fmin=fmin))
    mel = jnp.matmul(power, fb.T, precision=_HIGHEST)
    return jnp.log(jnp.maximum(mel, 1.1920929e-07))
