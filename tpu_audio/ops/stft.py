"""STFT primitives, TPU-first.

The hot path expresses the rFFT as a dense DFT **matmul** so the whole
mel front-end (frame → window → DFT → |·|² → mel projection → log) runs on
the MXU and fuses into two GEMMs — instead of the reference's
asStrided+rfft on a vector unit (package/Codec/S3Tokenizer/
S3TokenizerUtils.swift:224-263). For speech-sized FFTs (400–1920 points)
the extra FLOPs are far cheaper than leaving the MXU idle. A jnp.fft path
is kept for phase-preserving uses (iSTFT vocoders) and verification.

All shapes are static given the input length: callers bucket/pad audio on
the host before entering jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def dft_basis(n_fft: int) -> np.ndarray:
    """Real-DFT basis, shape (n_fft, 2*K) with K = n_fft//2 + 1.

    columns [0:K] are cos(2πkn/N), columns [K:2K] are -sin(2πkn/N), so
    frames @ basis yields [real | imag] of the one-sided spectrum.
    """
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Slice (..., T) into overlapping frames (..., num_frames, n_fft)."""
    t = x.shape[-1]
    num_frames = 1 + (t - n_fft) // hop
    if num_frames <= 0:
        raise ValueError(f"input length {t} too short for n_fft={n_fft}")
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def _pad_center(x: jax.Array, n_fft: int, mode: str = "reflect") -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    return jnp.pad(x, pad, mode=mode)


def stft_power(
    x: jax.Array,
    window: np.ndarray,
    n_fft: int,
    hop: int,
    center: bool = True,
    magnitude: bool = False,
) -> jax.Array:
    """Power (or magnitude) spectrogram of (..., T) → (..., frames, K).

    MXU path: windowed frames hit a single (n_fft, 2K) DFT GEMM; power is
    re² + im² folded over the stacked halves.
    """
    if center:
        x = _pad_center(x, n_fft)
    frames = frame(x, n_fft, hop)
    w = jnp.asarray(window, dtype=x.dtype)
    if w.shape[0] < n_fft:
        w = jnp.concatenate([w, jnp.zeros(n_fft - w.shape[0], dtype=w.dtype)])
    frames = frames * w
    basis = jnp.asarray(dft_basis(n_fft), dtype=jnp.float32)
    spec = jnp.matmul(frames.astype(jnp.float32), basis, precision=_HIGHEST)
    k = n_fft // 2 + 1
    power = spec[..., :k] ** 2 + spec[..., k:] ** 2
    return jnp.sqrt(power) if magnitude else power


def stft_complex(
    x: jax.Array,
    window: np.ndarray,
    n_fft: int,
    hop: int,
    center: bool = True,
) -> jax.Array:
    """Complex one-sided STFT of (..., T) → complex64 (..., frames, K)."""
    if center:
        x = _pad_center(x, n_fft)
    frames = frame(x, n_fft, hop)
    w = jnp.asarray(window, dtype=x.dtype)
    if w.shape[0] < n_fft:
        w = jnp.concatenate([w, jnp.zeros(n_fft - w.shape[0], dtype=w.dtype)])
    return jnp.fft.rfft((frames * w).astype(jnp.float32), axis=-1)


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add (..., NF, n_fft) → (..., (NF−1)·hop + n_fft).

    When hop divides n_fft (every vocoder here: HiFT 16/4, Kokoro 20/5),
    each output sample receives exactly n_fft/hop frame contributions, so
    the whole thing is R static-slice adds — no scatter, which XLA lowers
    to slow per-element updates on TPU (SURVEY §7 hard part 5; measured
    dominant in the HiFT vocoder)."""
    *lead, nf, n_fft = frames.shape
    out_len = (nf - 1) * hop + n_fft
    flat = frames.reshape((-1, nf, n_fft))
    b = flat.shape[0]
    if n_fft % hop == 0:
        out = jnp.zeros((b, out_len), frames.dtype)
        for m in range(n_fft // hop):
            piece = flat[:, :, m * hop: (m + 1) * hop].reshape(b, nf * hop)
            out = out.at[:, m * hop: m * hop + nf * hop].add(piece)
    else:
        idx = (np.arange(nf)[:, None] * hop
               + np.arange(n_fft)[None, :]).reshape(-1)
        out = jnp.zeros((b, out_len), flat.dtype).at[:, idx].add(
            flat.reshape(b, -1))
    return out.reshape(tuple(lead) + (out_len,))


def window_sumsquare(window: np.ndarray, num_frames: int, hop: int,
                     n_fft: int) -> np.ndarray:
    """Squared-window overlap normalization, computed host-side (the window
    is always concrete) so it enters the graph as a constant."""
    w = np.zeros(n_fft, np.float64)
    w[: len(window)] = np.asarray(window, np.float64)
    out = np.zeros((num_frames - 1) * hop + n_fft)
    for f in range(num_frames):
        out[f * hop: f * hop + n_fft] += w * w
    return out


def istft(
    spec: jax.Array,
    window: np.ndarray,
    n_fft: int,
    hop: int,
    length: int | None = None,
    center: bool = True,
) -> jax.Array:
    """Inverse STFT with overlap-add and squared-window normalization.

    spec: complex (..., frames, K) → waveform (..., T)."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    w = jnp.asarray(window, dtype=frames.dtype)
    frames = frames * w

    num_frames = frames.shape[-2]
    out_len = n_fft + hop * (num_frames - 1)
    lead = frames.shape[:-2]
    out = overlap_add(frames.reshape((-1, num_frames, n_fft)), hop)

    wsq = np.maximum(window_sumsquare(np.asarray(window), num_frames, hop,
                                      n_fft), 1e-11)
    out = out / jnp.asarray(wsq, out.dtype)

    if center:
        out = out[:, n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        out = out[:, :length]
    return out.reshape(lead + (out.shape[-1],))
