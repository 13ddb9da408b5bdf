"""Fused Pallas log-mel kernel.

One kernel fuses window → DFT (MXU GEMM) → |·|² → mel projection (MXU
GEMM) → log per block of frames, keeping the power spectrum entirely in
VMEM (the XLA path materializes a (frames, n_fft//2+1) power tensor in
HBM between the two GEMMs). Framing itself stays an XLA gather feeding the
kernel: Mosaic requires lane-aligned dynamic loads, and a 160-sample hop
can't be aligned — the gather is bandwidth-trivial (1.9 MB per 30 s) and
fuses into the kernel's input pipeline.

The Whisper global max−8 clip needs the global max, so it's applied by the
caller. Falls back transparently to ops/frontends on non-TPU platforms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_audio.ops import mel_filters, windows
from tpu_audio.ops.stft import dft_basis, frame

BLOCK_FRAMES = 256


def _kernel(frames_ref, basis_ref, fb_ref, out_ref, *, n_fft: int,
            log10: bool):
    spec = jnp.dot(frames_ref[:, :], basis_ref[:, :],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    k = n_fft // 2 + 1
    power = spec[:, :k] ** 2 + spec[:, k:] ** 2
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    mel = jnp.maximum(mel, 1e-10)
    out_ref[:, :] = jnp.log10(mel) if log10 else jnp.log(mel)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels",
                                             "sample_rate", "fmax", "log10",
                                             "window_name"))
def fused_log_mel(audio: jax.Array, *, n_fft: int = 400, hop: int = 160,
                  n_mels: int = 128, sample_rate: int = 16000,
                  fmax: float = 8000.0, log10: bool = True,
                  window_name: str = "hann") -> jax.Array:
    """audio (T,) already padded (reflect+tail) → (num_frames, n_mels)
    UN-normalized log mel; num_frames must be a BLOCK_FRAMES multiple."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_frames = (audio.shape[0] - n_fft) // hop + 1
    block = BLOCK_FRAMES
    grid = num_frames // block
    assert grid * block == num_frames, "pad frames to BLOCK_FRAMES multiple"

    win = windows.get_window(window_name, n_fft)
    basis = dft_basis(n_fft) * win[:, None]  # window folded into the DFT
    fb = mel_filters.slaney(sample_rate, n_fft, n_mels, fmax=fmax).T

    frames = frame(audio.astype(jnp.float32), n_fft, hop)
    kernel = functools.partial(_kernel, n_fft=n_fft, log10=log10)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_frames, n_mels), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(frames, jnp.asarray(basis), jnp.asarray(fb))


def whisper_log_mel_pallas(audio: jax.Array, n_mels: int = 128) -> jax.Array:
    """Whisper front-end via the fused kernel: reflect-pad, kernel, global
    max−8 clip + (x+4)/4 norm. audio: (480000,) 16 kHz → (3000, n_mels)."""
    pad = 200
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    total_frames = audio.shape[0] // 160  # whisper drops the final frame
    frames_pad = -(-total_frames // BLOCK_FRAMES) * BLOCK_FRAMES
    need = (frames_pad - 1) * 160 + 400
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    log_spec = fused_log_mel(x, n_mels=n_mels)[:total_frames]
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0


def is_supported() -> bool:
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
