"""Rotary position embeddings: plain RoPE and Llama-3 frequency-scaled RoPE.

Llama-3 scaling (used by Orpheus/Marvis backbones — reference:
package/TTS/Shared/Llama3RoPE.swift:21-50): low-frequency bands are divided
by `scale_factor`, high-frequency bands kept, with smooth interpolation in
between, computed from (factor, low_freq_factor, high_freq_factor,
original_max_position_embeddings).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def base_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


@functools.lru_cache(maxsize=None)
def llama3_inv_freq(head_dim: int, theta: float, factor: float,
                    low_freq_factor: float, high_freq_factor: float,
                    original_max_pos: int) -> np.ndarray:
    inv = base_inv_freq(head_dim, theta)
    wavelen = 2.0 * math.pi / inv
    low_wavelen = original_max_pos / low_freq_factor
    high_wavelen = original_max_pos / high_freq_factor
    scaled = inv / factor
    smooth = (original_max_pos / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1 - smooth) * scaled + smooth * inv
    out = np.where(wavelen > low_wavelen, scaled,
                   np.where(wavelen < high_wavelen, inv, smoothed))
    return out.astype(np.float64)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: np.ndarray) -> jax.Array:
    """x: (B, T, H, D), positions: (T,) or (B, T) absolute positions.

    HF-style half-split rotation (rotate_half), computed in fp32.
    """
    ang = positions[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, dtype=jnp.float32
    )
    ang = jnp.concatenate([ang, ang], axis=-1)  # (..., T, D)
    cos = jnp.cos(ang)[..., None, :]  # broadcast over heads: (..., T, 1, D)
    sin = jnp.sin(ang)[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(x.dtype)


def make_inv_freq(head_dim: int, theta: float = 10000.0,
                  rope_scaling: dict | None = None) -> np.ndarray:
    """Build inverse frequencies from an HF-style rope_scaling config dict."""
    if rope_scaling and rope_scaling.get("rope_type", rope_scaling.get("type")) == "llama3":
        return llama3_inv_freq(
            head_dim, theta,
            float(rope_scaling["factor"]),
            float(rope_scaling.get("low_freq_factor", 1.0)),
            float(rope_scaling.get("high_freq_factor", 4.0)),
            int(rope_scaling.get("original_max_position_embeddings", 8192)),
        )
    return base_inv_freq(head_dim, theta)
