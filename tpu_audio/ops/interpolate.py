"""1-D interpolation (torch.nn.functional.interpolate semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_2x(x: jax.Array) -> jax.Array:
    """(B, T, C) → (B, 2T, C), nearest-neighbor."""
    return jnp.repeat(x, 2, axis=-2)


def linear_resize(x: jax.Array, out_len: int) -> jax.Array:
    """Linear interpolation along axis -2 of (B, T, C), align_corners=False
    (torch default): src = (dst + 0.5) * T/out - 0.5, clamped."""
    t = x.shape[-2]
    src = (jnp.arange(out_len) + 0.5) * (t / out_len) - 0.5
    src = jnp.clip(src, 0.0, t - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (src - lo)[None, :, None].astype(x.dtype)
    return x[:, lo] * (1 - w) + x[:, hi] * w
