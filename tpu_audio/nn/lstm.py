"""LSTM / BiLSTM as lax.scan over time (PyTorch gate order i, f, g, o).

Backs Kokoro's duration/prosody BiLSTMs (package/TTS/Kokoro/BuildingBlocks/
LSTM.swift), the Chatterbox VoiceEncoder 3-layer LSTM
(package/TTS/Chatterbox/VoiceEncoder/ChatterboxLSTM.swift) and the HiFT
ConvRNN F0 predictor. Params per direction:
  {"wx": (4H, D), "wh": (4H, H), "bias_ih": (4H,), "bias_hh": (4H,)}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm(p: dict, x: jax.Array, reverse: bool = False,
         h0: jax.Array | None = None, c0: jax.Array | None = None) -> jax.Array:
    """x: (B, T, D) → outputs (B, T, H)."""
    b, t, _ = x.shape
    hdim = p["wh"].shape[1]
    h = jnp.zeros((b, hdim), x.dtype) if h0 is None else h0
    c = jnp.zeros((b, hdim), x.dtype) if c0 is None else c0

    bias = p.get("bias_ih", 0)
    if "bias_hh" in p:
        bias = bias + p["bias_hh"]
    # hoist the input projection out of the scan: one big GEMM
    xw = x @ p["wx"].T.astype(x.dtype) + bias

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ p["wh"].T.astype(h.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H)
    (_, _), ys = jax.lax.scan(step, (h, c), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def bilstm(p: dict, x: jax.Array) -> jax.Array:
    """p: {"fwd": ..., "bwd": ...} → (B, T, 2H)."""
    fwd = lstm(p["fwd"], x)
    bwd = lstm(p["bwd"], x, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def masked_bilstm(p: dict, x: jax.Array, valid_len) -> jax.Array:
    """BiLSTM over (B, T, C) where only the first valid_len frames are real.

    The backward direction must start from the LAST VALID frame, not the
    padded tail (zero inputs still move the hidden state through the
    biases), so the valid region is index-reversed with a gather before and
    after the backward scan. Output frames past valid_len are zeroed.
    """
    b, t, _ = x.shape
    ar = jnp.arange(t)
    mask = (ar < valid_len)[None, :, None]
    fwd = lstm(p["fwd"], x)
    flip_idx = jnp.where(ar < valid_len, valid_len - 1 - ar, ar)
    x_flipped = x[:, flip_idx]
    bwd_flipped = lstm(p["bwd"], x_flipped)
    bwd = bwd_flipped[:, flip_idx]
    out = jnp.concatenate([fwd, bwd], axis=-1)
    return jnp.where(mask, out, 0)
