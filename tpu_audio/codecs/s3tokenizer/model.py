"""S3 speech tokenizer (V2 25 Hz / V3): mel → FSQ speech tokens.

Reference: package/Codec/S3Tokenizer/S3Tokenizer.swift — AudioEncoderV2
(conv k3/s2 ×2 → 6 attention blocks with interleaved RoPE + FSMN depthwise
memory k31), FSQ quantizer: project to 8 dims, tanh·0.999, round to
{-1,0,1}+1, base-3 positional sum → 3^8 = 6561 codes. 100 Hz mel in,
stride 4 total → 25 Hz tokens. Loaded from mlx-community/S3TokenizerV2
(ChatterboxModel.swift:145); V3 shares the architecture (different
checkpoint + config, CosyVoice3).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_codebook_size: int = 6561
    stride: int = 2  # first conv stride; total downsample = stride * 2
    fsmn_kernel: int = 31


@functools.lru_cache(maxsize=None)
def _freqs_cis(dim: int = 64, end: int = 2048, theta: float = 10000.0):
    """Reference convention (S3Tokenizer.swift:13-37): freqs use the
    NON-standard exponent i/dim for i in [0, dim/2) — half the decay rate
    of standard RoPE's 2i/dim. Fixed in round 3 after the independent
    torch translation exposed the drift."""
    half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(half, dtype=np.float64) / dim))
    t = np.arange(end, dtype=np.float64)
    ang = np.outer(t, freqs)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rotary_half(x: jax.Array, cos, sin) -> jax.Array:
    """HALF-SPLIT (rotate_half) rotation — the reference's applyRotaryEmb
    (S3Tokenizer.swift:40-68) pairs dims (i, i+D/2), not interleaved
    (2i, 2i+1). x (B,T,H,D); cos/sin (T, D/2)."""
    c = jnp.concatenate([jnp.asarray(cos)] * 2, -1)[None, :, None, :]
    s = jnp.concatenate([jnp.asarray(sin)] * 2, -1)[None, :, None, :]
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


def init_params(key, cfg: S3TokenizerConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16 + cfg.n_audio_layer * 8))
    d = cfg.n_audio_state
    enc = {
        "conv1": layers.init_conv1d(next(ks), cfg.n_mels, d, 3, dtype=dtype),
        "conv2": layers.init_conv1d(next(ks), d, d, 3, dtype=dtype),
        "blocks": {},
    }
    for i in range(cfg.n_audio_layer):
        enc["blocks"][str(i)] = {
            "attn": {
                "query": layers.init_linear(next(ks), d, d, True, dtype),
                "key": layers.init_linear(next(ks), d, d, False, dtype),
                "value": layers.init_linear(next(ks), d, d, True, dtype),
                "out": layers.init_linear(next(ks), d, d, True, dtype),
                "fsmn_block": layers.init_conv1d(next(ks), 1, d,
                                                 cfg.fsmn_kernel, bias=False,
                                                 dtype=dtype),
            },
            "attn_ln": layers.init_norm(d, dtype=dtype),
            "mlp": {"fc1": layers.init_linear(next(ks), d, d * 4, True, dtype),
                    "fc2": layers.init_linear(next(ks), d * 4, d, True, dtype)},
            "mlp_ln": layers.init_norm(d, dtype=dtype),
        }
    return {"encoder": enc,
            "quantizer": {"fsq_codebook": {
                "project_down": layers.init_linear(next(ks), d, 8, True, dtype)}}}


def _fsmn(p, v: jax.Array, pad_mask, kernel: int) -> jax.Array:
    """Depthwise memory conv over value heads merged back to (B, T, D)."""
    b, t, h, hd = v.shape
    x = v.reshape(b, t, h * hd) * pad_mask
    left = (kernel - 1) // 2
    y = layers.depthwise_conv1d_shifted(p, x,
                                        padding=(left, kernel - 1 - left))
    return (y + x) * pad_mask


def encode_hidden(params, cfg: S3TokenizerConfig, mel: jax.Array,
                  mel_len) -> tuple[jax.Array, jax.Array]:
    """mel (B, T, n_mels) 100 Hz with valid length mel_len → hidden
    (B, T//4, D) and token lengths."""
    p = params["encoder"]
    b, t, _ = mel.shape
    mel_len = jnp.atleast_1d(jnp.asarray(mel_len))  # scalar or (B,)

    def row_mask(n, lens):
        return (jnp.arange(n)[None, :] < lens[:, None])[..., None]

    x = layers.gelu(layers.conv1d(p["conv1"],
                                  mel * row_mask(t, mel_len).astype(mel.dtype),
                                  stride=cfg.stride, padding=1))
    len1 = (mel_len + 2 - 2 - 1) // cfg.stride + 1
    t1 = x.shape[1]
    x = layers.gelu(layers.conv1d(p["conv2"],
                                  x * row_mask(t1, len1).astype(x.dtype),
                                  stride=2, padding=1))
    len2 = (len1 + 2 - 2 - 1) // 2 + 1
    t2 = x.shape[1]
    pad_mask = row_mask(t2, len2).astype(x.dtype)
    attn_bias = jnp.where(jnp.arange(t2)[None, :] < len2[:, None], 0.0,
                          attention.NEG_INF)[:, None, None, :].astype(jnp.float32)

    h = cfg.n_audio_head
    d = cfg.n_audio_state
    hd = d // h
    cos, sin = _freqs_cis(hd, max(2048, t2))
    cos, sin = cos[:t2], sin[:t2]
    scale = hd ** -0.25
    for i in range(cfg.n_audio_layer):
        bp = p["blocks"][str(i)]
        hx = layers.layer_norm(bp["attn_ln"], x)
        q = layers.linear(bp["attn"]["query"], hx).reshape(b, t2, h, hd)
        k = layers.linear(bp["attn"]["key"], hx).reshape(b, t2, h, hd)
        v = layers.linear(bp["attn"]["value"], hx).reshape(b, t2, h, hd)
        q = _apply_rotary_half(q, cos, sin) * scale
        k = _apply_rotary_half(k, cos, sin) * scale
        fsmn_mem = _fsmn(bp["attn"]["fsmn_block"], v, pad_mask,
                         cfg.fsmn_kernel)
        o = attention.attend(q, k, v, attn_bias, q_scaled=True)
        x = x + layers.linear(bp["attn"]["out"],
                              o.reshape(b, t2, d)) + fsmn_mem
        hx = layers.layer_norm(bp["mlp_ln"], x)
        x = x + layers.linear(bp["mlp"]["fc2"],
                              layers.gelu(layers.linear(bp["mlp"]["fc1"], hx)))
    return x, len2


def fsq_encode(params, hidden: jax.Array) -> jax.Array:
    """(B, T, D) → codes (B, T) in [0, 6561)."""
    p = params["quantizer"]["fsq_codebook"]["project_down"]
    h = layers.linear(p, hidden).astype(jnp.float32)
    h = jnp.round(jnp.tanh(h) * 0.9990000128746033) + 1
    powers = 3.0 ** jnp.arange(8, dtype=jnp.float32)
    return jnp.sum(h * powers, axis=-1).astype(jnp.int32)


def quantize(params, cfg: S3TokenizerConfig, mel: jax.Array, mel_len):
    """mel (B, T, n_mels) → (tokens (B, T//4), token lengths)."""
    hidden, code_len = encode_hidden(params, cfg, mel, mel_len)
    return fsq_encode(params, hidden), code_len
