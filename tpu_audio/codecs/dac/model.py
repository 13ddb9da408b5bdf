"""Descript Audio Codec (DAC) — full encode/RVQ/decode.

Reference: package/Codec/DAC/DACModel.swift:14-307, DACQuantize.swift,
DACLayers.swift — Snake-activated weight-normalized conv encoder, residual
VQ with L2-normalized nearest-neighbor lookup and per-stage in/out
projections, mirrored decoder. Repo: mlx-community/dac-speech-24khz-1.5kbps
(~75 tokens/s, 2 codebooks — OuteTTSAudioProcessor.swift:394).

Channels-last throughout; encode and decode are single jit regions over
bucketed lengths (the engines handle bucketing).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.nn import layers


@dataclass(frozen=True)
class DACConfig:
    sampling_rate: int = 24000
    encoder_dim: int = 64
    encoder_rates: tuple = (2, 4, 5, 8)
    decoder_dim: int = 1536
    decoder_rates: tuple = (8, 5, 4, 2)
    n_codebooks: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 8
    latent_dim: int = 1024  # encoder_dim * 2**len(rates)

    @property
    def hop(self) -> int:
        h = 1
        for r in self.encoder_rates:
            h *= r
        return h


def _snake(x, alpha):
    a = alpha.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


def _wn(p, x, **kw):
    return layers.weight_norm_conv1d(p, x, **kw)


def _wn_transpose(p, x, stride, padding):
    v = p["weight_v"].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True) + 1e-12)
    w = (v / norm) * p["weight_g"].astype(jnp.float32)
    q = {"weight": w.astype(x.dtype)}
    if "bias" in p:
        q["bias"] = p["bias"]
    return layers.conv_transpose1d(q, x, stride=stride, padding=padding)


# ------------------------------------------------------------------ init

def _wn_init(key, i, o, k, dtype, transpose=False):
    base = layers.init_conv1d(key, i, o, k, True, dtype)
    v = base["weight"]
    axes = (0, 2) if transpose else (0, 1)
    return {"weight_v": v,
            "weight_g": jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True)),
            "bias": base["bias"]}


def _res_unit(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": {"alpha": jnp.ones((1, 1, dim), dtype)},
        "conv1": _wn_init(k1, dim, dim, 7, dtype),
        "snake2": {"alpha": jnp.ones((1, 1, dim), dtype)},
        "conv2": _wn_init(k2, dim, dim, 1, dtype),
    }


def init_params(key, cfg: DACConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 128))
    enc = {"conv_in": _wn_init(next(ks), 1, cfg.encoder_dim, 7, dtype),
           "blocks": {}}
    dim = cfg.encoder_dim
    for i, stride in enumerate(cfg.encoder_rates):
        dim *= 2
        enc["blocks"][str(i)] = {
            "residuals": {str(j): _res_unit(next(ks), dim // 2, dtype)
                          for j in range(3)},
            "snake": {"alpha": jnp.ones((1, 1, dim // 2), dtype)},
            "conv": _wn_init(next(ks), dim // 2, dim, 2 * stride, dtype),
        }
    enc["snake_out"] = {"alpha": jnp.ones((1, 1, dim), dtype)}
    enc["conv_out"] = _wn_init(next(ks), dim, cfg.latent_dim, 3, dtype)

    quant = {str(i): {
        "in_proj": _wn_init(next(ks), cfg.latent_dim, cfg.codebook_dim, 1, dtype),
        "out_proj": _wn_init(next(ks), cfg.codebook_dim, cfg.latent_dim, 1, dtype),
        "codebook": layers.init_embedding(next(ks), cfg.codebook_size,
                                          cfg.codebook_dim, dtype),
    } for i in range(cfg.n_codebooks)}

    dec = {"conv_in": _wn_init(next(ks), cfg.latent_dim, cfg.decoder_dim, 7, dtype),
           "blocks": {}}
    dim = cfg.decoder_dim
    for i, stride in enumerate(cfg.decoder_rates):
        out_dim = dim // 2
        dec["blocks"][str(i)] = {
            "snake": {"alpha": jnp.ones((1, 1, dim), dtype)},
            "convT": _wn_init(next(ks), dim, out_dim, 2 * stride, dtype,
                              transpose=True),
            "residuals": {str(j): _res_unit(next(ks), out_dim, dtype)
                          for j in range(3)},
        }
        dim = out_dim
    dec["snake_out"] = {"alpha": jnp.ones((1, 1, dim), dtype)}
    dec["conv_out"] = _wn_init(next(ks), dim, 1, 7, dtype)
    return {"encoder": enc, "quantizer": quant, "decoder": dec}


# ------------------------------------------------------------------ forward

def _residual_unit(p, x, dilation):
    y = _snake(x, p["snake1"]["alpha"])
    y = _wn(p["conv1"], y, padding=(7 - 1) * dilation // 2, dilation=dilation)
    y = _snake(y, p["snake2"]["alpha"])
    y = _wn(p["conv2"], y)
    return x + y


def encode_latent(params, cfg: DACConfig, audio: jax.Array) -> jax.Array:
    """audio (B, T) → latent (B, T/hop, latent_dim)."""
    p = params["encoder"]
    x = _wn(p["conv_in"], audio[..., None], padding=3)
    for i, stride in enumerate(cfg.encoder_rates):
        blk = p["blocks"][str(i)]
        for j, dil in enumerate((1, 3, 9)):
            x = _residual_unit(blk["residuals"][str(j)], x, dil)
        x = _snake(x, blk["snake"]["alpha"])
        x = _wn(blk["conv"], x, stride=stride, padding=-(-stride // 2))
    x = _snake(x, p["snake_out"]["alpha"])
    return _wn(p["conv_out"], x, padding=1)


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def quantize(params, cfg: DACConfig, z: jax.Array):
    """Residual VQ: latent (B, T, D) → (codes (B, n_q, T), z_q (B, T, D))."""
    residual = z
    z_q = jnp.zeros_like(z)
    codes = []
    for i in range(cfg.n_codebooks):
        q = params["quantizer"][str(i)]
        z_e = _wn(q["in_proj"], residual)  # (B, T, cd)
        enc_n = _l2n(z_e)
        cb_n = _l2n(q["codebook"]["weight"])
        dist = (jnp.sum(enc_n ** 2, -1, keepdims=True)
                - 2 * enc_n @ cb_n.T
                + jnp.sum(cb_n ** 2, -1)[None, None, :])
        idx = jnp.argmin(dist, axis=-1)  # (B, T)
        z_qi = layers.embedding(q["codebook"], idx)
        out = _wn(q["out_proj"], z_qi)
        z_q = z_q + out
        residual = residual - out
        codes.append(idx)
    return jnp.stack(codes, axis=1), z_q


def encode(params, cfg: DACConfig, audio: jax.Array) -> jax.Array:
    """audio (B, T) → codes (B, n_codebooks, T/hop)."""
    return quantize(params, cfg, encode_latent(params, cfg, audio))[0]


def decode_latent(params, cfg: DACConfig, z_q: jax.Array) -> jax.Array:
    p = params["decoder"]
    x = _wn(p["conv_in"], z_q, padding=3)
    for i, stride in enumerate(cfg.decoder_rates):
        blk = p["blocks"][str(i)]
        x = _snake(x, blk["snake"]["alpha"])
        x = _wn_transpose(blk["convT"], x, stride=stride,
                          padding=-(-stride // 2))
        if stride % 2 == 1:  # torch output_padding = stride % 2
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        for j, dil in enumerate((1, 3, 9)):
            x = _residual_unit(blk["residuals"][str(j)], x, dil)
    x = _snake(x, p["snake_out"]["alpha"])
    x = _wn(p["conv_out"], x, padding=3)
    return jnp.tanh(x)[..., 0]


def codes_to_latent(params, cfg: DACConfig, codes: jax.Array) -> jax.Array:
    """codes (B, n_q, T) → summed projected latent (B, T, D)."""
    z_q = None
    for i in range(cfg.n_codebooks):
        q = params["quantizer"][str(i)]
        z_qi = layers.embedding(q["codebook"], codes[:, i])
        out = _wn(q["out_proj"], z_qi)
        z_q = out if z_q is None else z_q + out
    return z_q


def decode_codes(params, cfg: DACConfig, codes: jax.Array) -> jax.Array:
    """codes (B, n_q, T) → waveform (B, T·hop)."""
    return decode_latent(params, cfg, codes_to_latent(params, cfg, codes))
