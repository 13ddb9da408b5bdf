"""SNAC decoder (multi-scale neural audio codec, 24 kHz).

Reference: package/TTS/Orpheus/SNAC/SNACDecoder.swift:16-489 — hierarchical
RVQ with per-level temporal strides (4/2/1), weight-normalized out-
projections, then a conv decoder: depthwise k7 + pointwise 1×1 in,
4 blocks of [snake → convT(2·stride) → noise-mod → 3 dilated residual
units], final snake → conv k7 → tanh. Repo: mlx-community/snac_24khz.

TPU design: the per-level stride expansion is jnp.repeat (the reference
loops per timestep); everything is channels-last (B, T, C) and the whole
decode is one jit region with static frame count.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.nn import layers


@dataclass(frozen=True)
class SNACConfig:
    sampling_rate: int = 24000
    decoder_dim: int = 1024
    decoder_rates: tuple = (8, 8, 4, 2)
    latent_dim: int = 768
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: tuple = (4, 2, 1)
    noise: bool = True
    depthwise: bool = True

    @property
    def hop(self) -> int:
        h = 1
        for r in self.decoder_rates:
            h *= r
        return h  # 512 samples per latent frame


def _wn(p, x, **kw):
    return layers.weight_norm_conv1d(p, x, **kw)


def init_params(key, cfg: SNACConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))

    def wn_conv(i, o, k, bias=True, groups=1):
        base = layers.init_conv1d(next(ks), i // groups, o, k, bias, dtype)
        v = base["weight"]
        g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        p = {"weight_v": v, "weight_g": g}
        if bias:
            p["bias"] = base["bias"]
        return p

    quant = {}
    for i in range(len(cfg.vq_strides)):
        quant[str(i)] = {
            "codebook": layers.init_embedding(next(ks), cfg.codebook_size,
                                              cfg.codebook_dim, dtype),
            "out_proj": wn_conv(cfg.codebook_dim, cfg.latent_dim, 1),
        }

    dec = {
        "depthwise_conv": wn_conv(cfg.latent_dim, cfg.latent_dim, 7,
                                  groups=cfg.latent_dim),
        "pointwise_conv": wn_conv(cfg.latent_dim, cfg.decoder_dim, 1),
        "blocks": {},
        "final_conv": wn_conv(cfg.decoder_dim // (2 ** 4), 1, 7),
        "final_snake": {"alpha": jnp.ones((1, 1, cfg.decoder_dim // 16), dtype)},
    }
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim = cfg.decoder_dim // (2 ** i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        # transposed conv weight, our (K, I, O) layout; weight-norm per
        # input channel (torch weight_norm dim=0 on ConvTranspose1d)
        base = layers.init_conv1d(next(ks), in_dim, out_dim, 2 * stride, True, dtype)
        v = base["weight"]
        blk = {
            "snake": {"alpha": jnp.ones((1, 1, in_dim), dtype)},
            "convT": {"weight_v": v,
                      "weight_g": jnp.sqrt(jnp.sum(v * v, axis=(0, 2),
                                                   keepdims=True)),
                      "bias": base["bias"]},
            "residuals": {},
        }
        if cfg.noise:
            blk["noise"] = {"linear": wn_conv(out_dim, 1, 1, bias=False)}
        for j, dil in enumerate((1, 3, 9)):
            blk["residuals"][str(j)] = {
                "snake1": {"alpha": jnp.ones((1, 1, out_dim), dtype)},
                "conv1": wn_conv(out_dim, out_dim, 7, groups=groups),
                "snake2": {"alpha": jnp.ones((1, 1, out_dim), dtype)},
                "conv2": wn_conv(out_dim, out_dim, 1),
            }
        dec["blocks"][str(i)] = blk
    return {"quantizer": quant, "decoder": dec}


def _snake(x, alpha):
    a = alpha.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


def _wn_transpose(p, x, stride, padding):
    v = p["weight_v"].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True) + 1e-12)
    w = (v / norm) * p["weight_g"].astype(jnp.float32)
    q = {"weight": w.astype(x.dtype)}
    if "bias" in p:
        q["bias"] = p["bias"]
    return layers.conv_transpose1d(q, x, stride=stride, padding=padding)


def embed_codes(params, cfg: SNACConfig, codes: list[jax.Array]) -> jax.Array:
    """codes[i]: (B, T_i) int32 with T_i = T / vq_strides[i] → latent
    (B, T·1, latent_dim) summed across levels."""
    total = codes[-1].shape[1]  # stride-1 level defines the frame count
    z = None
    for i, stride in enumerate(cfg.vq_strides):
        q = params["quantizer"][str(i)]
        emb = layers.embedding(q["codebook"], codes[i])  # (B, T_i, cd)
        proj = _wn(q["out_proj"], emb)  # (B, T_i, latent)
        if stride > 1:
            proj = jnp.repeat(proj, stride, axis=1)
        proj = proj[:, :total]
        z = proj if z is None else z + proj
    return z


def _pos_noise(key, block: int, start, length: int, dtype) -> jax.Array:
    """N(0,1) noise keyed by (block, absolute upsampled position).

    Position-stable: the draw at absolute position p is the same whatever
    window of the stream is being decoded, so a sliding-window streaming
    decode is sample-identical to the one-shot decode (the split-key draw
    in decode_latent depends on the window shape). `start` may be traced
    (dynamic window offset under jit)."""
    pos = jnp.int32(start) + jnp.arange(length, dtype=jnp.int32)
    kb = jax.random.fold_in(key, block)
    draw = jax.vmap(lambda p: jax.random.normal(jax.random.fold_in(kb, p),
                                                (), jnp.float32))
    return draw(pos).astype(dtype)[None, :, None]


def decode_latent(params, cfg: SNACConfig, z: jax.Array,
                  key: jax.Array | None = None,
                  noises: list | None = None,
                  noise_pos: jax.Array | None = None) -> jax.Array:
    """latent (B, T, latent_dim) → waveform (B, T·hop).

    noises: optional per-block (B, T_i, 1) arrays replacing the PRNG draw
    (parity tests inject the same noise into the torch reference).
    noise_pos: absolute latent-frame index of z[:, 0] — switches the noise
    draw to the position-stable scheme (_pos_noise) required for
    streaming-window == one-shot parity; noise is then shared across the
    batch (streaming serves B=1)."""
    p = params["decoder"]
    x = _wn(p["depthwise_conv"], z, padding=3, groups=cfg.latent_dim)
    x = _wn(p["pointwise_conv"], x)
    upsample = 1
    for i, stride in enumerate(cfg.decoder_rates):
        blk = p["blocks"][str(i)]
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        x = _snake(x, blk["snake"]["alpha"])
        x = _wn_transpose(blk["convT"], x, stride=stride,
                          padding=-(-stride // 2))
        if stride % 2 == 1:  # output_padding = stride % 2
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        upsample *= stride
        if cfg.noise and "noise" in blk:
            h = _wn(blk["noise"]["linear"], x)
            if noises is not None:
                noise = jnp.asarray(noises[i], x.dtype)
            elif noise_pos is not None and key is not None:
                noise = _pos_noise(key, i, noise_pos * upsample,
                                   x.shape[1], x.dtype)
            elif key is not None:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, (x.shape[0], x.shape[1], 1),
                                          x.dtype)
            else:
                noise = jnp.zeros((x.shape[0], x.shape[1], 1), x.dtype)
            x = x + noise * h
        for j, dil in enumerate((1, 3, 9)):
            r = blk["residuals"][str(j)]
            y = _snake(x, r["snake1"]["alpha"])
            y = _wn(r["conv1"], y, padding=(7 - 1) * dil // 2, dilation=dil,
                    groups=groups)
            y = _snake(y, r["snake2"]["alpha"])
            y = _wn(r["conv2"], y)
            x = x + y
    x = _snake(x, p["final_snake"]["alpha"])
    x = _wn(p["final_conv"], x, padding=3)
    return jnp.tanh(x)[..., 0]


def decode_codes(params, cfg: SNACConfig, codes: list[jax.Array],
                 key: jax.Array | None = None,
                 noise_pos: jax.Array | None = None) -> jax.Array:
    return decode_latent(params, cfg, embed_codes(params, cfg, codes), key,
                         noise_pos=noise_pos)
