"""Upsample conformer encoder: speech tokens → mel-rate features.

Reference: package/Codec/S3Gen/Transformer/UpsampleConformerEncoder.swift
+ Attention.swift — linear embed + ESPnet relative-position attention
(pos_bias_u/v + rel-shift), pre-lookahead conv (3 frames ahead), 6 encoder
layers, ×2 nearest upsample + causal conv, 4 more layers, final norm.
macaron/conv-module are off in this build, so each layer is pre-LN
rel-attention + FFN (SiLU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers


@dataclass(frozen=True)
class ConformerConfig:
    input_size: int = 512
    output_size: int = 512
    heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    pre_lookahead_len: int = 3
    upsample_stride: int = 2
    static_chunk_size: int = 25 * 2  # streaming chunk (tokens×2 after upsample)


def _layer_init(ks, d, ff, heads, dtype):
    return {
        "self_attn": {
            "linear_q": layers.init_linear(next(ks), d, d, True, dtype),
            "linear_k": layers.init_linear(next(ks), d, d, True, dtype),
            "linear_v": layers.init_linear(next(ks), d, d, True, dtype),
            "linear_out": layers.init_linear(next(ks), d, d, True, dtype),
            "linear_pos": layers.init_linear(next(ks), d, d, False, dtype),
            "pos_bias_u": jnp.zeros((heads, d // heads), dtype),
            "pos_bias_v": jnp.zeros((heads, d // heads), dtype),
        },
        "feed_forward": {
            "w_1": layers.init_linear(next(ks), d, ff, True, dtype),
            "w_2": layers.init_linear(next(ks), ff, d, True, dtype),
        },
        "norm_ff": layers.init_norm(d, dtype=dtype),
        "norm_mha": layers.init_norm(d, dtype=dtype),
    }


def init_params(key, cfg: ConformerConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 256))
    d = cfg.output_size
    return {
        "embed": {"out": layers.init_linear(next(ks), cfg.input_size, d, True,
                                            dtype),
                  "norm": layers.init_norm(d, dtype=dtype)},
        "pre_lookahead_layer": {
            "conv1": layers.init_conv1d(next(ks), d, d,
                                        cfg.pre_lookahead_len + 1, dtype=dtype),
            "conv2": layers.init_conv1d(next(ks), d, d, 3, dtype=dtype),
        },
        "encoders": {str(i): _layer_init(ks, d, cfg.linear_units, cfg.heads, dtype)
                     for i in range(cfg.num_blocks)},
        "up_layer": {"conv": layers.init_conv1d(next(ks), d, d, 5, dtype=dtype)},
        "up_embed": {"out": layers.init_linear(next(ks), d, d, True, dtype),
                     "norm": layers.init_norm(d, dtype=dtype)},
        "up_encoders": {str(i): _layer_init(ks, d, cfg.linear_units, cfg.heads, dtype)
                        for i in range(cfg.num_up_blocks)},
        "after_norm": layers.init_norm(d, dtype=dtype),
    }


def _rel_pos_emb(t: int, d: int, dtype=jnp.float32) -> jax.Array:
    """The reference's RelPositionalEncoding (Embedding.swift:17-85):
    POSITIVE positions [0, T) with sin and cos halves CONCATENATED (the
    stack-transpose-reshape in createPE concatenates, despite its
    "interleave" comment), shape (1, T, D). Round-3 fix: this replaced an
    ESPnet 2T-1 table + rel-shift — the reference ignores its
    "rel_pos_espnet" config string and builds the simpler encoding."""
    pos = np.arange(t, dtype=np.float64)
    inv = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    ang = pos[:, None] * inv[None, :]
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)
    return jnp.asarray(pe[None], dtype)


def _rel_attention(p, x, pos_emb, bias, heads):
    b, t, d = x.shape
    hd = d // heads
    q = layers.linear(p["linear_q"], x).reshape(b, t, heads, hd)
    k = layers.linear(p["linear_k"], x).reshape(b, t, heads, hd)
    v = layers.linear(p["linear_v"], x).reshape(b, t, heads, hd)
    pe = layers.linear(p["linear_pos"], pos_emb).reshape(1, -1, heads, hd)

    q_u = (q + p["pos_bias_u"][None, None]).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"][None, None]).transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, kt,
                    preferred_element_type=jnp.float32)
    # pos_emb has length T (matrixAC.shape == matrixBD.shape), so the
    # reference takes the no-rel-shift branch (Attention.swift:186-190)
    bd = jnp.einsum("bhqd,phkd->bhqk", q_v, pe.transpose(0, 2, 1, 3),
                    preferred_element_type=jnp.float32)
    scores = (ac + bd) / jnp.sqrt(hd) + bias
    w = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
    return layers.linear(p["linear_out"], o.reshape(b, t, d))


def _encoder_layer(p, x, pos_emb, bias, heads):
    h = layers.layer_norm(p["norm_mha"], x)
    x = x + _rel_attention(p["self_attn"], h, pos_emb, bias, heads)
    h = layers.layer_norm(p["norm_ff"], x)
    x = x + layers.linear(p["feed_forward"]["w_2"], jax.nn.silu(
        layers.linear(p["feed_forward"]["w_1"], h)))
    return x


def _chunk_bias(t, lengths, chunk, streaming):
    ki = jnp.arange(t)[None, :]
    pad = jnp.where(ki < lengths[:, None], 0.0, attention.NEG_INF)
    bias = pad[:, None, None, :]
    if streaming and chunk > 0:
        qc = jnp.arange(t)[:, None] // chunk
        kc = jnp.arange(t)[None, :] // chunk
        bias = bias + jnp.where(kc <= qc, 0.0,
                                attention.NEG_INF)[None, None]
    return bias.astype(jnp.float32)


def forward(params, cfg: ConformerConfig, x: jax.Array, lengths,
            streaming: bool = False):
    """tokens embedded (B, T, input) + valid lengths → (B, 2T, output)."""
    b, t, _ = x.shape
    d = cfg.output_size
    x = layers.layer_norm(params["embed"]["norm"],
                          layers.linear(params["embed"]["out"], x))
    # RelPositionalEncoding scales the embedded input by sqrt(d)
    # (Embedding.swift:79-84) — round-3 fix
    x = x * jnp.asarray(np.sqrt(d), x.dtype)
    # pre-lookahead: conv that peeks pre_lookahead_len frames ahead;
    # leaky slope is the MLX default 0.01 and conv2 has NO activation
    # (UpsampleConformerEncoder.swift:95-103) — round-3 fix
    pl = params["pre_lookahead_layer"]
    h = layers.conv1d(pl["conv1"], x, padding=(0, cfg.pre_lookahead_len))
    h = jax.nn.leaky_relu(h, 0.01)
    h = layers.conv1d(pl["conv2"], h, padding=(2, 0))
    x = x + h

    pos = _rel_pos_emb(t, cfg.output_size, x.dtype)
    bias = _chunk_bias(t, lengths, cfg.static_chunk_size // cfg.upsample_stride,
                       streaming)
    for i in range(cfg.num_blocks):
        x = _encoder_layer(params["encoders"][str(i)], x, pos, bias, cfg.heads)

    # ×2 upsample: nearest repeat + left-padded conv, NO activation
    # (Upsample1D, UpsampleConformerEncoder.swift:14-56) — round-3 fix
    x = jnp.repeat(x, cfg.upsample_stride, axis=1)
    x = layers.conv1d(params["up_layer"]["conv"], x,
                      padding=(2 * cfg.upsample_stride, 0))
    lengths2 = lengths * cfg.upsample_stride
    t2 = x.shape[1]
    x = layers.layer_norm(params["up_embed"]["norm"],
                          layers.linear(params["up_embed"]["out"], x))
    x = x * jnp.asarray(np.sqrt(d), x.dtype)
    pos2 = _rel_pos_emb(t2, cfg.output_size, x.dtype)
    bias2 = _chunk_bias(t2, lengths2, cfg.static_chunk_size, streaming)
    for i in range(cfg.num_up_blocks):
        x = _encoder_layer(params["up_encoders"][str(i)], x, pos2, bias2,
                           cfg.heads)
    return layers.layer_norm(params["after_norm"], x), lengths2
