"""Mimi neural codec (Kyutai, 24 kHz @ 12.5 Hz, split RVQ, 2048 bins).

Reference: package/TTS/Marvis/Mimi/*.swift — causal SEANet encoder/decoder
(ratios 8/6/5/4, ELU, residual blocks), 8-layer rope transformer with layer
scale on both sides, ×2 conv down/upsample to 12.5 Hz, split residual VQ
(semantic codebook 0 + acoustic 1..31), Euclidean codebooks stored as
embedding_sum / cluster_usage. Weights: kyutai/moshiko-pytorch-bf16.

TPU design: everything is causal and local (convs) or windowed (transformer
context 250), so both directions run as whole-buffer static-shape calls;
chunked playback uses the exact stateful streaming decoder in streaming.py
(conv-tail / transpose-overlap / sliding-KV state machines — the TPU
equivalent of the reference's Mimi/Conv.swift).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.nn import attention, layers, rope

ELU = jax.nn.elu


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24000
    frame_rate: float = 12.5
    dimension: int = 512
    n_filters: int = 64
    ratios: tuple = (8, 6, 5, 4)
    ksize: int = 7
    residual_ksize: int = 3
    last_ksize: int = 3
    compress: int = 2
    # transformer
    t_layers: int = 8
    t_heads: int = 8
    t_ff: int = 2048
    t_context: int = 250
    layer_scale: float = 0.01
    # quantizer
    n_q: int = 32
    bins: int = 2048
    q_dim: int = 256

    @property
    def seanet_hop(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h  # 960 → 25 Hz

    @property
    def downsample_stride(self) -> int:
        return int(self.sample_rate / self.seanet_hop / self.frame_rate)  # 2

    @property
    def hop(self) -> int:
        return self.seanet_hop * self.downsample_stride  # 1920 samples/frame


# ------------------------------------------------------------------ causal convs

def causal_conv(p, x, stride=1, dilation=1, groups=1):
    """Left-padded conv over (B, T, C): out length T//stride."""
    k = p["weight"].shape[0]
    k_eff = (k - 1) * dilation + 1
    pad = k_eff - stride
    return layers.conv1d(p, x, stride=stride, padding=(pad, 0),
                         dilation=dilation, groups=groups)


def causal_conv_transpose(p, x, stride):
    """Causal transposed conv: full output (T-1)s + k trimmed on the right
    to T·s."""
    y = layers.conv_transpose1d(p, x, stride=stride, padding=0)
    k = p["weight"].shape[0]
    trim = k - stride
    return y[:, : y.shape[1] - trim] if trim > 0 else y


# ------------------------------------------------------------------ init

def _conv_init(key, i, o, k, dtype, bias=True):
    return layers.init_conv1d(key, i, o, k, bias, dtype)


def init_params(key, cfg: MimiConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 256))
    nf, d = cfg.n_filters, cfg.dimension

    def resblock(dim):
        hidden = dim // cfg.compress
        return {"block": {
            "0": _conv_init(next(ks), dim, hidden, cfg.residual_ksize, dtype),
            "1": _conv_init(next(ks), hidden, dim, 1, dtype),
        }}

    # encoder: reversed ratios
    enc = {"init_conv1d": _conv_init(next(ks), 1, nf, cfg.ksize, dtype),
           "layers": {}}
    mult = 1
    li = 0
    for ratio in reversed(cfg.ratios):
        enc["layers"][str(li)] = resblock(nf * mult); li += 1
        enc["layers"][str(li)] = _conv_init(next(ks), nf * mult,
                                            nf * mult * 2, ratio * 2, dtype)
        li += 1
        mult *= 2
    enc["final_conv1d"] = _conv_init(next(ks), nf * mult, d, cfg.last_ksize, dtype)

    # decoder: ratios as given
    dec = {"init_conv1d": _conv_init(next(ks), d, nf * mult, cfg.ksize, dtype),
           "layers": {}}
    li = 0
    for ratio in cfg.ratios:
        dec["layers"][str(li)] = _conv_init(next(ks), nf * mult,
                                            nf * mult // 2, ratio * 2, dtype)
        li += 1
        dec["layers"][str(li)] = resblock(nf * mult // 2); li += 1
        mult //= 2
    dec["final_conv1d"] = _conv_init(next(ks), nf, 1, cfg.last_ksize, dtype)

    def xformer():
        t = {"layers": {}}
        for i in range(cfg.t_layers):
            t["layers"][str(i)] = {
                "self_attn": {
                    "q": layers.init_linear(next(ks), d, d, False, dtype),
                    "k": layers.init_linear(next(ks), d, d, False, dtype),
                    "v": layers.init_linear(next(ks), d, d, False, dtype),
                    "o": layers.init_linear(next(ks), d, d, False, dtype),
                },
                "norm1": layers.init_norm(d, dtype=dtype),
                "norm2": layers.init_norm(d, dtype=dtype),
                "gamma_1": jnp.full((d,), cfg.layer_scale, dtype),
                "gamma_2": jnp.full((d,), cfg.layer_scale, dtype),
                "mlp": {
                    "fc1": layers.init_linear(next(ks), d, cfg.t_ff, False, dtype),
                    "fc2": layers.init_linear(next(ks), cfg.t_ff, d, False, dtype),
                },
            }
        return t

    def rvq(n, with_proj):
        q = {"vq": {"layers": {}}}
        for i in range(n):
            q["vq"]["layers"][str(i)] = {"codebook": {
                "embedding_sum": jax.random.normal(next(ks), (cfg.bins, cfg.q_dim),
                                                   dtype),
                "cluster_usage": jnp.ones((cfg.bins,), dtype),
            }}
        if with_proj:
            q["input_proj"] = _conv_init(next(ks), d, cfg.q_dim, 1, dtype,
                                         bias=False)
            q["output_proj"] = _conv_init(next(ks), cfg.q_dim, d, 1, dtype,
                                          bias=False)
        return q

    return {
        "encoder": enc, "decoder": dec,
        "encoder_transformer": xformer(), "decoder_transformer": xformer(),
        "quantizer": {"rvq_first": rvq(1, True),
                      "rvq_rest": rvq(cfg.n_q - 1, True)},
        "downsample": {"conv": _conv_init(next(ks), d, d, 2 * cfg.downsample_stride,
                                          dtype, bias=False)},
        # depthwise (groups=dim), per reference Mimi/Conv.swift:357-365:
        # weight (K, 1, d)
        "upsample": {"convtr": _conv_init(next(ks), 1, d, 2 * cfg.downsample_stride,
                                          dtype, bias=False)},
    }


# ------------------------------------------------------------------ pieces

def seanet_encode(params, cfg: MimiConfig, audio: jax.Array) -> jax.Array:
    """(B, T) → (B, T/960, dimension)."""
    p = params["encoder"]
    x = causal_conv(p["init_conv1d"], audio[..., None])
    li = 0
    for ratio in reversed(cfg.ratios):
        rb = p["layers"][str(li)]["block"]; li += 1
        y = causal_conv(rb["0"], ELU(x), dilation=1)
        y = causal_conv(rb["1"], ELU(y))
        x = x + y
        x = causal_conv(p["layers"][str(li)], ELU(x), stride=ratio); li += 1
    return causal_conv(p["final_conv1d"], ELU(x))


def seanet_decode(params, cfg: MimiConfig, z: jax.Array) -> jax.Array:
    """(B, T, dimension) → (B, T·960)."""
    p = params["decoder"]
    x = causal_conv(p["init_conv1d"], z)
    li = 0
    for ratio in cfg.ratios:
        x = causal_conv_transpose(p["layers"][str(li)], ELU(x), stride=ratio)
        li += 1
        rb = p["layers"][str(li)]["block"]; li += 1
        y = causal_conv(rb["0"], ELU(x))
        y = causal_conv(rb["1"], ELU(y))
        x = x + y
    return causal_conv(p["final_conv1d"], ELU(x))[..., 0]


def transformer_apply(params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """8-layer causal rope transformer with layer scale and context window."""
    b, t, d = x.shape
    heads = cfg.t_heads
    hd = d // heads
    inv = rope.base_inv_freq(hd, 10000.0)
    pos = jnp.arange(t)
    qi = pos[:, None]
    ki = pos[None, :]
    mask = jnp.where((ki <= qi) & (ki > qi - cfg.t_context), 0.0,
                     attention.NEG_INF)[None, None].astype(jnp.float32)
    for i in range(cfg.t_layers):
        lp = params["layers"][str(i)]
        h = layers.layer_norm(lp["norm1"], x)
        q = rope.apply_rope(layers.linear(lp["self_attn"]["q"], h)
                            .reshape(b, t, heads, hd), pos, inv)
        k = rope.apply_rope(layers.linear(lp["self_attn"]["k"], h)
                            .reshape(b, t, heads, hd), pos, inv)
        v = layers.linear(lp["self_attn"]["v"], h).reshape(b, t, heads, hd)
        o = attention.attend(q, k, v, mask)
        x = x + lp["gamma_1"] * layers.linear(lp["self_attn"]["o"],
                                              o.reshape(b, t, d))
        h = layers.layer_norm(lp["norm2"], x)
        h = layers.linear(lp["mlp"]["fc2"], jax.nn.gelu(
            layers.linear(lp["mlp"]["fc1"], h), approximate=True))
        x = x + lp["gamma_2"] * h
    return x


def _codebook_embed(cb) -> jax.Array:
    usage = jnp.maximum(cb["cluster_usage"], 1e-5)[:, None]
    return cb["embedding_sum"] / usage


def rvq_encode(q, x: jax.Array, n: int) -> jax.Array:
    """x (B, T, D) → codes (B, n, T)."""
    if "input_proj" in q:
        x = layers.conv1d(q["input_proj"], x)
    residual = x
    codes = []
    for i in range(n):
        emb = _codebook_embed(q["vq"]["layers"][str(i)]["codebook"])
        c2 = jnp.sum(emb * emb, axis=-1) / 2
        dots = residual @ emb.T
        idx = jnp.argmax(dots - c2[None, None, :], axis=-1)
        quant = emb[idx]
        residual = residual - quant
        codes.append(idx)
    return jnp.stack(codes, axis=1)


def rvq_decode(q, codes: jax.Array, n: int) -> jax.Array:
    """codes (B, n, T) → (B, T, D)."""
    z = None
    for i in range(n):
        emb = _codebook_embed(q["vq"]["layers"][str(i)]["codebook"])
        quant = emb[codes[:, i]]
        z = quant if z is None else z + quant
    if "output_proj" in q:
        z = layers.conv1d(q["output_proj"], z)
    return z


def split_rvq_encode(params, cfg: MimiConfig, z: jax.Array) -> jax.Array:
    first = rvq_encode(params["quantizer"]["rvq_first"], z, 1)
    rest = rvq_encode(params["quantizer"]["rvq_rest"], z, cfg.n_q - 1)
    return jnp.concatenate([first, rest], axis=1)


def split_rvq_decode(params, cfg: MimiConfig, codes: jax.Array) -> jax.Array:
    n_q = codes.shape[1]
    z = rvq_decode(params["quantizer"]["rvq_first"], codes[:, :1], 1)
    if n_q > 1:
        z = z + rvq_decode(params["quantizer"]["rvq_rest"], codes[:, 1:],
                           n_q - 1)
    return z


# ------------------------------------------------------------------ top level

def encode(params, cfg: MimiConfig, audio: jax.Array) -> jax.Array:
    """(B, T samples) → codes (B, n_q, T/1920)."""
    z = seanet_encode(params, cfg, audio)
    z = transformer_apply(params["encoder_transformer"], cfg, z)
    # ×2 downsample pads with EDGE replication, not zeros (reference
    # Mimi/Conv.swift:341-349 padMode .edge)
    k = params["downsample"]["conv"]["weight"].shape[0]
    pad = k - cfg.downsample_stride
    z = jnp.pad(z, ((0, 0), (pad, 0), (0, 0)), mode="edge")
    z = layers.conv1d(params["downsample"]["conv"], z,
                      stride=cfg.downsample_stride)
    return split_rvq_encode(params, cfg, z)


def decode(params, cfg: MimiConfig, codes: jax.Array) -> jax.Array:
    """codes (B, n_q, T) → waveform (B, T·1920)."""
    z = split_rvq_decode(params, cfg, codes)
    z = causal_conv_transpose(params["upsample"]["convtr"], z,
                              stride=cfg.downsample_stride)
    z = transformer_apply(params["decoder_transformer"], cfg, z)
    return seanet_decode(params, cfg, z)
