"""CosyVoice3 DiT flow estimator.

Reference: package/TTS/CosyVoice3/Flow/DiT.swift:13-782 — sinusoidal
timestep embedding → MLP; InputEmbedding = proj(concat[x, mu, spk, cond])
+ causal conv position embedding (k31, groups 16, ×2 with gelu); DiT
blocks with AdaLayerNormZero 6-way modulation (shift/scale/gate for attn
and mlp), rotary attention, gelu-tanh feedforward; AdaLayerNormZeroFinal +
output projection. Streaming uses chunked causal attention masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers, rope


@dataclass(frozen=True)
class DiTConfig:
    mel_dim: int = 80
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    head_dim: int = 64
    ff_mult: int = 4
    spk_dim: int = 80
    conv_pos_kernel: int = 31
    conv_pos_groups: int = 16
    static_chunk_size: int = 50
    num_left_chunks: int = 2

    @property
    def in_concat(self) -> int:
        # x + mu + spk + cond
        return self.mel_dim * 3 + self.spk_dim


def init_params(key, cfg: DiTConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16 + cfg.depth * 16))
    d = cfg.dim
    inner = cfg.heads * cfg.head_dim
    p = {
        "time_embed": {
            "time_mlp_0": layers.init_linear(next(ks), 256, d, True, dtype),
            "time_mlp_2": layers.init_linear(next(ks), d, d, True, dtype),
        },
        "input_embed": {
            "proj": layers.init_linear(next(ks), cfg.in_concat, d, True, dtype),
            # grouped convs: rhs layout (k, d/groups, d)
            "conv1": layers.init_conv1d(next(ks), d // cfg.conv_pos_groups,
                                        d, cfg.conv_pos_kernel, dtype=dtype),
            "conv2": layers.init_conv1d(next(ks), d // cfg.conv_pos_groups,
                                        d, cfg.conv_pos_kernel, dtype=dtype),
        },
        "blocks": {},
        "final_norm": {"linear": layers.init_linear(next(ks), d, d * 2, True,
                                                    dtype)},
        "proj_out": layers.init_linear(next(ks), d, cfg.mel_dim, True, dtype),
    }
    for i in range(cfg.depth):
        p["blocks"][str(i)] = {
            "attn_norm": {"linear": layers.init_linear(next(ks), d, d * 6,
                                                       True, dtype)},
            "attn": {
                "to_q": layers.init_linear(next(ks), d, inner, True, dtype),
                "to_k": layers.init_linear(next(ks), d, inner, True, dtype),
                "to_v": layers.init_linear(next(ks), d, inner, True, dtype),
                "to_out": layers.init_linear(next(ks), inner, d, True, dtype),
            },
            "ff": {"fc1": layers.init_linear(next(ks), d, d * cfg.ff_mult,
                                             True, dtype),
                   "fc2": layers.init_linear(next(ks), d * cfg.ff_mult, d,
                                             True, dtype)},
            "ff_norm": layers.init_norm(d, bias=False, dtype=dtype),
        }
    return p


def _time_embed(p, t: jax.Array, dim_freq: int = 256) -> jax.Array:
    half = dim_freq // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = 1000.0 * t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    h = jax.nn.silu(layers.linear(p["time_mlp_0"], emb))
    return layers.linear(p["time_mlp_2"], h)


def _conv_pos(p, x, cfg: DiTConfig):
    k = cfg.conv_pos_kernel
    h = layers.conv1d(p["conv1"], x, padding=(k - 1, 0),
                      groups=cfg.conv_pos_groups)
    h = jax.nn.gelu(h, approximate=True)
    h = layers.conv1d(p["conv2"], h, padding=(k - 1, 0),
                      groups=cfg.conv_pos_groups)
    return jax.nn.gelu(h, approximate=True)


def forward(params, cfg: DiTConfig, x, mask_len, mu, t, spks, cond,
            streaming: bool = False) -> jax.Array:
    """Velocity estimator: x/mu/cond (B, T, mel), spks (B, spk), t (B,)."""
    b, tlen, _ = x.shape
    t_emb = _time_embed(params["time_embed"], t)

    spk_b = jnp.broadcast_to(spks[:, None, :], (b, tlen, spks.shape[-1]))
    h = layers.linear(params["input_embed"]["proj"],
                      jnp.concatenate([x, mu, spk_b, cond], axis=-1))
    h = h + _conv_pos(params["input_embed"], h, cfg)

    # attention bias: padding + optional streaming chunk causality
    ki = jnp.arange(tlen)[None, :]
    bias = jnp.where(ki < mask_len[:, None], 0.0,
                     attention.NEG_INF)[:, None, None, :]
    if streaming:
        qc = jnp.arange(tlen)[:, None] // cfg.static_chunk_size
        kc = jnp.arange(tlen)[None, :] // cfg.static_chunk_size
        ok = (kc <= qc) & (kc >= qc - cfg.num_left_chunks)
        bias = bias + jnp.where(ok, 0.0, attention.NEG_INF)[None, None]
    bias = bias.astype(jnp.float32)

    pos = jnp.arange(tlen)
    inv = rope.base_inv_freq(cfg.head_dim, 10000.0)

    for i in range(cfg.depth):
        bp = params["blocks"][str(i)]
        mod = layers.linear(bp["attn_norm"]["linear"], jax.nn.silu(t_emb))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, -1)
        hn = layers.layer_norm(None, h)
        hn = hn * (1 + sc_msa[:, None]) + sh_msa[:, None]
        q = layers.linear(bp["attn"]["to_q"], hn).reshape(
            b, tlen, cfg.heads, cfg.head_dim)
        k = layers.linear(bp["attn"]["to_k"], hn).reshape(
            b, tlen, cfg.heads, cfg.head_dim)
        v = layers.linear(bp["attn"]["to_v"], hn).reshape(
            b, tlen, cfg.heads, cfg.head_dim)
        q = rope.apply_rope(q, pos, inv)
        k = rope.apply_rope(k, pos, inv)
        o = attention.attend(q, k, v, bias)
        h = h + g_msa[:, None] * layers.linear(
            bp["attn"]["to_out"], o.reshape(b, tlen, -1))
        hn = layers.layer_norm(bp["ff_norm"], h)
        hn = hn * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        ff = layers.linear(bp["ff"]["fc2"], jax.nn.gelu(
            layers.linear(bp["ff"]["fc1"], hn), approximate=True))
        h = h + g_mlp[:, None] * ff

    mod = layers.linear(params["final_norm"]["linear"], jax.nn.silu(t_emb))
    scale, shift = jnp.split(mod, 2, -1)
    h = layers.layer_norm(None, h) * (1 + scale[:, None]) + shift[:, None]
    out = layers.linear(params["proj_out"], h)
    mask = (jnp.arange(tlen) < mask_len[:, None])[..., None]
    return jnp.where(mask, out, 0.0)
