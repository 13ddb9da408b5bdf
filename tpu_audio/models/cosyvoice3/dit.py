"""CosyVoice3 DiT flow estimator.

Reference: package/TTS/CosyVoice3/Flow/DiT.swift:13-782 — sinusoidal
timestep embedding (scale 1000, log-spaced over half_dim-1) → MLP;
InputEmbedding = proj(concat[x, cond, mu, spk]) + causal conv position
embedding (k31, groups 16, ×2 with mish); DiT blocks with AdaLayerNormZero
6-way modulation (shift/scale/gate for attn and mlp), x_transformers-style
rotary attention (applied to the FLAT pre-head projection, so only the
first head_dim channels rotate — DiT.swift:446-453), gelu-tanh
feedforward; AdaLayerNormZeroFinal + output projection (all LayerNorms
eps 1e-6, no affine). Streaming uses chunked causal attention masks with
unlimited left context (numDecodingLeftChunks = -1,
Config/CosyVoice3Config.swift:35); num_left_chunks >= 0 bounds the left
window for the O(1) frozen-KV streaming cache (a beyond-reference option).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers


@dataclass(frozen=True)
class DiTConfig:
    mel_dim: int = 80
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    head_dim: int = 64
    ff_mult: int = 2
    mu_dim: int = 512
    spk_dim: int = 80
    conv_pos_kernel: int = 31
    conv_pos_groups: int = 16
    static_chunk_size: int = 50
    num_left_chunks: int = -1  # -1 = unbounded (reference parity)

    @property
    def in_concat(self) -> int:
        # x + cond + mu + spk (DiT.swift InputEmbedding concat order)
        return self.mel_dim * 2 + self.mu_dim + self.spk_dim


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
        }
    return p


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _time_embed(p, t: jax.Array, dim_freq: int = 256) -> jax.Array:
    # SinusPositionEmbedding (DiT.swift:26-31): scale 1000, frequencies
    # log-spaced with denominator half_dim - 1 (torch.arange convention)
    half = dim_freq // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / (half - 1))
    ang = 1000.0 * t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    h = jax.nn.silu(layers.linear(p["time_mlp_0"], emb))
    return layers.linear(p["time_mlp_2"], h)


def _conv_pos(p, x, cfg: DiTConfig):
    # CausalConvPositionEmbedding (DiT.swift:66-107): mish after each conv
    k = cfg.conv_pos_kernel
    h = layers.conv1d(p["conv1"], x, padding=(k - 1, 0),
                      groups=cfg.conv_pos_groups)
    h = _mish(h)
    h = layers.conv1d(p["conv2"], h, padding=(k - 1, 0),
                      groups=cfg.conv_pos_groups)
    return _mish(h)


def _rope_inv_freq(head_dim: int) -> jax.Array:
    return 1.0 / (10000.0 ** (jnp.arange(0, head_dim, 2) / head_dim))


def _rope_flat(x: jax.Array, pos: jax.Array, head_dim: int) -> jax.Array:
    """x_transformers rotary on the FLAT projection (B, T, inner): only the
    first head_dim channels rotate (after the head reshape that is head 0),
    GPT-J pairwise with interleaved frequencies (DiT.swift:286-340,
    applyRotaryPosEmb called before the head reshape at 446-453)."""
    inv = _rope_inv_freq(head_dim)
    ang = pos[:, None].astype(jnp.float32) * inv[None, :]  # (T, hd/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    rot = x[..., :head_dim].astype(jnp.float32)
    a = rot[..., 0::2]
    b = rot[..., 1::2]
    even = a * cos - b * sin
    odd = b * cos + a * sin
    rotated = jnp.stack([even, odd], axis=-1).reshape(rot.shape)
    return jnp.concatenate([rotated.astype(x.dtype), x[..., head_dim:]],
                           axis=-1)


# ------------------------------------------------------------- streaming

@jax.tree_util.register_dataclass
@dataclass
class DiTStreamCache:
    """Per-flow-timestep KV + causal-conv state for O(1)-per-chunk
    streaming: every frame's K/V is computed ONCE (when its chunk is
    emitted) and frozen, so per-chunk DiT cost is O(chunk) projections/MLP
    + O(chunk × window) attention reads instead of re-running the full
    window — the reference re-runs the whole window per chunk
    (CosyVoice3Model.swift:565-650), which drifts O(n²) on long streams.

    Frozen-KV is strictly chunk-causal: a cached frame never sees frames
    emitted after it (the full-recompute path lets same-chunk right
    context update earlier frames). With chunk boundaries aligned to
    static_chunk_size the two are numerically identical (tested)."""

    k: jax.Array  # (depth, B, S_max, H, hd)
    v: jax.Array
    conv1_tail: jax.Array  # (B, k-1, dim) raw-h history feeding conv1
    conv2_tail: jax.Array  # (B, k-1, dim) conv1-output history
    pos: jax.Array  # int32: next free SLOT
    base: jax.Array  # int32: absolute frame index of slot 0 (ring sliding)


def make_stream_cache(cfg: DiTConfig, batch: int, s_max: int,
                      dtype=jnp.float32) -> DiTStreamCache:
    kt = cfg.conv_pos_kernel - 1
    shape = (cfg.depth, batch, s_max, cfg.heads, cfg.head_dim)
    return DiTStreamCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
        conv1_tail=jnp.zeros((batch, kt, cfg.dim), dtype),
        conv2_tail=jnp.zeros((batch, kt, cfg.dim), dtype),
        pos=jnp.zeros((), jnp.int32), base=jnp.zeros((), jnp.int32))


def forward_chunk(params, cfg: DiTConfig, x, mu, t, spks, cond,
                  cache: DiTStreamCache, valid_new=None
                  ) -> tuple[jax.Array, DiTStreamCache]:
    """Velocity for the NEW frames only: x/cond (B, Tn, mel) and
    mu (B, Tn, mu_dim) are the chunk being emitted; attention reads the frozen per-timestep KV cache
    (chunk-causal against absolute positions). valid_new (scalar) marks
    how many of the Tn frames are real (ragged final chunk: pad slots are
    masked out and overwritten by any later chunk). Returns (v (B, Tn,
    mel), cache advanced by valid_new)."""
    b, tn, _ = x.shape
    s_max = cache.k.shape[2]
    pos = cache.pos
    if valid_new is None:
        valid_new = jnp.int32(tn)
    t_emb = _time_embed(params["time_embed"], t)

    spk_b = jnp.broadcast_to(spks[:, None, :], (b, tn, spks.shape[-1]))
    h = layers.linear(params["input_embed"]["proj"],
                      jnp.concatenate([x, cond, mu, spk_b], axis=-1))
    # causal grouped convs with carried tails (valid conv over tail+chunk)
    kk = cfg.conv_pos_kernel
    h1_in = jnp.concatenate([cache.conv1_tail.astype(h.dtype), h], axis=1)
    c1 = _mish(layers.conv1d(params["input_embed"]["conv1"], h1_in,
                             groups=cfg.conv_pos_groups))
    h2_in = jnp.concatenate([cache.conv2_tail.astype(h.dtype), c1], axis=1)
    c2 = _mish(layers.conv1d(params["input_embed"]["conv2"], h2_in,
                             groups=cfg.conv_pos_groups))
    conv1_tail = h1_in[:, -(kk - 1):]
    conv2_tail = h2_in[:, -(kk - 1):]
    h = h + c2

    # chunk-causal mask over ABSOLUTE positions (slot + base, so ring
    # slides preserve chunk boundaries and RoPE distances)
    qpos = cache.base + pos + jnp.arange(tn)
    kpos = cache.base + jnp.arange(s_max)
    qc = qpos[:, None] // cfg.static_chunk_size
    kc = kpos[None, :] // cfg.static_chunk_size
    ok = (kc <= qc) & (jnp.arange(s_max)[None, :] < pos + valid_new)
    if cfg.num_left_chunks >= 0:
        ok &= kc >= qc - cfg.num_left_chunks
    bias = jnp.where(ok, 0.0, attention.NEG_INF)[None, None].astype(
        jnp.float32)

    kbuf, vbuf = cache.k, cache.v
    for i in range(cfg.depth):
        bp = params["blocks"][str(i)]
        mod = layers.linear(bp["attn_norm"]["linear"], jax.nn.silu(t_emb))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, -1)
        hn = layers.layer_norm(None, h, eps=1e-6)
        hn = hn * (1 + sc_msa[:, None]) + sh_msa[:, None]
        q = _rope_flat(layers.linear(bp["attn"]["to_q"], hn), qpos,
                       cfg.head_dim).reshape(b, tn, cfg.heads, cfg.head_dim)
        k = _rope_flat(layers.linear(bp["attn"]["to_k"], hn), qpos,
                       cfg.head_dim).reshape(b, tn, cfg.heads, cfg.head_dim)
        v = layers.linear(bp["attn"]["to_v"], hn).reshape(
            b, tn, cfg.heads, cfg.head_dim)
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, k[None].astype(kbuf.dtype), (i, 0, pos, 0, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, v[None].astype(vbuf.dtype), (i, 0, pos, 0, 0))
        o = attention.attend(q, kbuf[i].astype(q.dtype),
                             vbuf[i].astype(q.dtype), bias)
        h = h + g_msa[:, None] * layers.linear(
            bp["attn"]["to_out"], o.reshape(b, tn, -1))
        hn = layers.layer_norm(None, h, eps=1e-6)
        hn = hn * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        ff = layers.linear(bp["ff"]["fc2"], jax.nn.gelu(
            layers.linear(bp["ff"]["fc1"], hn), approximate=True))
        h = h + g_mlp[:, None] * ff

    mod = layers.linear(params["final_norm"]["linear"], jax.nn.silu(t_emb))
    scale, shift = jnp.split(mod, 2, -1)
    h = layers.layer_norm(None, h, eps=1e-6) * (1 + scale[:, None]) \
        + shift[:, None]
    out = layers.linear(params["proj_out"], h)
    return out, DiTStreamCache(k=kbuf, v=vbuf, conv1_tail=conv1_tail,
                               conv2_tail=conv2_tail, pos=pos + valid_new,
                               base=cache.base)


def forward(params, cfg: DiTConfig, x, mask_len, mu, t, spks, cond,
            streaming: bool = False) -> jax.Array:
    """Velocity estimator: x/cond (B, T, mel), mu (B, T, mu_dim),
    spks (B, spk), t (B,)."""
    b, tlen, _ = x.shape
    t_emb = _time_embed(params["time_embed"], t)

    spk_b = jnp.broadcast_to(spks[:, None, :], (b, tlen, spks.shape[-1]))
    h = layers.linear(params["input_embed"]["proj"],
                      jnp.concatenate([x, cond, mu, spk_b], axis=-1))
    h = h + _conv_pos(params["input_embed"], h, cfg)

    # attention bias: padding + optional streaming chunk causality
    ki = jnp.arange(tlen)[None, :]
    bias = jnp.where(ki < mask_len[:, None], 0.0,
                     attention.NEG_INF)[:, None, None, :]
    if streaming:
        qc = jnp.arange(tlen)[:, None] // cfg.static_chunk_size
        kc = jnp.arange(tlen)[None, :] // cfg.static_chunk_size
        ok = kc <= qc
        if cfg.num_left_chunks >= 0:
            ok &= kc >= qc - cfg.num_left_chunks
        bias = bias + jnp.where(ok, 0.0, attention.NEG_INF)[None, None]
    bias = bias.astype(jnp.float32)

    pos = jnp.arange(tlen)

    for i in range(cfg.depth):
        bp = params["blocks"][str(i)]
        mod = layers.linear(bp["attn_norm"]["linear"], jax.nn.silu(t_emb))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, -1)
        hn = layers.layer_norm(None, h, eps=1e-6)
        hn = hn * (1 + sc_msa[:, None]) + sh_msa[:, None]
        q = _rope_flat(layers.linear(bp["attn"]["to_q"], hn), pos,
                       cfg.head_dim).reshape(b, tlen, cfg.heads, cfg.head_dim)
        k = _rope_flat(layers.linear(bp["attn"]["to_k"], hn), pos,
                       cfg.head_dim).reshape(b, tlen, cfg.heads, cfg.head_dim)
        v = layers.linear(bp["attn"]["to_v"], hn).reshape(
            b, tlen, cfg.heads, cfg.head_dim)
        o = attention.attend(q, k, v, bias)
        h = h + g_msa[:, None] * layers.linear(
            bp["attn"]["to_out"], o.reshape(b, tlen, -1))
        hn = layers.layer_norm(None, h, eps=1e-6)
        hn = hn * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        ff = layers.linear(bp["ff"]["fc2"], jax.nn.gelu(
            layers.linear(bp["ff"]["fc1"], hn), approximate=True))
        h = h + g_mlp[:, None] * ff

    mod = layers.linear(params["final_norm"]["linear"], jax.nn.silu(t_emb))
    scale, shift = jnp.split(mod, 2, -1)
    h = layers.layer_norm(None, h, eps=1e-6) * (1 + scale[:, None]) \
        + shift[:, None]
    out = layers.linear(params["proj_out"], h)
    mask = (jnp.arange(tlen) < mask_len[:, None])[..., None]
    return jnp.where(mask, out, 0.0)
