"""Marvis TTS (CSM-style dual transformer + Mimi codec).

Reference: package/TTS/Marvis/Models/MarvisModel.swift:365-587 — a Llama
backbone predicts codebook 0 from summed text+audio frame embeddings; a
small depth decoder (fresh KV cache per frame) predicts codebooks 1..K-1
autoregressively, with per-codebook output heads (audio_head tensor).
Frames are (K+1)-wide: K audio codebooks + 1 text column, masked per row.

TPU design: one compiled `frame_step` generates a complete K-codebook frame
(backbone step + unrolled depth loop) with the backbone cache carried
in/out; the sentence loop feeds frames back until the zero-frame EOS.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.nn import layers, transformer
from tpu_audio.ops import sampling
from tpu_audio.ops.kvcache import KVCache

# marvis-tts-250m flavors (Models/MarvisLlamaBackbone.swift / config.json)
BACKBONE_250M = transformer.TransformerConfig(
    dim=1024, n_layers=16, n_heads=16, n_kv_heads=8, hidden_dim=4096,
    rope_theta=500000.0,
    rope_scaling={"rope_type": "llama3", "factor": 32.0,
                  "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                  "original_max_position_embeddings": 8192})
DECODER_250M = transformer.TransformerConfig(
    dim=1024, n_layers=4, n_heads=8, n_kv_heads=2, hidden_dim=4096,
    rope_theta=500000.0)


@dataclass(frozen=True)
class MarvisConfig:
    backbone: transformer.TransformerConfig = BACKBONE_250M
    decoder: transformer.TransformerConfig = DECODER_250M
    text_vocab_size: int = 128256
    audio_vocab_size: int = 2048
    n_codebooks: int = 32
    sample_rate: int = 24000
    frame_rate: float = 12.5


def init_params(key, cfg: MarvisConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    bb = transformer.init_params(ks[0], cfg.backbone, dtype)
    dec = transformer.init_params(ks[1], cfg.decoder, dtype)
    return {
        "backbone": bb,
        "decoder": dec,
        "text_embeddings": layers.init_embedding(
            ks[2], cfg.text_vocab_size, cfg.backbone.dim, dtype),
        "audio_embeddings": layers.init_embedding(
            ks[3], cfg.audio_vocab_size * cfg.n_codebooks, cfg.backbone.dim,
            dtype),
        "projection": layers.init_linear(ks[4], cfg.backbone.dim,
                                         cfg.decoder.dim, False, dtype),
        "codebook0_head": layers.init_linear(ks[5], cfg.backbone.dim,
                                             cfg.audio_vocab_size, False, dtype),
        "audio_head": jax.random.normal(
            ks[6], (cfg.n_codebooks - 1, cfg.decoder.dim,
                    cfg.audio_vocab_size), dtype) * 0.02,
    }


def embed_frame_tokens(params, cfg: MarvisConfig, tokens: jax.Array,
                       mask: jax.Array) -> jax.Array:
    """tokens (B, T, K+1) int32, mask (B, T, K+1) → summed embeds (B, T, D).

    Column K is the text id; columns 0..K-1 are audio codes offset by
    codebook index into the combined audio embedding table."""
    k = cfg.n_codebooks
    audio_ids = tokens[..., :k] + (jnp.arange(k) * cfg.audio_vocab_size)
    audio_emb = layers.embedding(params["audio_embeddings"], audio_ids)
    text_emb = layers.embedding(params["text_embeddings"], tokens[..., k])
    embeds = jnp.concatenate([audio_emb, text_emb[..., None, :]], axis=-2)
    return jnp.sum(embeds * mask[..., None].astype(embeds.dtype), axis=-2)


def depth_ring_len(cfg: MarvisConfig) -> int:
    """The depth decoder's per-frame cache ring (8-aligned) — shared by
    the decode path and the engine's kernel probe so the probed shapes
    ARE the runtime shapes."""
    return -(-(cfg.n_codebooks + 1) // 8) * 8


def backbone_ring_len(prompt_pad: int, max_frames: int,
                      frame_span: int) -> int:
    """The backbone cache ring for one sentence bucket (8-aligned)."""
    return -(-(prompt_pad + max_frames + frame_span + 8) // 8) * 8


def _depth_fused_decode(params, cfg: MarvisConfig, last_h, c0, c0_embed,
                        keys, sample, max_codebooks: int):
    """Depth decode via the whole-stack fused kernel: one Pallas launch per
    codebook (ops/pallas/fused_step.py) instead of ~90 XLA ops."""
    import numpy as _np

    from tpu_audio.ops.pallas import fused_step as fs

    dcfg = cfg.decoder
    s_pad = depth_ring_len(cfg)
    kc = jnp.zeros((dcfg.n_layers, dcfg.kv_heads, s_pad, dcfg.hd),
                   last_h.dtype)
    vc = jnp.zeros_like(kc)
    # cos/sin table for the static depth positions (numpy constant)
    ang = (_np.arange(s_pad)[:, None]
           * _np.asarray(dcfg.inv_freq())[None, :])
    ang = _np.concatenate([ang, ang], -1).astype(_np.float32)
    cos_t, sin_t = jnp.asarray(_np.cos(ang)), jnp.asarray(_np.sin(ang))
    stack = fs.prepare_stack(params["decoder"], dcfg)

    def dstep(x, pos, kc, vc):
        cos = jax.lax.dynamic_slice_in_dim(cos_t, pos, 1)
        sin = jax.lax.dynamic_slice_in_dim(sin_t, pos, 1)
        return fs.fused_decode_step(
            x, pos, cos, sin, stack, kc, vc, n_heads=dcfg.n_heads,
            n_kv_heads=dcfg.kv_heads, hd=dcfg.hd, eps=dcfg.norm_eps)

    x0 = layers.linear(params["projection"], last_h)
    _, kc, vc = dstep(x0, 0, kc, vc)
    x1 = layers.linear(params["projection"], c0_embed[:, 0])
    dh1, kc, vc = dstep(x1, 1, kc, vc)
    c1 = sample(keys[1], dh1 @ params["audio_head"][0].astype(dh1.dtype))
    if max_codebooks == 2:
        return jnp.stack([c0, c1], axis=1)

    def fbody(carry, xs):
        ci_prev, kc, vc = carry
        w, k_, i = xs
        emb = layers.embedding(
            params["audio_embeddings"],
            (ci_prev + (i - 1) * cfg.audio_vocab_size)[:, None])
        x = layers.linear(params["projection"], emb[:, 0])
        dh, kc, vc = dstep(x, i, kc, vc)
        ci = sample(k_, dh @ w.astype(dh.dtype))
        return (ci, kc, vc), ci

    xs = (params["audio_head"][1:max_codebooks - 1], keys[2:],
          jnp.arange(2, max_codebooks))
    (_, _, _), rest = jax.lax.scan(fbody, (c1, kc, vc), xs)
    rest = jnp.moveaxis(rest, 0, 1)
    return jnp.concatenate([c0[:, None], c1[:, None], rest], axis=1)


def _sampler(temperature: float, top_k: int):
    def sample(k_, logits):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lg = sampling.apply_top_k(logits.astype(jnp.float32) / temperature,
                                  top_k)
        return jax.random.categorical(k_, lg, axis=-1).astype(jnp.int32)
    return sample


def cache_to_fused(bb_cache: KVCache):
    """KVCache (L, B=1, S, KVH, hd) → the fused kernel's (L, KVH, S, hd)
    layout + position scalar (one transpose per sentence, after prefill)."""
    kc = jnp.moveaxis(bb_cache.k[:, 0], 2, 1)
    vc = jnp.moveaxis(bb_cache.v[:, 0], 2, 1)
    return kc, vc, bb_cache.pos


def frame_step_fused_bb(params, cfg: MarvisConfig, tokens: jax.Array,
                        mask: jax.Array, kc, vc, pos, start, key, *,
                        max_codebooks: int, temperature: float = 0.9,
                        top_k: int = 50):
    """Fully-fused generation frame: the 16-layer backbone single-token
    step AND every depth-decoder step run as whole-stack Pallas launches
    (~33 launches + sampling glue per frame, vs ~1400 XLA ops).

    tokens/mask (1, 1, K+1) — the previous frame; kc/vc: backbone cache in
    the kernel's (L, KVH, S_pad, hd) layout (cache_to_fused after the
    prefill forward); pos: cache position; start: first valid prompt slot
    (replaces frame_step's additive left-pad extra_mask).
    Returns (frame (1, max_codebooks), kc, vc)."""
    from tpu_audio.ops.pallas import fused_step as fs

    bcfg = cfg.backbone
    h = embed_frame_tokens(params, cfg, tokens, mask)[:, 0]     # (1, D)
    ang = (pos.astype(jnp.float32)
           * jnp.asarray(bcfg.inv_freq(), jnp.float32))
    ang = jnp.concatenate([ang, ang]).reshape(1, bcfg.hd)
    stack_bb = fs.prepare_stack(params["backbone"], bcfg)
    last_h, kc, vc = fs.fused_decode_step(
        h, pos, jnp.cos(ang), jnp.sin(ang), stack_bb, kc, vc, start=start,
        n_heads=bcfg.n_heads, n_kv_heads=bcfg.kv_heads, hd=bcfg.hd,
        eps=bcfg.norm_eps)
    last_h = last_h.astype(h.dtype)

    sample = _sampler(temperature, top_k)
    keys = jax.random.split(key, max_codebooks)
    c0 = sample(keys[0], layers.linear(params["codebook0_head"], last_h))
    if max_codebooks == 1:
        return c0[:, None], kc, vc
    c0_embed = layers.embedding(params["audio_embeddings"], c0[:, None])
    frame = _depth_fused_decode(params, cfg, last_h, c0, c0_embed,
                                keys, sample, max_codebooks)
    return frame, kc, vc


def frame_step(params, cfg: MarvisConfig, tokens: jax.Array, mask: jax.Array,
               bb_cache: KVCache, key, *, max_codebooks: int,
               temperature: float = 0.9, top_k: int = 50,
               extra_mask=None, depth_fused: bool = False):
    """Generate one K-codebook frame. tokens (B, T, K+1) is the new input
    (prompt at prefill, previous frame afterwards). Returns
    (frame (B, max_codebooks), advanced bb_cache).

    depth_fused: run each depth-decoder token through the whole-stack
    Pallas kernel (ops/pallas/fused_step.py) — ONE launch per codebook
    instead of ~90 XLA ops; the 12.5 Hz frame loop is op-issue-bound
    (docs/BENCHMARKS.md, Marvis depth-decoder restructure). TPU-only,
    B=1 only; gate with fused_step.supported()."""
    h = embed_frame_tokens(params, cfg, tokens, mask)
    h, bb_cache = transformer.forward_hidden(params["backbone"], cfg.backbone,
                                             h, bb_cache, extra_mask)
    last_h = h[:, -1]  # (B, D)
    b = last_h.shape[0]

    sample = _sampler(temperature, top_k)
    keys = jax.random.split(key, max_codebooks)
    c0 = sample(keys[0], layers.linear(params["codebook0_head"], last_h))
    c0_embed = layers.embedding(params["audio_embeddings"], c0[:, None])

    if max_codebooks == 1:
        return c0[:, None], bb_cache

    if depth_fused:
        frame = _depth_fused_decode(params, cfg, last_h, c0, c0_embed,
                                    keys, sample, max_codebooks)
        return frame, bb_cache

    # depth decoder: fresh cache, sequence [h, c0_emb, c1_emb, ...].
    # The per-codebook loop runs as ONE lax.scan over the stacked audio
    # heads instead of a 31-wide Python unroll: the unrolled form compiled
    # to hundreds of separate tiny fused regions whose dispatch overhead
    # dominated the 12.5 Hz frame loop (VERDICT r2 weak #5).
    dec_cache = transformer.make_cache(cfg.decoder, b, cfg.n_codebooks + 1,
                                       dtype=last_h.dtype)
    curr = jnp.concatenate([last_h[:, None], c0_embed], axis=1)
    # first depth step consumes [h, c0] (T=2)
    dh, dec_cache = transformer.forward_hidden(
        params["decoder"], cfg.decoder,
        layers.linear(params["projection"], curr), dec_cache)
    c1 = sample(keys[1], dh[:, -1] @ params["audio_head"][0].astype(dh.dtype))

    def body(carry, xs):
        ci_prev, cache = carry
        w, k_, i = xs
        emb = layers.embedding(
            params["audio_embeddings"],
            (ci_prev + (i - 1) * cfg.audio_vocab_size)[:, None])
        dh, cache = transformer.forward_hidden(
            params["decoder"], cfg.decoder,
            layers.linear(params["projection"], emb), cache)
        ci = sample(k_, dh[:, -1] @ w.astype(dh.dtype))
        return (ci, cache), ci

    if max_codebooks > 2:
        xs = (params["audio_head"][1:max_codebooks - 1], keys[2:],
              jnp.arange(2, max_codebooks))
        (_, _), rest = jax.lax.scan(body, (c1, dec_cache), xs)
        rest = jnp.moveaxis(rest, 0, 1)  # (B, K-2)
        frame = jnp.concatenate([c0[:, None], c1[:, None], rest], axis=1)
    else:
        frame = jnp.stack([c0, c1], axis=1)
    return frame, bb_cache
