"""T3: Llama-based text→speech-token model with CFG and voice conditioning.

Reference: package/TTS/Chatterbox/T3/T3.swift:18-315, T3CondEnc.swift:51-140,
Perceiver.swift:141-200, Config/ChatterboxConfig.swift:65-126 —
conditioning = [speaker projection | perceiver-resampled prompt-speech
embeddings (32 queries) | emotion scalar], input = [cond | text | BOS],
CFG as a batch of 2 (unconditional row has zeroed text embeddings), logits
merged as c + w·(c − u), learned positional embeddings for text and speech.

The whole CFG decode runs as one lax.while_loop on device; the reference's
asyncEval double-buffering (T3.swift:288-303) is unnecessary here.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers, transformer
from tpu_audio.ops import sampling

LLAMA_520M = transformer.TransformerConfig(
    dim=1024, n_layers=30, n_heads=16, n_kv_heads=16, hidden_dim=4096,
    rope_theta=10000.0, norm_eps=1e-5)


@dataclass(frozen=True)
class T3Config:
    llama: transformer.TransformerConfig = LLAMA_520M
    text_tokens_dict_size: int = 704  # 2454 multilingual
    start_text_token: int = 255
    stop_text_token: int = 0
    speech_tokens_dict_size: int = 8194
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_speech_tokens: int = 1024
    speaker_embed_size: int = 256
    perceiver_tokens: int = 32
    max_text_seq_len: int = 2048
    max_mel_seq_len: int = 4096
    emotion_adv: bool = True


def init_params(key, cfg: T3Config, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 24))
    d = cfg.llama.dim
    return {
        "tfmr": transformer.init_params(next(ks), cfg.llama, dtype),
        "text_emb": layers.init_embedding(next(ks), cfg.text_tokens_dict_size,
                                          d, dtype),
        "speech_emb": layers.init_embedding(next(ks),
                                            cfg.speech_tokens_dict_size, d,
                                            dtype),
        "text_head": layers.init_linear(next(ks), d,
                                        cfg.text_tokens_dict_size, False, dtype),
        "speech_head": layers.init_linear(next(ks), d,
                                          cfg.speech_tokens_dict_size, False,
                                          dtype),
        "text_pos_emb": {"emb": layers.init_embedding(
            next(ks), cfg.max_text_seq_len, d, dtype)},
        "speech_pos_emb": {"emb": layers.init_embedding(
            next(ks), cfg.max_mel_seq_len, d, dtype)},
        "cond_enc": {
            "spkr_enc": layers.init_linear(next(ks), cfg.speaker_embed_size,
                                           d, True, dtype),
            "emotion_adv_fc": layers.init_linear(next(ks), 1, d, False, dtype),
            "perceiver": {
                "pre_attention_query": jax.random.uniform(
                    next(ks), (1, cfg.perceiver_tokens, d), dtype, -0.1, 0.1),
                "attn": {
                    "norm": layers.init_norm(d, dtype=dtype),
                    "q": layers.init_linear(next(ks), d, d, True, dtype),
                    "k": layers.init_linear(next(ks), d, d, True, dtype),
                    "v": layers.init_linear(next(ks), d, d, True, dtype),
                    "proj_out": layers.init_linear(next(ks), d, d, True, dtype),
                },
            },
        },
    }


def _perceiver(p, h: jax.Array, heads: int = 4) -> jax.Array:
    """Fixed-length resampling: queries cross-attend the prompt embeddings,
    then one self-attention pass (Perceiver.swift:171-200)."""
    b, t, d = h.shape
    q0 = jnp.broadcast_to(p["pre_attention_query"],
                          (b,) + p["pre_attention_query"].shape[1:])

    def attn_block(ap, q_in, kv):
        qn = layers.layer_norm(ap["norm"], q_in)
        kvn = layers.layer_norm(ap["norm"], kv)
        hd = d // heads
        q = layers.linear(ap["q"], qn).reshape(b, -1, heads, hd)
        k = layers.linear(ap["k"], kvn).reshape(b, -1, heads, hd)
        v = layers.linear(ap["v"], kvn).reshape(b, -1, heads, hd)
        o = attention.attend(q, k, v)
        return q_in + layers.linear(ap["proj_out"],
                                    o.reshape(b, q_in.shape[1], d))

    cross = attn_block(p["attn"], q0, h)
    return attn_block(p["attn"], cross, cross)


def prepare_conditioning(params, cfg: T3Config, speaker_emb: jax.Array,
                         cond_tokens: jax.Array | None,
                         emotion_adv: float) -> jax.Array:
    """→ cond embeddings (1, 1 + 32 + 1, D)."""
    ce = params["cond_enc"]
    spk = layers.linear(ce["spkr_enc"], speaker_emb)[:, None, :]
    parts = [spk]
    if cond_tokens is not None:
        emb = (layers.embedding(params["speech_emb"], cond_tokens)
               + params["speech_pos_emb"]["emb"]["weight"][None,
                                                           : cond_tokens.shape[1]])
        parts.append(_perceiver(ce["perceiver"], emb))
    if cfg.emotion_adv:
        emo = jnp.full((speaker_emb.shape[0], 1, 1), emotion_adv,
                       speaker_emb.dtype)
        parts.append(layers.linear(ce["emotion_adv_fc"], emo))
    return jnp.concatenate(parts, axis=1)


@dataclass(frozen=True)
class T3SamplerConfig:
    temperature: float = 0.8
    top_p: float = 0.95
    min_p: float = 0.05
    repetition_penalty: float = 1.2
    cfg_weight: float = 0.5


class T3Generator:
    """Compiled CFG speech-token generation, bucketed on text length."""

    def __init__(self, params, cfg: T3Config, max_cache: int = 2048):
        self.params = params
        self.cfg = cfg
        self.max_cache = max_cache
        self._fns = {}

    def _fn(self, text_pad: int, cond_len: int, max_new: int,
            sampler: T3SamplerConfig):
        key_ = (text_pad, cond_len, max_new, sampler)
        if key_ in self._fns:
            return self._fns[key_]
        cfg, params = self.cfg, self.params
        lcfg = cfg.llama

        def run(params, cond_emb, text_tokens, n_text, key):
            b = 2 if sampler.cfg_weight > 0 else 1
            # build LEFT-ALIGNED [cond | text | bos-at-dynamic-slot], then
            # roll right so padding wraps to the front: all real content is
            # contiguous and RoPE shift-invariance keeps padded decode exact
            text_e = layers.embedding(params["text_emb"], text_tokens[None])
            text_e = text_e + params["text_pos_emb"]["emb"]["weight"][None, :text_pad]
            if b == 2:
                text_e = jnp.concatenate([text_e, jnp.zeros_like(text_e)], 0)
            cond = jnp.broadcast_to(cond_emb, (b,) + cond_emb.shape[1:])
            bos = (layers.embedding(params["speech_emb"],
                                    jnp.full((b, 1), cfg.start_speech_token))
                   + params["speech_pos_emb"]["emb"]["weight"][None, :1])
            x = jnp.concatenate(
                [cond, text_e, jnp.zeros_like(bos)], axis=1)
            x = jax.lax.dynamic_update_slice(
                x, bos, (0, cond_len + n_text, 0))
            shift = text_pad - n_text
            x = jnp.roll(x, shift, axis=1)
            total = x.shape[1]

            cache = transformer.make_cache(lcfg, b, self.max_cache)
            # mask out the wrapped-garbage key slots at the front
            slot = jnp.arange(self.max_cache)
            extra = jnp.where(slot < shift, -1e30, 0.0)[None, None, None, :]
            hidden, cache = transformer.forward_hidden(params["tfmr"], lcfg,
                                                       x, cache, extra)
            first_logits = layers.linear(params["speech_head"],
                                         hidden[:, -1]).astype(jnp.float32)

            def body(c):
                i, buf, last, cache, finished, recent, key = c
                emb = (layers.embedding(params["speech_emb"], last[:, None])
                       + jax.lax.dynamic_slice_in_dim(
                           params["speech_pos_emb"]["emb"]["weight"],
                           i + 1, 1, 0)[None])
                hidden, cache = transformer.forward_hidden(
                    params["tfmr"], lcfg, emb, cache, extra)
                logits = layers.linear(params["speech_head"],
                                       hidden[:, -1]).astype(jnp.float32)
                tok, key = _select(logits, recent, key, i)
                buf = buf.at[i].set(tok)
                finished = finished | (tok == cfg.stop_speech_token)
                recent = jnp.concatenate([recent[1:], tok[None]])
                last = jnp.full((b,), tok)
                return (i + 1, buf, last, cache, finished, recent, key)

            def _select(logits, recent, key, i):
                if sampler.cfg_weight > 0:
                    cond_l, uncond_l = logits[0], logits[1]
                    lg = cond_l + sampler.cfg_weight * (cond_l - uncond_l)
                else:
                    lg = logits[0]
                lg = sampling.apply_repetition_penalty(
                    lg[None], recent[None], sampler.repetition_penalty)[0]
                lg = lg / sampler.temperature
                lg = sampling.apply_top_p(lg[None], sampler.top_p)[0]
                lg = sampling.apply_min_p(lg[None], sampler.min_p)[0]
                key, sub = jax.random.split(key)
                return (jax.random.categorical(sub, lg).astype(jnp.int32),
                        key)

            def cond_fn(c):
                return (c[0] < max_new) & ~c[4]

            tok0, key = _select(first_logits,
                                jnp.full((64,), -1, jnp.int32), key, 0)
            buf = jnp.full((max_new,), cfg.stop_speech_token, jnp.int32)
            buf = buf.at[0].set(tok0)
            carry = (jnp.asarray(1, jnp.int32), buf,
                     jnp.full((b,), tok0), cache,
                     tok0 == cfg.stop_speech_token,
                     jnp.full((64,), -1, jnp.int32).at[-1].set(tok0), key)
            i, buf, _, _, _, _, _ = jax.lax.while_loop(cond_fn, body, carry)
            return buf, i

        fn = jax.jit(run)
        self._fns[key_] = fn
        return fn

    def generate(self, cond_emb, text_tokens: list[int], *,
                 sampler: T3SamplerConfig = T3SamplerConfig(),
                 max_new: int = 600, seed: int = 0) -> list[int]:
        n = len(text_tokens)
        pad = -(-n // 32) * 32
        toks = np.full(pad, self.cfg.stop_text_token, np.int32)
        toks[:n] = text_tokens
        cond_len = cond_emb.shape[1]
        fn = self._fn(pad, cond_len, max_new, sampler)
        buf, count = fn(self.params, cond_emb, jnp.asarray(toks),
                        jnp.int32(n), jax.random.PRNGKey(seed))
        out = [int(t) for t in np.asarray(buf[: int(count)])]
        # drop invalid/stop tokens (ChatterboxModel.dropInvalidTokens :612-626)
        return [t for t in out if t < self.cfg.start_speech_token]
