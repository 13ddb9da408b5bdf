"""Chatterbox Turbo: GPT-2-medium T3 + meanflow few-step S3Gen.

Reference: package/TTS/ChatterboxTurbo/T3/T3Turbo.swift:17-120 (GPT-2
24L×1024 backbone, linear speaker projection — no perceiver, no emotion,
no CFG) and S3Gen/FlowMatching/CBTFlowMatching.swift:51-74 (meanflow:
distilled few-step Euler WITHOUT classifier-free guidance), silence token
4299 (S3GenTurbo.swift:19). Repos: mlx-community/Chatterbox-TTS-Turbo-*.

GPT-2's learned absolute positions are not shift-invariant, so instead of
the roll trick the generator feeds explicit position ids: padded slots get
position 0 and are masked; real slots get their true positions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.s3gen import flow as s3flow
from tpu_audio.nn import layers, transformer
from tpu_audio.ops import sampling

GPT2_MEDIUM = transformer.TransformerConfig(
    dim=1024, n_layers=24, n_heads=16, n_kv_heads=16, hidden_dim=4096,
    mlp="gelu_new", norm="ln", pos_emb="none",  # positions added manually
    max_position_embeddings=8192)

SILENCE_TOKEN = 4299


@dataclass(frozen=True)
class T3TurboConfig:
    gpt2: transformer.TransformerConfig = GPT2_MEDIUM
    text_tokens_dict_size: int = 50276
    speech_tokens_dict_size: int = 8194
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    speaker_embed_size: int = 256
    max_positions: int = 8192


def init_params(key, cfg: T3TurboConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 12))
    d = cfg.gpt2.dim
    return {
        "tfmr": transformer.init_params(next(ks), cfg.gpt2, dtype),
        "wpe": layers.init_embedding(next(ks), cfg.max_positions, d, dtype),
        "text_emb": layers.init_embedding(next(ks), cfg.text_tokens_dict_size,
                                          d, dtype),
        "speech_emb": layers.init_embedding(
            next(ks), cfg.speech_tokens_dict_size, d, dtype),
        "speech_head": layers.init_linear(next(ks), d,
                                          cfg.speech_tokens_dict_size, False,
                                          dtype),
        "cond_enc": {"spkr_enc": layers.init_linear(
            next(ks), cfg.speaker_embed_size, d, True, dtype)},
    }


@dataclass(frozen=True)
class TurboSampler:
    temperature: float = 0.8
    top_p: float = 0.95
    min_p: float = 0.05
    repetition_penalty: float = 1.2


class T3TurboGenerator:
    def __init__(self, params, cfg: T3TurboConfig, max_cache: int = 2048):
        self.params = params
        self.cfg = cfg
        self.max_cache = max_cache
        self._fns = {}

    def _fn(self, text_pad: int, max_new: int, sampler: TurboSampler):
        key_ = (text_pad, max_new, sampler)
        if key_ in self._fns:
            return self._fns[key_]
        cfg = self.cfg
        gcfg = cfg.gpt2

        def run(params, spk_emb, text_tokens, n_text, key):
            d = gcfg.dim
            cond = layers.linear(params["cond_enc"]["spkr_enc"],
                                 spk_emb)[:, None, :]
            text_e = layers.embedding(params["text_emb"], text_tokens[None])
            bos = layers.embedding(params["speech_emb"],
                                   jnp.full((1, 1), cfg.start_speech_token))
            total = 1 + text_pad + 1
            x = jnp.concatenate([cond, text_e, jnp.zeros_like(bos)], axis=1)
            x = jax.lax.dynamic_update_slice(x, bos, (0, 1 + n_text, 0))
            # explicit learned positions (0 for padded slots, masked anyway)
            slots = jnp.arange(total)
            pos = jnp.clip(slots, 0, n_text + 1)
            x = x + layers.embedding(params["wpe"], pos)[None]
            n_real = 2 + n_text

            cache = transformer.make_cache(gcfg, 1, self.max_cache)
            slot = jnp.arange(self.max_cache)
            # mask text-pad slots [1+n_text+1, total) — the bos slot was
            # written at 1+n_text and the garbage follows it
            extra = jnp.where((slot >= n_real) & (slot < total), -1e30,
                              0.0)[None, None, None, :]
            hidden, cache = transformer.forward_hidden(params["tfmr"], gcfg,
                                                       x, cache, extra)
            last = jax.lax.dynamic_index_in_dim(hidden[0], n_real - 1, 0,
                                                keepdims=False)
            first_logits = layers.linear(params["speech_head"],
                                         last).astype(jnp.float32)[None]

            def body(c):
                i, buf, last_tok, cache, finished, recent, key = c
                emb = layers.embedding(params["speech_emb"],
                                       last_tok[None, None])
                # last_tok is buf[i-1], the (i-1)th generated token; the
                # prefill occupied positions 0..n_text+1 (GPT2.swift:239
                # positionIds = pastLength..<pastLength+T, consecutive), so
                # generated token j sits at position n_text + 2 + j
                p = jnp.clip(n_text + 2 + (i - 1), 0, cfg.max_positions - 1)
                emb = emb + params["wpe"]["weight"][p][None, None]
                h, cache = transformer.forward_hidden(params["tfmr"], gcfg,
                                                      emb, cache, extra)
                logits = layers.linear(params["speech_head"],
                                       h[0, -1]).astype(jnp.float32)[None]
                tok, key = _select(logits, recent, key)
                buf = buf.at[i].set(tok)
                finished = finished | (tok == cfg.stop_speech_token)
                recent = jnp.concatenate([recent[1:], tok[None]])
                return (i + 1, buf, tok, cache, finished, recent, key)

            def _select(logits, recent, key):
                lg = sampling.apply_repetition_penalty(
                    logits, recent[None], sampler.repetition_penalty)[0]
                lg = lg / sampler.temperature
                lg = sampling.apply_top_p(lg[None], sampler.top_p)[0]
                lg = sampling.apply_min_p(lg[None], sampler.min_p)[0]
                key, sub = jax.random.split(key)
                return jax.random.categorical(sub, lg).astype(jnp.int32), key

            tok0, key = _select(first_logits,
                                jnp.full((64,), -1, jnp.int32), key)
            buf = jnp.full((max_new,), cfg.stop_speech_token, jnp.int32)
            buf = buf.at[0].set(tok0)
            carry = (jnp.asarray(1, jnp.int32), buf, tok0, cache,
                     tok0 == cfg.stop_speech_token,
                     jnp.full((64,), -1, jnp.int32).at[-1].set(tok0), key)
            i, buf, *_ = jax.lax.while_loop(
                lambda c: (c[0] < max_new) & ~c[4], body, carry)
            return buf, i

        fn = jax.jit(run)
        self._fns[key_] = fn
        return fn

    def generate(self, spk_emb, text_tokens: list[int], *,
                 sampler: TurboSampler = TurboSampler(), max_new: int = 600,
                 seed: int = 0) -> list[int]:
        n = len(text_tokens)
        pad = -(-max(n, 1) // 32) * 32
        toks = np.zeros(pad, np.int32)
        toks[:n] = text_tokens
        fn = self._fn(pad, max_new, sampler)
        buf, count = fn(self.params, spk_emb, jnp.asarray(toks),
                        jnp.int32(n), jax.random.PRNGKey(seed))
        out = [int(t) for t in np.asarray(buf[: int(count)])]
        return [t for t in out if t < self.cfg.start_speech_token]


class T3TurboStreamer:
    """Chunked resumable T3-Turbo decode for token-granularity streaming
    (mirrors models/cosyvoice2/lm.py CosyLMStreamer): one compiled prefill
    per text bucket + one compiled fixed-size chunk decoder; the KV cache,
    repetition-penalty window, and position counter carry across chunks on
    device. Positions stay consecutive with the prefill
    (GPT2.swift:239 positionIds = pastLength..<pastLength+T).

    first_extra: extra tokens decoded in the FIRST chunk only, so the
    synthesizer's first window (chunk + pre_lookahead tokens) needs one
    chunk dispatch instead of two — see CosyLMStreamer.
    """

    def __init__(self, gen: T3TurboGenerator, chunk: int = 25,
                 first_extra: int = 0):
        self.gen = gen
        self.chunk = chunk
        self.first_extra = first_extra
        self._prefill_fns = {}
        self._chunk_fns = {}

    def _prefill(self, text_pad: int):
        if text_pad in self._prefill_fns:
            return self._prefill_fns[text_pad]
        cfg = self.gen.cfg
        gcfg = cfg.gpt2
        max_cache = self.gen.max_cache

        def run(params, spk_emb, text_tokens, n_text):
            cond = layers.linear(params["cond_enc"]["spkr_enc"],
                                 spk_emb)[:, None, :]
            text_e = layers.embedding(params["text_emb"], text_tokens[None])
            bos = layers.embedding(params["speech_emb"],
                                   jnp.full((1, 1), cfg.start_speech_token))
            total = 1 + text_pad + 1
            x = jnp.concatenate([cond, text_e, jnp.zeros_like(bos)], axis=1)
            x = jax.lax.dynamic_update_slice(x, bos, (0, 1 + n_text, 0))
            slots = jnp.arange(total)
            pos = jnp.clip(slots, 0, n_text + 1)
            x = x + layers.embedding(params["wpe"], pos)[None]
            n_real = 2 + n_text
            cache = transformer.make_cache(gcfg, 1, max_cache)
            slot = jnp.arange(max_cache)
            extra = jnp.where((slot >= n_real) & (slot < total), -1e30,
                              0.0)[None, None, None, :]
            hidden, cache = transformer.forward_hidden(params["tfmr"], gcfg,
                                                       x, cache, extra)
            last = jax.lax.dynamic_index_in_dim(hidden[0], n_real - 1, 0,
                                                keepdims=False)
            logits = layers.linear(params["speech_head"],
                                   last).astype(jnp.float32)[None]
            return logits, cache, extra

        fn = jax.jit(run)
        self._prefill_fns[text_pad] = fn
        return fn

    def _chunk_fn(self, sampler: TurboSampler, size: int | None = None):
        chunk = size or self.chunk
        key_ = (sampler, chunk)
        if key_ in self._chunk_fns:
            return self._chunk_fns[key_]
        cfg = self.gen.cfg
        gcfg = cfg.gpt2

        def run(params, first_logits, cache, extra, recent, produced,
                n_text, key):
            def _select(logits, recent, key):
                lg = sampling.apply_repetition_penalty(
                    logits, recent[None], sampler.repetition_penalty)[0]
                lg = lg / sampler.temperature
                lg = sampling.apply_top_p(lg[None], sampler.top_p)[0]
                lg = sampling.apply_min_p(lg[None], sampler.min_p)[0]
                key, sub = jax.random.split(key)
                return jax.random.categorical(sub, lg).astype(jnp.int32), key

            def _fwd(tok, j, cache):
                """Forward generated token j (position n_text + 2 + j)."""
                emb = layers.embedding(params["speech_emb"],
                                       tok[None, None])
                p = jnp.clip(n_text + 2 + j, 0, cfg.max_positions - 1)
                emb = emb + params["wpe"]["weight"][p][None, None]
                h, cache = transformer.forward_hidden(params["tfmr"], gcfg,
                                                      emb, cache, extra)
                logits = layers.linear(params["speech_head"],
                                       h[0, -1]).astype(jnp.float32)[None]
                return logits, cache

            tok0, key = _select(first_logits, recent, key)
            buf = jnp.full((chunk,), cfg.stop_speech_token, jnp.int32)
            buf = buf.at[0].set(tok0)
            recent = jnp.concatenate([recent[1:], tok0[None]])

            def body(c):
                i, buf, last_tok, cache, finished, recent, key = c
                logits, cache = _fwd(last_tok, produced + i - 1, cache)
                tok, key = _select(logits, recent, key)
                buf = buf.at[i].set(tok)
                finished = finished | (tok == cfg.stop_speech_token)
                recent = jnp.concatenate([recent[1:], tok[None]])
                return (i + 1, buf, tok, cache, finished, recent, key)

            carry = (jnp.asarray(1, jnp.int32), buf, tok0, cache,
                     tok0 == cfg.stop_speech_token, recent, key)
            i, buf, last_tok, cache, finished, recent, _ = jax.lax.while_loop(
                lambda c: (c[0] < chunk) & ~c[4], body, carry)
            # next chunk's first logits: the last produced token has not
            # been forwarded yet (same convention as the one-shot loop)
            next_logits, cache = _fwd(last_tok, produced + i - 1, cache)
            return buf, i, finished, next_logits, cache, recent

        fn = jax.jit(run)
        self._chunk_fns[key_] = fn
        return fn

    def stream(self, spk_emb, text_tokens: list[int], *,
               sampler: TurboSampler = TurboSampler(), max_new: int = 600,
               seed: int = 0):
        """Yields lists of speech tokens (≤ chunk each) as they decode;
        stop/start specials are stripped, SILENCE_TOKEN is kept (the
        synthesis side filters it, matching _token2wav)."""
        cfg = self.gen.cfg
        n = len(text_tokens)
        pad = -(-max(n, 1) // 32) * 32
        toks = np.zeros(pad, np.int32)
        toks[:n] = text_tokens
        logits, cache, extra = self._prefill(pad)(
            self.gen.params, spk_emb, jnp.asarray(toks), jnp.int32(n))
        recent = jnp.full((64,), -1, jnp.int32)
        key = jax.random.PRNGKey(seed)
        produced = 0
        while produced < max_new:
            chunk_fn = self._chunk_fn(
                sampler, self.chunk + self.first_extra if produced == 0
                else self.chunk)
            key, sub = jax.random.split(key)
            buf, cnt, finished, logits, cache, recent = chunk_fn(
                self.gen.params, logits, cache, extra, recent,
                jnp.int32(produced), jnp.int32(n), sub)
            # the chunk decoder always runs up to `chunk` steps; honor
            # max_new exactly by trimming the final chunk
            take = min(int(cnt), max_new - produced)
            out = [int(t) for t in np.asarray(buf[:take])
                   if t < cfg.start_speech_token]
            produced += take
            if out:
                yield out
            if bool(finished):
                break


def meanflow_inference(estimator_fn, mu, mask_len, spks, cond, key,
                       n_timesteps: int = 2, streaming: bool = False):
    """CBT meanflow: few-step Euler WITHOUT CFG on a LINEAR t grid (no
    cosine warp), conditioning each step on both its start time t and end
    time r — the meanflow-distilled estimator predicts the AVERAGE
    velocity over [t, r] through its time_embed_mixer
    (CBTFlowMatching.swift:77-117, CBTDecoder.swift:617-625).
    estimator_fn(x, mask_len, mu, t, spks, cond, streaming, r).
    streaming=True applies the estimator's chunk-causal masks (the same
    discipline as flow.cfm_inference) for the windowed token-streaming
    path."""
    b, t, d = mu.shape
    z = jax.random.normal(key, (b, t, d), mu.dtype)
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)

    def step(i, x):
        dt = t_span[i + 1] - t_span[i]
        tt = jnp.full((b,), t_span[i], mu.dtype)
        rr = jnp.full((b,), t_span[i + 1], mu.dtype)
        v = estimator_fn(x, mask_len, mu, tt, spks, cond, streaming, rr)
        return x + dt * v

    return jax.lax.fori_loop(0, n_timesteps, step, z)
