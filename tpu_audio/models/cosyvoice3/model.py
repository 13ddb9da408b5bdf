"""CosyVoice3 streaming synthesis: token chunks → incremental mel → audio.

Reference: package/TTS/CosyVoice3/CosyVoice3Model.swift:10-669 — chunk 25
tokens + 3-token pre-lookahead, silent-token filter (FSQ ids {1,2,28,29,
55,248,494,2241,2242,2322,2323}, runs > 5 dropped), mel cache concat
across chunks, incremental vocoder with source cache and sample offsets;
finalize pass without lookahead at stream end. Flow = conformer-upsampled
token features through the DiT estimator with CFG; vocoder = causal HiFT.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.s3gen import conformer, flow, hift
from tpu_audio.models.cosyvoice3 import dit
from tpu_audio.nn import layers

SILENT_TOKENS = {1, 2, 28, 29, 55, 248, 494, 2241, 2242, 2322, 2323}
MAX_SILENT_RUN = 5
CHUNK_SIZE = 25
PRE_LOOKAHEAD = 3


@dataclass(frozen=True)
class CV3FlowConfig:
    vocab_size: int = 6561
    input_dim: int = 512
    spk_dim: int = 192
    mel_dim: int = 80
    token_mel_ratio: int = 2
    conformer: conformer.ConformerConfig = field(
        default_factory=conformer.ConformerConfig)
    dit: dit.DiTConfig = field(default_factory=dit.DiTConfig)
    cfm: flow.CFMConfig = field(default_factory=flow.CFMConfig)
    hift: hift.HiFTConfig = field(default_factory=hift.HiFTConfig)


def init_params(key, cfg: CV3FlowConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "input_embedding": layers.init_embedding(ks[0], cfg.vocab_size,
                                                 cfg.input_dim, dtype),
        "spk_embed_affine_layer": layers.init_linear(ks[1], cfg.spk_dim,
                                                     cfg.dit.spk_dim, True,
                                                     dtype),
        "encoder": conformer.init_params(ks[2], cfg.conformer, dtype),
        "encoder_proj": layers.init_linear(ks[3], cfg.conformer.output_size,
                                           cfg.mel_dim, True, dtype),
        "decoder_estimator": dit.init_params(ks[4], cfg.dit, dtype),
        "mel2wav": hift.init_params(ks[5], cfg.hift, dtype),
    }


def filter_silent_tokens(tokens: list[int],
                         max_run: int = MAX_SILENT_RUN) -> list[int]:
    """Drop silent-token runs longer than max_run (CosyVoice3Model.swift
    silent-token filter)."""
    out = []
    run = 0
    for t in tokens:
        if t in SILENT_TOKENS:
            run += 1
            if run > max_run:
                continue
        else:
            run = 0
        out.append(t)
    return out


def flow_chunk(params, cfg: CV3FlowConfig, tokens, token_len, prompt_mel,
               prompt_mel_len, embedding, key, streaming: bool):
    """tokens (1, T) (prompt+generated window) → mel (1, 2T, mel_dim)."""
    emb = embedding / jnp.maximum(
        jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-8)
    spks = layers.linear(params["spk_embed_affine_layer"], emb)
    x = layers.embedding(params["input_embedding"],
                         jnp.clip(tokens, 0, cfg.vocab_size - 1))
    h, h_len = conformer.forward(params["encoder"], cfg.conformer, x,
                                 token_len, streaming=streaming)
    mu = layers.linear(params["encoder_proj"], h)
    t2 = mu.shape[1]
    cond = jnp.zeros((1, t2, cfg.mel_dim), mu.dtype)
    pm = prompt_mel[:, : min(prompt_mel.shape[1], t2)]
    cond = jax.lax.dynamic_update_slice(cond, pm.astype(mu.dtype), (0, 0, 0))
    cond = jnp.where((jnp.arange(t2) < prompt_mel_len)[None, :, None],
                     cond, 0)

    def est(x_, ml, mu_, t, spks_, cond_, stream):
        return dit.forward(params["decoder_estimator"], cfg.dit, x_, ml, mu_,
                           t, spks_, cond_, stream)

    return flow.cfm_solve(est, cfg.cfm, mu, h_len, spks, cond, key,
                          streaming=streaming)


class CV3Synthesizer:
    """Host orchestration of the chunked streaming pipeline."""

    def __init__(self, params, cfg: CV3FlowConfig):
        self.params = params
        self.cfg = cfg
        self._flow_fns = {}
        self._voc_fns = {}

    def _flow_fn(self, t_pad: int, streaming: bool):
        key_ = (t_pad, streaming)
        if key_ not in self._flow_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, tokens, tl, pm, pml, emb, key):
                return flow_chunk(params, cfg, tokens, tl, pm, pml, emb, key,
                                  streaming)

            self._flow_fns[key_] = fn
        return self._flow_fns[key_]

    def _voc_fn(self, lb: int, n_new: int):
        """Jitted vocode_window, cached per (lookback, new-frames) shape —
        steady-state streaming hits ONE compiled graph regardless of how
        long the utterance grows (the full-recompute scheme recompiled per
        length bucket AND did O(n²) work)."""
        key_ = (lb, n_new)
        if key_ not in self._voc_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, mel_, key, phase, source_tail, start_frame):
                return hift.vocode_window(params["mel2wav"], cfg.hift, mel_,
                                          key, phase, source_tail,
                                          start_frame)

            self._voc_fns[key_] = fn
        return self._voc_fns[key_]

    def stream(self, token_chunks: Iterator[list[int]],
               prompt_tokens: list[int], prompt_mel: np.ndarray,
               embedding, *, seed: int = 0,
               chunk_size: int = CHUNK_SIZE) -> Iterator[np.ndarray]:
        """Consume LM token chunks, yield incremental audio samples.

        The flow re-runs over the full accumulated token window with
        streaming (chunk-causal) attention — mathematically stable because
        every mask is causal at chunk granularity (matches the reference,
        CosyVoice3Model.swift:605-649). The vocoder, unlike the reference's
        full-mel re-run, is O(1) per chunk: hift.vocode_window with a
        32-frame lookback + carried sine phase/source state reproduces the
        full pass exactly at a fixed per-chunk cost."""
        cfg = self.cfg
        p_len = len(prompt_tokens)
        pm = jnp.asarray(prompt_mel[None]) if prompt_mel.ndim == 2 \
            else jnp.asarray(prompt_mel)
        emb = jnp.asarray(embedding)

        gen_tokens: list[int] = []
        emitted = 0  # generated tokens whose audio has been yielded
        mel_ratio = cfg.token_mel_ratio
        ups = cfg.hift.upsample_scale
        done = False
        chunk_iter = iter(token_chunks)

        # incremental vocoder state (hift.vocode_window)
        nh = cfg.hift.nb_harmonics + 1
        phase = jnp.zeros((1, nh))
        source_tail = jnp.zeros((1, 0))
        voc_frames = 0  # absolute mel frames already vocoded
        voc_key = jax.random.PRNGKey(seed)

        while True:
            while (not done
                   and len(gen_tokens) < emitted + chunk_size + PRE_LOOKAHEAD):
                try:
                    gen_tokens.extend(filter_silent_tokens(next(chunk_iter)))
                except StopIteration:
                    done = True
            emit_upto = len(gen_tokens) if done else emitted + chunk_size
            if emit_upto <= emitted:
                break
            # flow sees emitted+chunk (+ lookahead context when available)
            window_end = len(gen_tokens) if done else min(
                len(gen_tokens), emit_upto + PRE_LOOKAHEAD)
            tokens_window = list(prompt_tokens) + gen_tokens[:window_end]
            n = len(tokens_window)
            t_pad = max(32, -(-n // 32) * 32)
            toks = np.zeros((1, t_pad), np.int32)
            toks[0, :n] = tokens_window
            mel = self._flow_fn(t_pad, not done)(
                self.params, jnp.asarray(toks), jnp.asarray([n]), pm,
                jnp.asarray([pm.shape[1]]), emb, jax.random.PRNGKey(seed))
            mel_np = np.asarray(mel[0])
            valid_frames = (p_len + emit_upto) * mel_ratio

            # O(1)-per-chunk vocoding: lookback window + carried source state
            lb = min(hift.LOOKBACK_FRAMES, voc_frames)
            n_new = valid_frames - voc_frames
            window = mel_np[voc_frames - lb: valid_frames]
            audio_w, phase, source_w = self._voc_fn(lb, n_new)(
                self.params, jnp.asarray(window[None]), voc_key, phase,
                source_tail[:, source_tail.shape[1] - lb * ups:],
                jnp.asarray(voc_frames))
            new_audio = np.asarray(audio_w[0, lb * ups:], np.float32)
            new_lb = min(hift.LOOKBACK_FRAMES, valid_frames)
            source_tail = source_w[:, (lb + n_new - new_lb) * ups:]
            # skip the prompt-region samples (first chunk only)
            skip = max(0, p_len * mel_ratio - voc_frames)
            voc_frames = valid_frames
            new_audio = new_audio[skip * ups:]
            emitted = emit_upto
            if len(new_audio):
                yield new_audio
            if done:
                break
