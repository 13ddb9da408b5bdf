"""Chatterbox Turbo engine: faster variant without CFG/perceiver/emotion.

Reference: package/TTS/ChatterboxTurbo/ — GPT-2 T3 backbone, linear speaker
conditioning, S3Gen-Turbo with meanflow few-step flow (no CFG), silence
token 4299 filtered from generated streams.
Repos: mlx-community/Chatterbox-TTS-Turbo-*.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.api.tts import AudioChunk, StreamingGranularity
from tpu_audio.codecs.s3gen import flow as s3flow
from tpu_audio.codecs.s3gen import hift as s3hift
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.chatterbox import voice_encoder as ve
from tpu_audio.models.chatterbox.engine import (ChatterboxConditionals,
                                                ChatterboxEngine, punc_norm)
from tpu_audio.models.chatterbox_turbo import model as turbo
from tpu_audio.nn import layers
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer


class ChatterboxTurboEngine(ChatterboxEngine):
    """Shares the Chatterbox conditioning/vocoder plumbing; swaps in the
    GPT-2 T3 and a no-CFG meanflow flow solve."""

    def __init__(self, temperature: float = 0.8, top_p: float = 0.95,
                 min_p: float = 0.05, repetition_penalty: float = 1.2,
                 meanflow_steps: int = 2):
        super().__init__(temperature=temperature, top_p=top_p, min_p=min_p,
                         repetition_penalty=repetition_penalty,
                         cfg_weight=0.0)
        self.meanflow_steps = meanflow_steps
        self.turbo_cfg = turbo.T3TurboConfig()
        self.turbo_gen: turbo.T3TurboGenerator | None = None
        self._t3_streamer = None  # turbo.T3TurboStreamer (token granularity)
        self._turbo_synth = None  # streaming.TurboSynthesizer

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.chatterbox_turbo import load as tload

        (t3_params, self.turbo_cfg, self.s3gen_params, self.s3gen_cfg,
         self.tok_params, self.tok_cfg, self.ve_params, self.ve_cfg,
         self.tokenizer) = tload.load()
        self.turbo_gen = turbo.T3TurboGenerator(t3_params, self.turbo_cfg)
        self.is_loaded = True

    @classmethod
    def from_turbo_params(cls, t3_params, t3_cfg, s3gen_params, s3gen_cfg,
                          tok_params, tok_cfg, ve_params, ve_cfg,
                          tokenizer=None, max_cache: int = 512):
        eng = cls()
        eng.turbo_cfg = t3_cfg
        eng.turbo_gen = turbo.T3TurboGenerator(t3_params, t3_cfg,
                                               max_cache=max_cache)
        eng.s3gen_params, eng.s3gen_cfg = s3gen_params, s3gen_cfg
        eng.tok_params, eng.tok_cfg = tok_params, tok_cfg
        eng.ve_params, eng.ve_cfg = ve_params, ve_cfg
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng.is_loaded = True
        return eng

    def _token2wav(self, speech_tokens: np.ndarray,
                   cond: ChatterboxConditionals, seed: int) -> np.ndarray:
        """Meanflow (no-CFG) flow + HiFT."""
        speech_tokens = np.asarray(
            [t for t in speech_tokens if t != turbo.SILENCE_TOKEN], np.int32)
        n = len(speech_tokens)
        if n == 0:
            return np.zeros(0, np.float32)
        bucket = -(-n // 25) * 25
        p_len = cond.prompt_tokens.shape[1]
        key_ = ("meanflow", bucket, p_len)
        if key_ not in self._wav_fns:
            cfg = self.s3gen_cfg
            steps = self.meanflow_steps

            @jax.jit
            def fn(params, tokens, token_len, pt, pl, pm, pml, emb, key):
                from tpu_audio.codecs.s3gen import conformer

                fp = params["flow"]
                e = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
                spks = layers.linear(fp["spk_embed_affine_layer"], e)
                full = jnp.concatenate([pt, tokens], axis=1)
                full_len = pl + token_len
                x = layers.embedding(fp["input_embedding"],
                                     jnp.clip(full, 0, cfg.vocab_size - 1))
                h, h_len = conformer.forward(fp["encoder"], cfg.conformer, x,
                                             full_len)
                mu = layers.linear(fp["encoder_proj"], h)
                t2 = mu.shape[1]
                c = jnp.zeros((1, t2, cfg.mel_dim), mu.dtype)
                pmx = pm[:, : min(pm.shape[1], t2)]
                c = jax.lax.dynamic_update_slice(c, pmx.astype(mu.dtype),
                                                 (0, 0, 0))
                c = jnp.where((jnp.arange(t2) < pml)[None, :, None], c, 0)

                def est(x_, ml, mu_, t, spks_, cond_, stream, r=None):
                    # meanflow (t, r) conditioning when the checkpoint
                    # carries the mixer (CBTDecoder.swift:617-625)
                    if "time_embed_mixer" not in fp["decoder_estimator"]:
                        r = None
                    return s3flow.estimator_forward(
                        fp["decoder_estimator"], cfg.estimator, x_, ml, mu_,
                        t, spks_, cond_, stream, r=r)

                k1, k2 = jax.random.split(key)
                mel = turbo.meanflow_inference(est, mu, h_len, spks, c, k1,
                                               n_timesteps=steps)
                audio, _ = s3hift.generate(params["mel2wav"], cfg.hift, mel,
                                           k2)
                return (audio, pl[0] * 2 * cfg.hift.upsample_scale,
                        token_len[0] * 2 * cfg.hift.upsample_scale)

            self._wav_fns[key_] = fn
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = speech_tokens
        audio, start, valid = self._wav_fns[key_](
            self.s3gen_params, jnp.asarray(toks), jnp.asarray([n]),
            cond.prompt_tokens, jnp.asarray([p_len]), cond.prompt_mel,
            jnp.asarray([cond.prompt_mel.shape[1]]), cond.embedding,
            jax.random.PRNGKey(seed))
        out = np.asarray(audio[0, int(start): int(start) + int(valid)],
                         np.float32)
        return np.asarray(s3gen.fade_in(jnp.asarray(out)), np.float32)

    supported_streaming_granularities = (StreamingGranularity.SENTENCE,
                                         StreamingGranularity.TOKEN)
    # token granularity: first audio after ~25 speech tokens (1 s) via the
    # chunked T3 streamer + windowed meanflow, instead of the whole first
    # sentence (round-3 measured sentence-path TTFA p50 474 ms)
    default_streaming_granularity = StreamingGranularity.TOKEN

    def generate(self, text: str, **kw):
        # one-shot collection keeps the single full-context flow pass
        kw.setdefault("granularity", StreamingGranularity.SENTENCE)
        return super().generate(text, **kw)

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           max_new_tokens: int = 600,
                           **kw) -> Iterator[AudioChunk]:
        if self.turbo_gen is None:
            self.load()
        cond = self.conditionals or self._default_conditionals()
        sampler = turbo.TurboSampler(
            temperature=self.temperature, top_p=self.top_p, min_p=self.min_p,
            repetition_penalty=self.repetition_penalty)
        sentences = textutils.split_into_sentences(text)
        granularity = granularity or self.default_streaming_granularity
        if granularity == StreamingGranularity.TOKEN:
            yield from self._stream_tokens(sentences, cond, sampler,
                                           max_new_tokens)
            return
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            ids = self.tokenizer.encode(punc_norm(sentence))
            ids = [min(i, self.turbo_cfg.text_tokens_dict_size - 1)
                   for i in ids]
            speech = self.turbo_gen.generate(cond.speaker_emb, ids,
                                             sampler=sampler,
                                             max_new=max_new_tokens, seed=si)
            audio = self._token2wav(np.asarray(speech, np.int32), cond, si)
            yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                             text=sentence, is_final=si == len(sentences) - 1)

    def _stream_tokens(self, sentences: list[str],
                       cond: ChatterboxConditionals,
                       sampler: "turbo.TurboSampler",
                       max_new_tokens: int) -> Iterator[AudioChunk]:
        from tpu_audio.models.chatterbox_turbo.streaming import (
            TurboSynthesizer, drop_silence)

        if self._t3_streamer is None:
            self._t3_streamer = turbo.T3TurboStreamer(
                self.turbo_gen,
                first_extra=self.s3gen_cfg.pre_lookahead_len)
        if self._turbo_synth is None:
            self._turbo_synth = TurboSynthesizer(
                self.s3gen_params, self.s3gen_cfg,
                n_timesteps=self.meanflow_steps)
        prompt_tokens = [int(t) for t in np.asarray(cond.prompt_tokens[0])]
        pending: AudioChunk | None = None
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            ids = self.tokenizer.encode(punc_norm(sentence))
            ids = [min(i, self.turbo_cfg.text_tokens_dict_size - 1)
                   for i in ids]
            token_stream = drop_silence(self._t3_streamer.stream(
                cond.speaker_emb, ids, sampler=sampler,
                max_new=max_new_tokens, seed=si))
            first = True
            for audio in self._turbo_synth.stream(
                    token_stream, prompt_tokens, cond.prompt_mel,
                    cond.embedding, seed=si,
                    chunk_size=self._t3_streamer.chunk):
                self._check_stopped()
                if first:  # 20 ms anti-prompt-bleed fade (S3Gen.swift:259)
                    audio = np.asarray(s3gen.fade_in(jnp.asarray(audio)),
                                       np.float32)
                    first = False
                if pending is not None:
                    yield pending
                pending = AudioChunk(samples=audio,
                                     sample_rate=self.sample_rate,
                                     text=sentence, is_final=False)
        if pending is not None:
            yield AudioChunk(samples=pending.samples,
                             sample_rate=pending.sample_rate,
                             text=pending.text, is_final=True)
        else:
            yield AudioChunk(samples=np.zeros(0, np.float32),
                             sample_rate=self.sample_rate, text="",
                             is_final=True)
