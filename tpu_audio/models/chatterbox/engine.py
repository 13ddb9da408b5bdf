"""Chatterbox TTS engine: voice-cloning with emotion exaggeration.

Reference: package/TTS/Chatterbox/ChatterboxModel.swift:355-640 +
ChatterboxEngine.swift — prepareConditionals (24k/16k resamples, 6 s
encoder / 10 s decoder crops, S3 tokens, CAMPPlus x-vector dict,
VoiceEncoder speaker embedding, exaggeration scalar) then per sentence:
puncNorm → BPE → T3 CFG decode → drop invalid tokens → S3Gen token2wav
with 20 ms fade-in. Knobs: temperature/topP/minP/repPen/cfgWeight/
exaggeration (ChatterboxEngine.swift:75-93). Repos:
mlx-community/Chatterbox-TTS-{fp16,8bit,4bit} + mlx-community/S3TokenizerV2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.api.tts import AudioChunk, StreamingGranularity, TTSEngineBase
from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.chatterbox import t3 as t3mod
from tpu_audio.models.chatterbox import voice_encoder as ve
from tpu_audio.ops import frontends
from tpu_audio.ops.resample import resample
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer

S3_SR = 16000
S3GEN_SR = 24000
ENC_COND_SECONDS = 6
DEC_COND_SECONDS = 10


@dataclass
class ChatterboxConditionals:
    """First-class prepared-speaker value (ChatterboxModel.swift:108-119)."""

    speaker_emb: jax.Array  # (1, 256) VoiceEncoder
    t3_cond_tokens: jax.Array  # (1, P) S3 tokens for T3 conditioning
    prompt_tokens: jax.Array  # (1, P2) S3 tokens for S3Gen prompt
    prompt_mel: jax.Array  # (1, 2*P2, 80)
    embedding: jax.Array  # (1, 192) CAMPPlus
    exaggeration: float = 0.5


def punc_norm(text: str) -> str:
    """Punctuation normalization (ChatterboxModel.swift:534-566 behavior):
    capitalize, ensure terminal punctuation, squash repeats."""
    text = " ".join(text.split())
    if not text:
        return "You need to add some text for me to talk."
    if text[0].islower():
        text = text[0].upper() + text[1:]
    for a, b in (("...", ", "), ("…", ", "), (":", ","), (" - ", ", "),
                 (";", ", "), ("—", "-"), ("–", "-"), (" ,", ","),
                 ("“", '"'), ("”", '"'), ("‘", "'"), ("’", "'")):
        text = text.replace(a, b)
    if text[-1] not in ".!?-\"'":
        text = text + "."
    return text


class ChatterboxEngine(TTSEngineBase):
    sample_rate = S3GEN_SR
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,)

    def __init__(self, temperature: float = 0.8, top_p: float = 0.95,
                 min_p: float = 0.05, repetition_penalty: float = 1.2,
                 cfg_weight: float = 0.5, exaggeration: float = 0.5):
        super().__init__()
        self.temperature = temperature
        self.top_p = top_p
        self.min_p = min_p
        self.repetition_penalty = repetition_penalty
        self.cfg_weight = cfg_weight
        self.exaggeration = exaggeration

        self.t3_params = None
        self.t3_cfg = t3mod.T3Config()
        self.t3_gen: t3mod.T3Generator | None = None
        self.s3gen_params = None
        self.s3gen_cfg = s3gen.S3GenConfig()
        self.tok_params = None
        self.tok_cfg = s3tokenizer.S3TokenizerConfig()
        self.ve_params = None
        self.ve_cfg = ve.VoiceEncConfig()
        self.tokenizer = None
        self.conditionals: ChatterboxConditionals | None = None
        self._wav_fns = {}
        self._cond_fns = {}

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.chatterbox import load as cload

        (self.t3_params, self.t3_cfg, self.s3gen_params, self.s3gen_cfg,
         self.tok_params, self.tok_cfg, self.ve_params, self.ve_cfg,
         self.tokenizer) = cload.load()
        self.t3_gen = t3mod.T3Generator(self.t3_params, self.t3_cfg)
        self.is_loaded = True

    @classmethod
    def from_params(cls, t3_params, t3_cfg, s3gen_params, s3gen_cfg,
                    tok_params, tok_cfg, ve_params, ve_cfg,
                    tokenizer=None, max_cache: int = 512) -> "ChatterboxEngine":
        eng = cls()
        eng.t3_params, eng.t3_cfg = t3_params, t3_cfg
        eng.s3gen_params, eng.s3gen_cfg = s3gen_params, s3gen_cfg
        eng.tok_params, eng.tok_cfg = tok_params, tok_cfg
        eng.ve_params, eng.ve_cfg = ve_params, ve_cfg
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng.t3_gen = t3mod.T3Generator(t3_params, t3_cfg, max_cache=max_cache)
        eng.is_loaded = True
        return eng

    # ---------------------------------------------------------------- speaker

    def _cond_device_fn(self, lens: tuple[int, int, int, int]):
        """One jitted pipeline for ALL conditioning device work, cached per
        (dec16, enc16, dec24, ref16) length tuple.  The eager path dispatched
        hundreds of tiny ops per call (~4.4 s measured on v5e); fused it is
        one traced graph — compile once per ref-audio length, then ~ms."""
        if lens in self._cond_fns:
            return self._cond_fns[lens]
        tok_cfg = self.tok_cfg
        s3_cfg, ve_cfg = self.s3gen_cfg, self.ve_cfg

        @jax.jit
        def fn(tok_params, s3gen_params, ve_params, dec16, enc16, dec24,
               ref16):
            def s3_codes(audio16):
                mel = frontends.s3_log_mel(audio16).T[None]
                return s3tokenizer.quantize(tok_params, tok_cfg, mel,
                                            jnp.asarray([mel.shape[1]]))

            codes_d, lens_d = s3_codes(dec16)
            codes_e, lens_e = s3_codes(enc16)
            prompt_mel = frontends.s3gen_mel(dec24,
                                             n_mels=s3_cfg.mel_dim).T[None]
            fbank = frontends.kaldi_fbank(ref16)
            fbank = fbank - jnp.mean(fbank, axis=0, keepdims=True)
            embedding = s3gen.embed_ref_mel(s3gen_params, s3_cfg, fbank[None])

            # VoiceEncoder sliding partials (static starts — ref16 len fixed)
            mel = ve.melspec(ref16, ve_cfg)
            t = mel.shape[0]
            if t < ve_cfg.partial_frames:
                mel = jnp.pad(mel, ((0, ve_cfg.partial_frames - t), (0, 0)))
                t = ve_cfg.partial_frames
            starts = range(0, max(1, t - ve_cfg.partial_frames + 1),
                           ve_cfg.partial_hop)
            partials = jnp.stack([mel[s: s + ve_cfg.partial_frames]
                                  for s in starts])
            embs = ve.embed_partials(ve_params, ve_cfg, partials)
            spk = jnp.mean(embs, axis=0)
            spk = spk / jnp.maximum(jnp.linalg.norm(spk), 1e-8)
            return codes_d, lens_d, codes_e, lens_e, prompt_mel, embedding, \
                spk[None]

        self._cond_fns[lens] = fn
        return fn

    def prepare_conditionals(self, ref_audio: np.ndarray, sample_rate: int,
                             exaggeration: float | None = None
                             ) -> ChatterboxConditionals:
        """ChatterboxModel.prepareConditionals (:435-517)."""
        ref24 = (resample(ref_audio, sample_rate, S3GEN_SR)
                 if sample_rate != S3GEN_SR else ref_audio.astype(np.float32))
        ref16 = resample(ref_audio, sample_rate, S3_SR) \
            if sample_rate != S3_SR else ref_audio.astype(np.float32)

        dec_16 = ref16[: DEC_COND_SECONDS * S3_SR]
        enc_16 = ref16[: ENC_COND_SECONDS * S3_SR]
        dec_24 = ref24[: DEC_COND_SECONDS * S3GEN_SR]

        fn = self._cond_device_fn((len(dec_16), len(enc_16), len(dec_24),
                                   len(ref16)))
        (codes_d, lens_d, codes_e, lens_e, prompt_mel, embedding,
         spk) = fn(self.tok_params, self.s3gen_params, self.ve_params,
                   jnp.asarray(dec_16), jnp.asarray(enc_16),
                   jnp.asarray(dec_24), jnp.asarray(ref16))
        prompt_tokens = codes_d[:, : int(lens_d[0])]
        t3_cond_tokens = codes_e[:, : int(lens_e[0])]
        # align prompt mel frames to 2× prompt tokens
        want = 2 * prompt_tokens.shape[1]
        pm = prompt_mel[:, :want]
        if pm.shape[1] < want:
            pm = jnp.pad(pm, ((0, 0), (0, want - pm.shape[1]), (0, 0)))
        cond = ChatterboxConditionals(
            speaker_emb=spk, t3_cond_tokens=t3_cond_tokens,
            prompt_tokens=prompt_tokens, prompt_mel=pm, embedding=embedding,
            exaggeration=(self.exaggeration if exaggeration is None
                          else exaggeration))
        self.conditionals = cond
        return cond

    def _default_conditionals(self) -> ChatterboxConditionals:
        """Zero-reference fallback so the engine runs without a speaker."""
        d = self.s3gen_cfg.mel_dim
        return ChatterboxConditionals(
            speaker_emb=jnp.zeros((1, self.t3_cfg.speaker_embed_size)),
            t3_cond_tokens=jnp.zeros((1, 8), jnp.int32),
            prompt_tokens=jnp.zeros((1, 4), jnp.int32),
            prompt_mel=jnp.zeros((1, 8, d)),
            embedding=jnp.zeros((1, self.s3gen_cfg.spk_dim)))

    # ---------------------------------------------------------------- synthesis

    def _token2wav(self, speech_tokens: np.ndarray,
                   cond: ChatterboxConditionals, seed: int) -> np.ndarray:
        n = len(speech_tokens)
        if n == 0:
            return np.zeros(0, np.float32)
        bucket = -(-n // 25) * 25
        p_len = cond.prompt_tokens.shape[1]
        key_ = (bucket, p_len)
        if key_ not in self._wav_fns:
            cfgs = (self.s3gen_cfg,)

            @jax.jit
            def fn(params, tokens, token_len, pt, pl, pm, pml, emb, key):
                return s3gen.token2wav(params, cfgs[0], tokens, token_len,
                                       pt, pl, pm, pml, emb, key)

            self._wav_fns[key_] = fn
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = speech_tokens
        audio, start, valid = self._wav_fns[key_](
            self.s3gen_params, jnp.asarray(toks), jnp.asarray([n]),
            cond.prompt_tokens, jnp.asarray([p_len]), cond.prompt_mel,
            jnp.asarray([cond.prompt_mel.shape[1]]), cond.embedding,
            jax.random.PRNGKey(seed))
        start, valid = int(start), int(valid)
        out = np.asarray(audio[0, start: start + valid], np.float32)
        return np.asarray(s3gen.fade_in(jnp.asarray(out)), np.float32)

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           max_new_tokens: int = 600,
                           **kw) -> Iterator[AudioChunk]:
        if self.t3_gen is None:
            self.load()
        cond = self.conditionals or self._default_conditionals()
        cond_emb = t3mod.prepare_conditioning(
            self.t3_params, self.t3_cfg, cond.speaker_emb,
            cond.t3_cond_tokens, cond.exaggeration)
        sampler = t3mod.T3SamplerConfig(
            temperature=self.temperature, top_p=self.top_p, min_p=self.min_p,
            repetition_penalty=self.repetition_penalty,
            cfg_weight=self.cfg_weight)

        sentences = textutils.split_into_sentences(text)
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            norm = punc_norm(sentence)
            ids = ([self.t3_cfg.start_text_token]
                   + self.tokenizer.encode(norm)
                   + [self.t3_cfg.stop_text_token])
            ids = [min(i, self.t3_cfg.text_tokens_dict_size - 1) for i in ids]
            speech = self.t3_gen.generate(cond_emb, ids, sampler=sampler,
                                          max_new=max_new_tokens, seed=si)
            audio = self._token2wav(np.asarray(speech, np.int32), cond, si)
            yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                             text=sentence, is_final=si == len(sentences) - 1)
