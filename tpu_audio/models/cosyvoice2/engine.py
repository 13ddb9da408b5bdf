"""CosyVoice2 engine: zero-shot cloning / cross-lingual / instruct / voice
conversion over Qwen2-LM + flow matching + HiFT.

Reference: package/TTS/CosyVoice2/CosyVoice2Engine.swift:103-281 +
CosyVoice2TTS.swift:370-787 — prepare_conditionals builds a reusable
CosyVoice2Speaker (prompt text/tokens, S3 speech tokens, prompt mel,
CAMPPlus x-vector); instruct mode appends <|endofprompt|>; the engine
lazily uses Whisper for auto-transcription and word-boundary reference
trimming. Repo: mlx-community/CosyVoice2-0.5B-4bit.
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
from tpu_audio.models.cosyvoice2 import lm as lm_mod
from tpu_audio.ops import frontends
from tpu_audio.ops.resample import resample
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer

SR_OUT = 24000
SR_TOK = 16000
ENDOFPROMPT = "<|endofprompt|>"


@dataclass
class CosyVoice2Speaker:
    """Cached prepared speaker (CosyVoice2Engine.swift:30-70)."""

    prompt_text: str
    prompt_text_ids: list[int]
    speech_tokens: list[int]
    prompt_mel: jax.Array  # (1, 2P, 80)
    embedding: jax.Array  # (1, 192)


class CosyVoice2Engine(TTSEngineBase):
    sample_rate = SR_OUT
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,
                                         StreamingGranularity.TOKEN)
    # token granularity is the default serving path: first audio after
    # ~25 speech tokens (1 s of audio) instead of the whole first sentence
    default_streaming_granularity = StreamingGranularity.TOKEN

    def __init__(self, speed: float = 1.0, quantization: str = "w8a8",
                 mesh=None, speculative: str | None = None, gamma: int = 4):
        """quantization: "w8a8" (default) requantizes the 4-bit checkpoint
        LM to the per-channel int8 serving format at load; "w4a8" repacks
        losslessly for the int4→int8 MXU kernel; "q4" keeps the
        checkpoint's group-affine layout (fused dequant kernel).

        mesh: optional jax.sharding.Mesh with ("dp", "tp") axes — shards
        the WHOLE engine (LM via megatron GSPMD rules, flow conformer +
        CFM estimator via flow_rules; vocoder/campplus replicated).
        Requires quantization in ("bf16", "fp16", "none"): the quantized
        Pallas kernels are single-chip (see CausalLMGenerator's shard_map
        path for quantized LLM TP)."""
        super().__init__()
        if mesh is not None and quantization not in ("bf16", "fp16", "none"):
            raise ValueError(
                "mesh serving requires an fp LM (quantization='bf16'); the "
                "int8/int4 Pallas kernels are single-chip")
        self.mesh = mesh
        self.speed = speed
        self.quantization = quantization
        # speculative="ngram": prompt-lookup self-drafting in the LM stage
        # (exact — every token keeps the RAS sampler's distribution;
        # ops/speculative.py). CosyVoice2 prompts embed the speaker's
        # speech-token stream, so the draft history starts warm.
        self.speculative = speculative
        self.gamma = gamma
        self.lm: lm_mod.CosyLMGenerator | None = None
        self.lm_cfg = lm_mod.CosyLMConfig()
        self.s3gen_params = None
        self.s3gen_cfg = s3gen.S3GenConfig()
        self.tok_params = None
        self.tok_cfg = s3tokenizer.S3TokenizerConfig()
        self.tokenizer = None
        self.speaker: CosyVoice2Speaker | None = None
        self._whisper = None
        self._wav_fns = {}
        self._streamer = None  # CosyLMStreamer (token granularity)
        self._synth = None  # streaming.CV2Synthesizer

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.cosyvoice2 import load as cvload

        (lm_params, self.lm_cfg, self.s3gen_params, self.s3gen_cfg,
         self.tok_params, self.tok_cfg, self.tokenizer) = cvload.load()
        if self.quantization == "w8a8":
            from tpu_audio.ops import quant

            lm_params = quant.requantize_tree_int8(lm_params)
        elif self.quantization == "w4a8":
            from tpu_audio.ops import quant

            lm_params = quant.repack_tree_w4a8(lm_params)
        self.lm = lm_mod.CosyLMGenerator(lm_params, self.lm_cfg,
                                         mesh=self.mesh)
        if self.mesh is not None:
            from tpu_audio.parallel import flow_rules, shard_tree

            self.s3gen_params = shard_tree(self.s3gen_params, self.mesh,
                                           flow_rules)
        self.is_loaded = True

    @classmethod
    def from_params(cls, lm_params, lm_cfg, s3gen_params, s3gen_cfg,
                    tok_params, tok_cfg, tokenizer=None,
                    max_cache: int = 512, mesh=None) -> "CosyVoice2Engine":
        eng = cls(quantization="none" if mesh is not None else "w8a8",
                  mesh=mesh)
        eng.lm_cfg = lm_cfg
        eng.lm = lm_mod.CosyLMGenerator(lm_params, lm_cfg, max_cache=max_cache,
                                        mesh=mesh)
        if mesh is not None:
            from tpu_audio.parallel import flow_rules, shard_tree

            s3gen_params = shard_tree(s3gen_params, mesh, flow_rules)
        eng.s3gen_params, eng.s3gen_cfg = s3gen_params, s3gen_cfg
        eng.tok_params, eng.tok_cfg = tok_params, tok_cfg
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng.is_loaded = True
        return eng

    # ---------------------------------------------------------------- speaker

    def _auto_transcribe(self, audio16: np.ndarray) -> str:
        """Lazily loads Whisper (CosyVoice2Engine.autoTranscribe :154)."""
        if self._whisper is None:
            from tpu_audio.api.stt import STT

            self._whisper = STT.whisper("tiny")
        return self._whisper.transcribe(audio16).text.strip()

    def prepare_conditionals(self, ref_audio: np.ndarray, sample_rate: int,
                             ref_text: str | None = None) -> CosyVoice2Speaker:
        ref16 = (resample(ref_audio, sample_rate, SR_TOK)
                 if sample_rate != SR_TOK else ref_audio.astype(np.float32))
        if len(ref16) < 640:
            raise ValueError(
                f"reference audio too short ({len(ref16)} samples at 16 kHz);"
                " need at least one tokenizer frame (~40 ms)")
        ref24 = (resample(ref_audio, sample_rate, SR_OUT)
                 if sample_rate != SR_OUT else ref_audio.astype(np.float32))
        if ref_text is None:
            ref_text = self._auto_transcribe(ref16)

        mel = frontends.s3_log_mel(jnp.asarray(ref16)).T[None]
        codes, lens = s3tokenizer.quantize(self.tok_params, self.tok_cfg, mel,
                                           jnp.asarray([mel.shape[1]]))
        speech_tokens = [int(t) for t in np.asarray(codes[0][: int(lens[0])])]

        prompt_mel = frontends.s3gen_mel(jnp.asarray(ref24),
                                 n_mels=self.s3gen_cfg.mel_dim).T[None]
        want = 2 * len(speech_tokens)
        pm = prompt_mel[:, :want]
        if pm.shape[1] < want:
            pm = jnp.pad(pm, ((0, 0), (0, want - pm.shape[1]), (0, 0)))

        fbank = frontends.kaldi_fbank(jnp.asarray(ref16))
        fbank = fbank - jnp.mean(fbank, axis=0, keepdims=True)
        emb = s3gen.embed_ref_mel(self.s3gen_params, self.s3gen_cfg,
                                  fbank[None])
        spk = CosyVoice2Speaker(
            prompt_text=ref_text,
            prompt_text_ids=self.tokenizer.encode(ref_text),
            speech_tokens=speech_tokens, prompt_mel=pm, embedding=emb)
        self.speaker = spk
        return spk

    def _default_speaker(self) -> CosyVoice2Speaker:
        return CosyVoice2Speaker(
            prompt_text="", prompt_text_ids=[], speech_tokens=[0, 1, 2, 3],
            prompt_mel=jnp.zeros((1, 8, self.s3gen_cfg.mel_dim)),
            embedding=jnp.zeros((1, self.s3gen_cfg.spk_dim)))

    # ---------------------------------------------------------------- modes

    def _token2wav(self, tokens: list[int], spk: CosyVoice2Speaker,
                   seed: int) -> np.ndarray:
        n = len(tokens)
        if n == 0:
            return np.zeros(0, np.float32)
        bucket = -(-n // 25) * 25
        p_len = len(spk.speech_tokens)
        key_ = (bucket, p_len)
        if key_ not in self._wav_fns:
            cfg = self.s3gen_cfg

            @jax.jit
            def fn(params, toks, tl, pt, pl, pm, pml, emb, key):
                return s3gen.token2wav(params, cfg, toks, tl, pt, pl, pm,
                                       pml, emb, key)

            self._wav_fns[key_] = fn
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = tokens
        pt = jnp.asarray(np.asarray(spk.speech_tokens, np.int32)[None])
        audio, start, valid = self._wav_fns[key_](
            self.s3gen_params, jnp.asarray(toks), jnp.asarray([n]), pt,
            jnp.asarray([p_len]), spk.prompt_mel,
            jnp.asarray([spk.prompt_mel.shape[1]]), spk.embedding,
            jax.random.PRNGKey(seed))
        out = np.asarray(audio[0, int(start): int(start) + int(valid)],
                         np.float32)
        return np.asarray(s3gen.fade_in(jnp.asarray(out)), np.float32)

    def _mode_ids(self, sentence: str, spk: CosyVoice2Speaker, mode: str,
                  instruct_text: str | None):
        """(prompt_text_ids, text_ids, prompt_speech) for an LM call
        (CosyVoice2TTS.swift:370-520 mode prompts)."""
        if mode == "zero_shot":
            prompt_ids = spk.prompt_text_ids
        elif mode == "cross_lingual":
            prompt_ids = []
        elif mode == "instruct":
            prompt_ids = self.tokenizer.encode(
                (instruct_text or "") + ENDOFPROMPT)
        else:
            raise ValueError(f"unknown mode {mode}")
        return prompt_ids, self.tokenizer.encode(sentence), spk.speech_tokens

    def _generate_sentence(self, sentence: str, spk: CosyVoice2Speaker,
                           mode: str, instruct_text: str | None,
                           seed: int) -> np.ndarray:
        prompt_ids, text_ids, prompt_speech = self._mode_ids(
            sentence, spk, mode, instruct_text)
        tokens = self.lm.generate(text_ids, prompt_ids, prompt_speech,
                                  seed=seed, speculative=self.speculative,
                                  gamma=self.gamma)
        return self._token2wav(tokens, spk, seed)

    def voice_conversion(self, source_audio: np.ndarray, sample_rate: int,
                         speaker: CosyVoice2Speaker | None = None
                         ) -> np.ndarray:
        """synthesizeVC: source speech tokens rendered with the target
        speaker's flow conditioning (CosyVoice2TTS.swift:630-701)."""
        spk = speaker or self.speaker or self._default_speaker()
        src16 = (resample(source_audio, sample_rate, SR_TOK)
                 if sample_rate != SR_TOK else source_audio.astype(np.float32))
        if len(src16) < 640:  # shorter than one tokenizer frame
            return np.zeros(0, np.float32)
        mel = frontends.s3_log_mel(jnp.asarray(src16)).T[None]
        codes, lens = s3tokenizer.quantize(self.tok_params, self.tok_cfg, mel,
                                           jnp.asarray([mel.shape[1]]))
        tokens = [int(t) for t in np.asarray(codes[0][: int(lens[0])])]
        return self._token2wav(tokens, spk, 0)

    # ---------------------------------------------------------------- synthesis

    def generate(self, text: str, **kw):
        # one-shot collection runs the sentence path: single finalize-style
        # flow pass per sentence (reference non-streaming synthesis) and
        # the speculative LM option applies
        kw.setdefault("granularity", StreamingGranularity.SENTENCE)
        return super().generate(text, **kw)

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           mode: str = "zero_shot",
                           instruct_text: str | None = None,
                           **kw) -> Iterator[AudioChunk]:
        if self.lm is None:
            self.load()
        spk = self.speaker or self._default_speaker()
        granularity = granularity or self.default_streaming_granularity
        sentences = textutils.split_into_sentences(text)
        if granularity == StreamingGranularity.TOKEN:
            yield from self._stream_tokens(sentences, spk, mode,
                                           instruct_text)
            return
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            audio = self._generate_sentence(sentence, spk, mode,
                                            instruct_text, si)
            yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                             text=sentence, is_final=si == len(sentences) - 1)

    def _stream_tokens(self, sentences: list[str], spk: CosyVoice2Speaker,
                       mode: str, instruct_text: str | None
                       ) -> Iterator[AudioChunk]:
        """Token-granularity streaming: LM chunks → incremental flow +
        O(1) vocoder (models/cosyvoice2/streaming.py). First audio after
        ~chunk_size tokens instead of the whole first sentence. With
        speculative="ngram" the chunks decode through the resumable
        draft/verify loop (CosyLMStreamer._stream_spec) — the latency
        levers compose on this default serving path."""
        from tpu_audio.models.cosyvoice2.streaming import CV2Synthesizer

        if self._streamer is None:
            self._streamer = lm_mod.CosyLMStreamer(
                self.lm, first_extra=self.s3gen_cfg.pre_lookahead_len)
        if self._synth is None:
            self._synth = CV2Synthesizer(self.s3gen_params, self.s3gen_cfg)
        pending: AudioChunk | None = None
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            prompt_ids, text_ids, prompt_speech = self._mode_ids(
                sentence, spk, mode, instruct_text)
            token_stream = self._streamer.stream(
                text_ids, prompt_ids, prompt_speech, seed=si,
                speculative=self.speculative, gamma=self.gamma)
            first = True
            for audio in self._synth.stream(
                    token_stream, spk.speech_tokens, spk.prompt_mel,
                    spk.embedding, seed=si,
                    chunk_size=self._streamer.chunk):
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
