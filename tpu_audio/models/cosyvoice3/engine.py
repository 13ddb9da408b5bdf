"""CosyVoice3 engine: token-granularity streaming TTS (lowest-latency path).

Reference: package/TTS/CosyVoice3/CosyVoice3Engine.swift:86-831 — default
granularity .token (≈0.5–1 s to first audio), modes mirror CosyVoice2
(zero-shot / cross-lingual / instruct / voice conversion) with the
S3TokenizerV3 front-end and the DiT flow + causal HiFT pipeline.
Repo: mlx-community/Fun-CosyVoice3-0.5B-2512-4bit.
"""

from __future__ import annotations

from typing import Iterator

import jax.numpy as jnp
import numpy as np

from tpu_audio.api.tts import AudioChunk, StreamingGranularity, TTSEngineBase
from tpu_audio.codecs import s3tokenizer
from tpu_audio.models.cosyvoice2 import lm as lm_mod
from tpu_audio.models.cosyvoice2.engine import CosyVoice2Speaker
from tpu_audio.models.cosyvoice3 import model as cv3
from tpu_audio.ops import frontends
from tpu_audio.ops.resample import resample
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer

SR_OUT = 24000
SR_TOK = 16000


class CosyVoice3Engine(TTSEngineBase):
    sample_rate = SR_OUT
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,
                                         StreamingGranularity.TOKEN)
    default_streaming_granularity = StreamingGranularity.TOKEN

    def __init__(self):
        super().__init__()
        self.lm: lm_mod.CosyLMGenerator | None = None
        self.lm_cfg = lm_mod.CosyLMConfig()
        self.streamer: lm_mod.CosyLMStreamer | None = None
        self.flow_params = None
        self.flow_cfg = cv3.CV3FlowConfig()
        self.synth: cv3.CV3Synthesizer | None = None
        self.tok_params = None
        self.tok_cfg = s3tokenizer.S3TokenizerConfig()
        self.tokenizer = None
        self.speaker: CosyVoice2Speaker | None = None
        self._whisper = None

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.cosyvoice3 import load as cvload

        (lm_params, self.lm_cfg, self.flow_params, self.flow_cfg,
         self.tok_params, self.tok_cfg, self.tokenizer) = cvload.load()
        self.lm = lm_mod.CosyLMGenerator(lm_params, self.lm_cfg)
        self.streamer = lm_mod.CosyLMStreamer(self.lm,
                                              first_extra=cv3.PRE_LOOKAHEAD)
        self.synth = cv3.CV3Synthesizer(self.flow_params, self.flow_cfg)
        self.is_loaded = True

    @classmethod
    def from_params(cls, lm_params, lm_cfg, flow_params, flow_cfg,
                    tok_params, tok_cfg, tokenizer=None,
                    max_cache: int = 512, chunk: int = 8,
                    mesh=None) -> "CosyVoice3Engine":
        """mesh: optional (dp, tp) Mesh — shards the Qwen2 LM with
        megatron GSPMD rules and the DiT/flow graph with
        parallel.flow_rules (to_q/to_k/to_v/ff patterns); the causal HiFT
        vocoder stays replicated (dispatch-bound)."""
        eng = cls()
        if mesh is not None:
            from tpu_audio.parallel import flow_rules, shard_tree

            flow_params = shard_tree(flow_params, mesh, flow_rules)
        eng.lm_cfg = lm_cfg
        eng.lm = lm_mod.CosyLMGenerator(lm_params, lm_cfg,
                                        max_cache=max_cache, mesh=mesh)
        eng.streamer = lm_mod.CosyLMStreamer(eng.lm, chunk=chunk,
                                             first_extra=cv3.PRE_LOOKAHEAD)
        eng.flow_params, eng.flow_cfg = flow_params, flow_cfg
        eng.synth = cv3.CV3Synthesizer(flow_params, flow_cfg)
        eng.tok_params, eng.tok_cfg = tok_params, tok_cfg
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng.is_loaded = True
        return eng

    # ---------------------------------------------------------------- speaker

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
            if self._whisper is None:
                from tpu_audio.api.stt import STT

                self._whisper = STT.whisper("tiny")
            ref_text = self._whisper.transcribe(ref16).text.strip()
        mel = frontends.s3_log_mel(jnp.asarray(ref16)).T[None]
        codes, lens = s3tokenizer.quantize(self.tok_params, self.tok_cfg, mel,
                                           jnp.asarray([mel.shape[1]]))
        speech_tokens = [int(t) for t in np.asarray(codes[0][: int(lens[0])])]
        prompt_mel = frontends.s3gen_mel(
            jnp.asarray(ref24), n_mels=self.flow_cfg.mel_dim).T[None]
        want = self.flow_cfg.token_mel_ratio * len(speech_tokens)
        pm = prompt_mel[:, :want]
        if pm.shape[1] < want:
            pm = jnp.pad(pm, ((0, 0), (0, want - pm.shape[1]), (0, 0)))
        emb = jnp.zeros((1, self.flow_cfg.spk_dim))
        spk = CosyVoice2Speaker(
            prompt_text=ref_text,
            prompt_text_ids=self.tokenizer.encode(ref_text),
            speech_tokens=speech_tokens, prompt_mel=pm, embedding=emb)
        self.speaker = spk
        return spk

    def _default_speaker(self) -> CosyVoice2Speaker:
        return CosyVoice2Speaker(
            prompt_text="", prompt_text_ids=[], speech_tokens=[0, 1],
            prompt_mel=jnp.zeros((1, 4, self.flow_cfg.mel_dim)),
            embedding=jnp.zeros((1, self.flow_cfg.spk_dim)))

    # ---------------------------------------------------------------- VC

    def voice_conversion(self, source_audio: np.ndarray, sample_rate: int,
                         speaker: CosyVoice2Speaker | None = None
                         ) -> np.ndarray:
        """synthesizeVC (CosyVoice3Model.swift:415-445): no LLM — the
        source audio's S3TokenizerV3 tokens are rendered directly through
        the DiT flow with the target speaker's prompt tokens/mel/embedding
        and the causal HiFT vocoder (single finalize pass)."""
        if self.synth is None:
            self.load()
        spk = speaker or self.speaker or self._default_speaker()
        src16 = (resample(source_audio, sample_rate, SR_TOK)
                 if sample_rate != SR_TOK else source_audio.astype(np.float32))
        if len(src16) < 640:  # shorter than one tokenizer frame
            return np.zeros(0, np.float32)
        mel = frontends.s3_log_mel(jnp.asarray(src16)).T[None]
        codes, lens = s3tokenizer.quantize(self.tok_params, self.tok_cfg, mel,
                                           jnp.asarray([mel.shape[1]]))
        tokens = [int(t) for t in np.asarray(codes[0][: int(lens[0])])]
        if not tokens:
            return np.zeros(0, np.float32)
        # one exhausted chunk + chunk_size >= len(tokens) → the synthesizer
        # runs a single non-streaming flow pass (reference finalize=true)
        parts = list(self.synth.stream(
            iter([tokens]), spk.speech_tokens, np.asarray(spk.prompt_mel[0]),
            spk.embedding, seed=0, chunk_size=len(tokens)))
        return (np.concatenate(parts) if parts else np.zeros(0, np.float32))

    # ---------------------------------------------------------------- synthesis

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           mode: str = "zero_shot",
                           instruct_text: str | None = None,
                           **kw) -> Iterator[AudioChunk]:
        if self.lm is None:
            self.load()
        granularity = granularity or self.default_streaming_granularity
        spk = self.speaker or self._default_speaker()
        sentences = textutils.split_into_sentences(text)
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            text_ids = self.tokenizer.encode(sentence)
            prompt_ids = (spk.prompt_text_ids if mode == "zero_shot" else [])
            if mode == "instruct" and instruct_text:
                prompt_ids = self.tokenizer.encode(
                    instruct_text + "<|endofprompt|>")
            token_stream = self.streamer.stream(
                text_ids, prompt_ids, spk.speech_tokens, seed=si)
            final = si == len(sentences) - 1
            if granularity == StreamingGranularity.TOKEN:
                for audio in self.synth.stream(
                        token_stream, spk.speech_tokens,
                        np.asarray(spk.prompt_mel[0]), spk.embedding,
                        seed=si, chunk_size=self.streamer.chunk):
                    yield AudioChunk(samples=audio,
                                     sample_rate=self.sample_rate,
                                     text=sentence, is_final=False)
                if final:
                    yield AudioChunk(samples=np.zeros(0, np.float32),
                                     sample_rate=self.sample_rate,
                                     text=sentence, is_final=True)
            else:
                parts = list(self.synth.stream(
                    token_stream, spk.speech_tokens,
                    np.asarray(spk.prompt_mel[0]), spk.embedding,
                    seed=si, chunk_size=self.streamer.chunk))
                audio = (np.concatenate(parts) if parts
                         else np.zeros(0, np.float32))
                yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                                 text=sentence, is_final=final)
