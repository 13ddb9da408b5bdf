"""Public STT API: engine contracts and factories.

Mirrors the reference protocol + factory surface
(package/Protocols/STTEngine.swift:10-116): `STT.whisper(model=...,
quantization=...)` / `STT.fun_asr(...)` return engines with
load/transcribe/translate/detect_language/stop/unload/cleanup and
is_transcribing / transcription_time state.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from tpu_audio.api.results import TranscriptionResult
from tpu_audio.utils.logging import get_logger

_log = get_logger("stt")


class STTEngineBase:
    """Lifecycle + state shared by all STT engines."""

    sample_rate: int = 16000

    def __init__(self):
        self.is_loaded = False
        self.is_transcribing = False
        self.transcription_time: float = 0.0
        self._stop_flag = threading.Event()

    def load(self, progress_handler=None) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        self._stop_flag.set()

    def unload(self) -> None:
        """Release model weights; cached conditioning survives for fast
        reload (reference: Protocols/TTSEngine.swift:68-73 semantics)."""
        self.is_loaded = False

    def cleanup(self) -> None:
        self.unload()

    def warmup(self, full: bool = False) -> dict[str, float]:
        """Compile the decode executables before the first real request by
        transcribing silence (2 s; full=True adds a whole 30 s window).
        Returns {variant: seconds} — see TTSEngineBase.warmup for the
        compile-cache rationale."""
        variants = {"short": 2.0}
        if full:
            variants["window"] = 30.0
        timings: dict[str, float] = {}
        for name, secs in variants.items():
            t0 = time.perf_counter()
            self.transcribe(np.zeros(int(secs * self.sample_rate),
                                     np.float32))
            timings[name] = time.perf_counter() - t0
        _log.info("warmup(%s): %s", type(self).__name__,
                  {k: f"{v:.2f}s" for k, v in timings.items()})
        return timings

    def _resolve_audio(self, audio) -> np.ndarray:
        """Accept a file path or a float array at self.sample_rate."""
        if isinstance(audio, str):
            from tpu_audio.utils.audio_io import load_audio

            samples, _ = load_audio(audio, target_rate=self.sample_rate)
            return samples
        return np.asarray(audio, np.float32)


class WhisperEngine(STTEngineBase):
    """Whisper STT engine (reference: package/STT/Whisper/WhisperEngine.swift)."""

    def __init__(self, model: str = "tiny", quantization: str = "fp16",
                 repo: str | None = None):
        super().__init__()
        self.model_name = model
        self.quantization = quantization
        self.repo = repo
        self.pipeline = None

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper.pipeline import WhisperPipeline

        params, cfg, tok = wload.load(self.model_name, self.quantization,
                                      repo=self.repo)
        # the w8a8 serving format also stores cross-K/V int8 per window —
        # the decode loop reads half the bytes through the fused
        # cross_kv_attention kernel (same quantization class as the
        # checkpoint's own q8 weights)
        self.pipeline = WhisperPipeline(params, cfg, tok,
                                        kv_int8=self.quantization == "w8a8")
        self.is_loaded = True

    @classmethod
    def from_pipeline(cls, pipeline) -> "WhisperEngine":
        """Build an engine around an existing pipeline (tests, random init)."""
        eng = cls()
        eng.pipeline = pipeline
        eng.is_loaded = True
        return eng

    def transcribe(self, audio, *, language: str | None = None,
                   temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                   timestamps: bool = True, word_timestamps: bool = False,
                   **kw) -> TranscriptionResult:
        return self._run(audio, task="transcribe", language=language,
                         temperature=temperature, timestamps=timestamps,
                         word_timestamps=word_timestamps, **kw)

    def translate(self, audio, *, language: str | None = None,
                  **kw) -> TranscriptionResult:
        return self._run(audio, task="translate", language=language, **kw)

    def detect_language(self, audio) -> tuple[str, dict]:
        self._ensure_loaded()
        return self.pipeline.detect_language(self._resolve_audio(audio))

    def transcribe_batch(self, audios, *, batch_size: int = 8,
                         language: str = "en", **kw) -> list[str]:
        """Throughput-mode transcription of many clips at once.

        Splits every clip into 30 s windows and decodes `batch_size`
        windows per compiled step (weights stream from HBM once for the
        whole batch — the measured batch-8 path is ~2.2× the aggregate
        throughput of single-stream decode, see bench.py). Trades the seek
        loop's content-aware window advance and temperature fallback for
        fixed-stride windows, so prefer `transcribe` for single clips
        where quality dominates. Returns one text per input clip."""
        self._ensure_loaded()
        from tpu_audio.models.whisper import batch as wbatch

        samples = [self._resolve_audio(a) for a in audios]
        self.is_transcribing = True
        t0 = time.perf_counter()
        try:
            return wbatch.transcribe_windows(
                self.pipeline.params, self.pipeline.cfg,
                self.pipeline.tok, samples,
                batch_size=batch_size, language=language, **kw)
        finally:
            self.is_transcribing = False
            self.transcription_time = time.perf_counter() - t0

    def _run(self, audio, **kw) -> TranscriptionResult:
        self._ensure_loaded()
        samples = self._resolve_audio(audio)
        self.is_transcribing = True
        t0 = time.perf_counter()
        try:
            result = self.pipeline.transcribe(samples, **kw)
        finally:
            self.is_transcribing = False
            self.transcription_time = time.perf_counter() - t0
        return result

    def _ensure_loaded(self):
        if self.pipeline is None:
            self.load()


class STT:
    """Factory namespace (reference: STTEngine.swift:74-116)."""

    @staticmethod
    def whisper(model: str = "tiny", quantization: str = "fp16",
                repo: str | None = None) -> WhisperEngine:
        return WhisperEngine(model, quantization, repo)

    @staticmethod
    def fun_asr(model_type: str = "nano", quantization: str = "q4"):
        from tpu_audio.api.stt_funasr import FunASREngine

        return FunASREngine(model_type, quantization)
