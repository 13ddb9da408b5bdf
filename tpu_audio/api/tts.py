"""Public TTS API: engine contract, streaming granularity, factories.

Mirrors the reference protocol surface (package/Protocols/TTSEngine.swift:
14-239): engines expose load/say/generate/generate_streaming/stop/unload/
cleanup with is_loaded/is_generating/is_playing/generation_time state,
per-engine streaming granularities (.sentence/.frame/.token), AudioChunk
and TTSGenerationResult value types, and the TTS factory namespace
(TTSEngine.swift:113-131 + Kokoro's extension).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from enum import Enum
from typing import Iterator

import numpy as np

from tpu_audio.api.results import AudioResult
from tpu_audio.utils.logging import get_logger, log_rtf

_log = get_logger("tts")


class StreamingGranularity(str, Enum):
    """How much audio each streamed chunk covers (TTSEngine.swift:137-185):
    sentence ≈1-3 s to first audio; token ≈0.5-1 s; frame = codec-frame
    sized chunks."""

    SENTENCE = "sentence"
    FRAME = "frame"
    TOKEN = "token"


@dataclass
class AudioChunk:
    samples: np.ndarray
    sample_rate: int
    text: str | None = None  # the text this chunk realizes (sentence mode)
    is_final: bool = False

    @property
    def duration(self) -> float:
        return len(self.samples) / self.sample_rate


@dataclass
class TTSGenerationResult:
    audio: AudioResult
    chunks: int = 1
    generation_time: float = 0.0

    @property
    def rtf(self) -> float:
        d = self.audio.duration
        return self.generation_time / d if d > 0 else float("inf")


class TTSEngineBase:
    """Lifecycle + streaming surface shared by all TTS engines.

    Thread-safety contract (the reference's Swift engines are actors —
    e.g. KokoroTTS.swift — so every call is serialized; Python has no
    actor isolation, so the equivalent guarantee is made explicit here):

      - generate / generate_streaming / say are SERIALIZED per engine by
        an internal lock: a second thread calling any of them blocks until
        the first generation finishes (matching actor mailbox semantics).
        The lock is taken for the whole life of the streaming generator.
      - stop() and the is_* state reads are lock-free and safe to call
        from any thread at any time (that is stop()'s whole purpose).
      - load()/unload() are NOT safe to call concurrently with an active
        generation; call them from the owning thread only.
    """

    sample_rate: int = 24000
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,)
    default_streaming_granularity = StreamingGranularity.SENTENCE

    def __init__(self):
        self.is_loaded = False
        self.is_generating = False
        self.is_playing = False
        self.generation_time = 0.0
        self.last_generated_audio_path: str | None = None
        self._stop_flag = threading.Event()
        self._gen_lock = threading.Lock()

    def __init_subclass__(cls, **kw):
        """Wrap each engine's generate_streaming in the serialization lock
        (held from first next() until the generator closes)."""
        super().__init_subclass__(**kw)
        if "generate_streaming" in cls.__dict__:
            import functools

            inner = cls.__dict__["generate_streaming"]

            @functools.wraps(inner)
            def locked(self, *a, **k):
                with self._gen_lock:
                    # stop() cancels the generation in flight; a NEW stream
                    # starts fresh (reference stop semantics — without this
                    # a stop() between streams poisoned every later call
                    # with GenerationStopped)
                    self._stop_flag.clear()
                    yield from inner(self, *a, **k)

            cls.generate_streaming = locked

    # ---------------------------------------------------------------- lifecycle

    def load(self, progress_handler=None) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        self._stop_flag.set()

    def unload(self) -> None:
        self.is_loaded = False

    def cleanup(self) -> None:
        self.unload()

    # ---------------------------------------------------------------- warmup

    #: texts warmup() synthesizes to populate the jit caches, shortest
    #: first; keys name the variant. Engines whose compiled shapes depend
    #: on more than text length (samplers, CFG, streaming chunks) extend
    #: this or override _warmup_variants.
    WARMUP_TEXTS = {"short": "Hi."}
    WARMUP_TEXTS_FULL = {
        "medium": "This is a medium length warm up sentence for the "
                  "compiler cache.",
        "long": "This considerably longer warm up paragraph exists to "
                "reach the larger prompt-length buckets that production "
                "requests will hit, so that the first real request of "
                "every size finds its executable already compiled and "
                "cached. " * 3,
    }

    def _warmup_variants(self, full: bool):
        texts = dict(self.WARMUP_TEXTS)
        if full:
            texts.update(self.WARMUP_TEXTS_FULL)
        return [(name, lambda t=t: self.generate(t))
                for name, t in texts.items()]

    def warmup(self, full: bool = False) -> dict[str, float]:
        """Compile (and populate the persistent XLA cache with) the
        executables this engine will serve, before the first real request.

        The reference pays compile cost implicitly on first use (MLX traces
        lazily); under XLA each (bucket × sampler) combination is a
        compiled executable, so a cold engine's first call can cost
        seconds-to-minutes. warmup() front-loads that: `full=False`
        compiles the default small bucket, `full=True` walks the
        production text-length buckets too. Returns {variant: seconds};
        run once per process — with the persistent compile cache
        (utils/runtime.py) the cost is once per *machine*.
        """
        timings: dict[str, float] = {}
        for name, call in self._warmup_variants(full):
            t0 = time.perf_counter()
            call()
            timings[name] = time.perf_counter() - t0
        _log.info("warmup(%s): %s", type(self).__name__,
                  {k: f"{v:.2f}s" for k, v in timings.items()})
        return timings

    # ---------------------------------------------------------------- synthesis

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           **kw) -> Iterator[AudioChunk]:
        """Engine-specific; yields AudioChunks as synthesis progresses."""
        raise NotImplementedError

    def generate(self, text: str, **kw) -> AudioResult:
        """Collect the stream into one AudioResult."""
        self._stop_flag.clear()
        self.is_generating = True
        t0 = time.perf_counter()
        try:
            parts = [c.samples for c in self.generate_streaming(text, **kw)]
        finally:
            self.is_generating = False
        self.generation_time = time.perf_counter() - t0
        samples = (np.concatenate(parts) if parts
                   else np.zeros(0, np.float32))
        result = AudioResult(samples=samples, sample_rate=self.sample_rate,
                             processing_time=self.generation_time)
        log_rtf(f"{type(self).__name__}.generate", self.generation_time,
                result.duration)
        return result

    def say(self, text: str, sink=None, **kw) -> TTSGenerationResult:
        """Generate and stream into a playback sink (default: the shared
        controller's ring-buffer sink)."""
        from tpu_audio.api.playback import PlaybackController

        controller = PlaybackController(self)
        return controller.play_stream(text, sink=sink, **kw)

    def save(self, text: str, path: str, **kw) -> str:
        result = self.generate(text, **kw)
        result.save(path)
        self.last_generated_audio_path = path
        return path

    def _check_stopped(self):
        if self._stop_flag.is_set():
            raise GenerationStopped()


class GenerationStopped(Exception):
    pass


class TTS:
    """Factory namespace (reference: TTSEngine.swift:113-131)."""

    @staticmethod
    def kokoro(voice: str = "af_heart"):
        from tpu_audio.models.kokoro.engine import KokoroEngine

        return KokoroEngine(voice=voice)

    @staticmethod
    def orpheus(voice: str = "tara", mesh=None):
        """mesh: optional Mesh with a "tp" axis for tensor-parallel serving
        of the 3B LM (see OrpheusEngine)."""
        from tpu_audio.models.orpheus.engine import OrpheusEngine

        return OrpheusEngine(voice=voice, mesh=mesh)

    @staticmethod
    def marvis(quality: str = "high"):
        from tpu_audio.models.marvis.engine import MarvisEngine

        return MarvisEngine(quality=quality)

    @staticmethod
    def oute():
        from tpu_audio.models.outetts.engine import OuteTTSEngine

        return OuteTTSEngine()

    @staticmethod
    def chatterbox():
        from tpu_audio.models.chatterbox.engine import ChatterboxEngine

        return ChatterboxEngine()

    @staticmethod
    def chatterbox_turbo():
        from tpu_audio.models.chatterbox_turbo.engine import ChatterboxTurboEngine

        return ChatterboxTurboEngine()

    @staticmethod
    def cosyvoice2():
        from tpu_audio.models.cosyvoice2.engine import CosyVoice2Engine

        return CosyVoice2Engine()

    @staticmethod
    def cosyvoice3():
        from tpu_audio.models.cosyvoice3.engine import CosyVoice3Engine

        return CosyVoice3Engine()
