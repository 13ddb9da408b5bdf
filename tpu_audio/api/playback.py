"""Playback controller: generation-task lifecycle + streaming sinks.

TPU-native analogue of the reference's TTSPlaybackController
(package/Protocols/TTSPlaybackController.swift:28-228 —
createGenerationStream/playStream/collectStream + cancellation) and
AudioSamplePlayer (package/Audio/AudioSamplePlayer.swift:10-284 —
30 ms slice enqueue with prebuffer, volume boost 1.25, clip at 0.98).

There is no AVAudioEngine on a TPU host; playback is a sink abstraction:
the ring-buffer sink (native SPSC buffer) stands in for the audio-device
queue, and a file sink writes WAV progressively.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from tpu_audio.api.tts import AudioChunk, GenerationStopped, TTSGenerationResult
from tpu_audio.api.results import AudioResult
from tpu_audio.utils import constants
from tpu_audio.utils.logging import get_logger

_log = get_logger("audio")


class RingBufferSink:
    """Streams 30 ms slices into the native SPSC ring buffer with volume
    boost + clipping, like AudioSamplePlayer.enqueue."""

    def __init__(self, sample_rate: int, capacity_seconds: float = 30.0):
        from tpu_audio.native import RingBuffer

        self.sample_rate = sample_rate
        self.slice_size = int(sample_rate * 0.030)
        self.ring = RingBuffer(int(sample_rate * capacity_seconds))
        self.total_written = 0

    def write(self, chunk: AudioChunk) -> None:
        samples = np.clip(chunk.samples * constants.VOLUME_BOOST_FACTOR,
                          -constants.MAX_SAMPLE_VALUE,
                          constants.MAX_SAMPLE_VALUE).astype(np.float32)
        for i in range(0, len(samples), self.slice_size):
            piece = samples[i: i + self.slice_size]
            written = 0
            while written < len(piece):
                written += self.ring.write(piece[written:])
                if written < len(piece):
                    time.sleep(0.005)  # backpressure: consumer drains
        self.total_written += len(samples)

    def read(self, n: int) -> np.ndarray:
        return self.ring.read(n)

    def close(self) -> None:
        pass


class FileSink:
    """Streams chunks straight to disk (progressive WAV — header patched on
    close, so long streams never buffer in memory; reference
    Audio/AudioFileWriter.swift)."""

    def __init__(self, path: str, sample_rate: int, dtype: str = "int16"):
        from tpu_audio.utils.audio_io import StreamingWavWriter

        self.path = path
        self.sample_rate = sample_rate
        self._writer = StreamingWavWriter(path, sample_rate, dtype=dtype)

    def write(self, chunk: AudioChunk) -> None:
        self._writer.write(np.asarray(chunk.samples, np.float32))

    def close(self) -> str:
        return self._writer.close()


class NullSink:
    def write(self, chunk: AudioChunk) -> None:
        pass

    def close(self) -> None:
        pass


class PlayerSink:
    """Streams chunks into an AudioSamplePlayer (device or headless clock)
    with prebuffer on start and drain on close — the reference's
    playStream → AudioSamplePlayer.enqueue path
    (TTSPlaybackController.swift:118-150)."""

    def __init__(self, sample_rate: int, player=None,
                 prebuffer_seconds: float = 0.25, backend: str | None = None,
                 time_scale: float = 1.0):
        from tpu_audio.api.player import AudioSamplePlayer

        self._own = player is None
        self.player = player or AudioSamplePlayer(
            sample_rate, backend=backend, time_scale=time_scale)
        self.prebuffer_seconds = prebuffer_seconds

    def write(self, chunk: AudioChunk) -> None:
        self.player.enqueue(chunk.samples,
                            prebuffer_seconds=self.prebuffer_seconds)

    def close(self) -> None:
        self.player.await_drain()
        if self._own:
            self.player.close()


def default_sink(sample_rate: int):
    """An audible PlayerSink when an output device exists, else the
    ring-buffer sink (headless hosts shouldn't block at real-time rate)."""
    try:
        import sounddevice

        if sounddevice.query_devices(kind="output") is not None:
            return PlayerSink(sample_rate, backend="sounddevice")
    except Exception:
        pass
    return RingBufferSink(sample_rate)


class PlaybackController:
    """Owns one generation 'task': runs the engine's streaming generator,
    fans chunks into a sink, tracks first-audio latency, supports stop()."""

    def __init__(self, engine):
        self.engine = engine
        self.time_to_first_audio: float | None = None
        self._thread: threading.Thread | None = None

    def play_stream(self, text: str, sink=None, **kw) -> TTSGenerationResult:
        sink = sink or default_sink(self.engine.sample_rate)
        engine = self.engine
        engine._stop_flag.clear()
        engine.is_generating = True
        engine.is_playing = True
        parts: list[np.ndarray] = []
        t0 = time.perf_counter()
        n_chunks = 0
        try:
            for chunk in engine.generate_streaming(text, **kw):
                if self.time_to_first_audio is None:
                    self.time_to_first_audio = time.perf_counter() - t0
                sink.write(chunk)
                parts.append(np.asarray(chunk.samples, np.float32))
                n_chunks += 1
        except GenerationStopped:
            _log.info("generation stopped by user")
        finally:
            engine.is_generating = False
            sink.close()  # PlayerSink blocks here until playback drains
            engine.is_playing = False
        gen_time = time.perf_counter() - t0
        engine.generation_time = gen_time
        samples = np.concatenate(parts) if parts else np.zeros(0, np.float32)
        return TTSGenerationResult(
            audio=AudioResult(samples=samples, sample_rate=engine.sample_rate,
                              processing_time=gen_time),
            chunks=n_chunks, generation_time=gen_time)

    def collect_stream(self, text: str, **kw) -> AudioResult:
        return self.engine.generate(text, **kw)

    def stop(self) -> None:
        self.engine.stop()
