"""Audio-device playback: the AVAudioEngine-equivalent output stage.

Mirrors the reference's AudioSamplePlayer
(package/Audio/AudioSamplePlayer.swift:10-284): 30 ms slice enqueue into a
queue, optional prebuffer before playback starts, volume boost 1.25 + clip
0.98 on the one-shot play() path, stop() resets state and releases drain
waiters, await_drain() blocks until the queue empties.

On a TPU host there is no AVAudioEngine; the queue is the native C++ SPSC
ring buffer (native/tpuaudio.cpp) and the consumer is pluggable:

  - "sounddevice": a PortAudio output stream whose callback pulls straight
    from the ring (used when the optional `sounddevice` package and an
    output device are present);
  - "clock": a headless consumer thread that drains at real-time rate (or
    scaled for tests) — same state machine, no hardware;
  - "null": drains instantly (collect-style usage).

The state machine (queued_sample_count / is_playing / prebuffer / drain) is
identical across backends, so it is testable without an audio device.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from tpu_audio.utils import constants
from tpu_audio.utils.logging import get_logger

_log = get_logger("audio")

SLICE_SECONDS = 0.030  # reference enqueue slice (AudioSamplePlayer.swift:105)


def _pick_backend(requested: str | None) -> str:
    if requested:
        return requested
    try:
        import sounddevice  # noqa: F401

        if sounddevice.query_devices(kind="output") is not None:
            return "sounddevice"
    except Exception:
        pass
    return "clock"


class _ClockOutput:
    """Headless consumer: pulls from the player at (scaled) real-time rate."""

    def __init__(self, sample_rate: int, time_scale: float = 1.0,
                 block_seconds: float = 0.010):
        self.sample_rate = sample_rate
        self.time_scale = time_scale
        self.block = max(1, int(sample_rate * block_seconds))
        self.block_seconds = block_seconds
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self, pull) -> None:
        self._stop.clear()

        def run():
            while not self._stop.is_set():
                pull(self.block)
                time.sleep(self.block_seconds * self.time_scale)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None


class _NullOutput:
    """Drains everything immediately (no pacing)."""

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self, pull) -> None:
        self._stop.clear()

        def run():
            while not self._stop.is_set():
                if pull(self.sample_rate) == 0:
                    time.sleep(0.001)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None


class _SoundDeviceOutput:
    """PortAudio output stream; the audio callback pulls from the player."""

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self._stream = None
        self._pull = None

    def start(self, pull) -> None:
        import sounddevice

        self._pull = pull

        def callback(outdata, frames, time_info, status):
            if status:
                _log.debug("sounddevice status: %s", status)
            got = pull(frames, out=outdata[:, 0])
            if got < frames:
                outdata[got:, 0] = 0.0

        self._stream = sounddevice.OutputStream(
            samplerate=self.sample_rate, channels=1, dtype="float32",
            callback=callback)
        self._stream.start()

    def stop(self) -> None:
        if self._stream is not None:
            self._stream.stop()
            self._stream.close()
            self._stream = None


_OUTPUTS = {"clock": _ClockOutput, "null": _NullOutput,
            "sounddevice": _SoundDeviceOutput}


class AudioSamplePlayer:
    """Streaming sample player with prebuffer + drain semantics.

    Parity with AudioSamplePlayer.swift: play() boosts 1.25×/clips at 0.98
    and blocks to completion; enqueue() slices 30 ms pieces into the queue
    at unity gain and starts playback once `prebuffer_seconds` of audio is
    queued; stop() resets and releases every drain waiter.
    """

    def __init__(self, sample_rate: int = 24000, backend: str | None = None,
                 capacity_seconds: float = 120.0, time_scale: float = 1.0):
        from tpu_audio.native import RingBuffer

        self.sample_rate = sample_rate
        self.backend = _pick_backend(backend)
        self._ring = RingBuffer(int(sample_rate * capacity_seconds))
        self._lock = threading.Lock()
        self._drained = threading.Condition(self._lock)
        self.queued_sample_count = 0
        self.is_playing = False
        self.has_started_playback = False
        self._consuming = threading.Event()
        out_cls = _OUTPUTS[self.backend]
        if out_cls is _ClockOutput:
            self._output = out_cls(sample_rate, time_scale=time_scale)
        else:
            self._output = out_cls(sample_rate)
        self._output_started = False

    # ---------------------------------------------------------------- pull

    def _pull(self, n: int, out: np.ndarray | None = None) -> int:
        """Consumer callback: read up to n played samples. Returns count."""
        if not self._consuming.is_set():
            if out is not None:
                out[:] = 0.0
            return 0
        data = self._ring.read(n)
        got = len(data)
        if out is not None and got:
            out[:got] = data
        with self._lock:
            if got:
                self.queued_sample_count = max(
                    0, self.queued_sample_count - got)
            if (self.queued_sample_count == 0 and self.has_started_playback
                    and self._ring.available == 0):
                self.is_playing = False
                self.has_started_playback = False
                self._consuming.clear()
                self._drained.notify_all()
        return got

    def _ensure_output(self) -> None:
        if not self._output_started:
            self._output.start(self._pull)
            self._output_started = True

    # ---------------------------------------------------------------- API

    def enqueue(self, samples: np.ndarray, prebuffer_seconds: float = 0.0
                ) -> None:
        """Stream samples for playback in 30 ms slices (unity gain, like the
        reference's enqueue path)."""
        samples = np.asarray(samples, np.float32)
        if samples.size == 0:
            return
        self._ensure_output()
        slice_n = max(1, int(SLICE_SECONDS * self.sample_rate))
        prebuffer = int(prebuffer_seconds * self.sample_rate)
        for i in range(0, len(samples), slice_n):
            piece = samples[i: i + slice_n]
            written = 0
            while written < len(piece):
                written += self._ring.write(piece[written:])
                if written < len(piece):
                    time.sleep(0.005)  # backpressure: consumer drains
            with self._lock:
                self.queued_sample_count += len(piece)
                if not self.has_started_playback:
                    if prebuffer == 0 or self.queued_sample_count >= prebuffer:
                        self.has_started_playback = True
                        self.is_playing = True
                        self._consuming.set()

    def play(self, samples: np.ndarray,
             volume_boost: float = constants.VOLUME_BOOST_FACTOR) -> None:
        """One-shot blocking playback with volume boost + clip (reference
        play(samples:volumeBoost:))."""
        samples = np.asarray(samples, np.float32)
        if samples.size == 0:
            return
        self.stop()
        boosted = np.clip(samples * volume_boost,
                          -constants.MAX_SAMPLE_VALUE,
                          constants.MAX_SAMPLE_VALUE)
        self.enqueue(boosted)
        self.await_drain()

    def await_drain(self, timeout: float | None = None) -> None:
        """Block until every enqueued sample has been consumed."""
        with self._lock:
            if not self.has_started_playback and self.queued_sample_count == 0:
                return
            self._drained.wait_for(
                lambda: self.queued_sample_count == 0
                and not self.has_started_playback, timeout=timeout)

    def stop(self) -> None:
        """Stop playback, drop queued audio, release drain waiters."""
        with self._lock:
            self._consuming.clear()
            while self._ring.available:
                self._ring.read(self._ring.available)
            self.queued_sample_count = 0
            self.is_playing = False
            self.has_started_playback = False
            self._drained.notify_all()

    def close(self) -> None:
        self.stop()
        if self._output_started:
            self._output.stop()
            self._output_started = False


class AudioFilePlayer:
    """File playback with progress tracking — parity with the reference's
    AudioFilePlayer (Audio/AudioFilePlayer.swift: load/play/pause/stop/
    seek, is_playing, current_time, duration). Decodes the whole WAV into
    memory and feeds the same pluggable outputs as AudioSamplePlayer."""

    def __init__(self, backend: str | None = None, time_scale: float = 1.0):
        self._backend = _pick_backend(backend)
        self._time_scale = time_scale
        self._samples = np.zeros(0, np.float32)
        self.sample_rate = 24000
        self._pos = 0
        self._lock = threading.Lock()
        self.is_playing = False
        self.current_audio_path: str | None = None
        self._output = None

    # ------------------------------------------------------------- state

    @property
    def duration(self) -> float:
        return len(self._samples) / self.sample_rate

    @property
    def current_time(self) -> float:
        return self._pos / self.sample_rate

    # ------------------------------------------------------------- API

    def load(self, path: str) -> None:
        from tpu_audio.utils.audio_io import read_wav

        self.stop()
        self._samples, self.sample_rate = read_wav(path)
        self._samples = np.asarray(self._samples, np.float32)
        self.current_audio_path = path
        self._pos = 0

    def _pull(self, n: int, out: np.ndarray | None = None) -> int:
        with self._lock:
            if not self.is_playing:
                if out is not None:
                    out[:] = 0.0
                return 0
            piece = self._samples[self._pos: self._pos + n]
            self._pos += len(piece)
            if self._pos >= len(self._samples):
                self.is_playing = False
        if out is not None and len(piece):
            out[:len(piece)] = piece
        return len(piece)

    def play(self) -> None:
        if self._output is None:
            cls = _OUTPUTS[self._backend]
            self._output = (cls(self.sample_rate,
                                time_scale=self._time_scale)
                            if cls is _ClockOutput else cls(self.sample_rate))
            self._output.start(self._pull)
        with self._lock:
            if self._pos >= len(self._samples):
                self._pos = 0
            self.is_playing = True

    def pause(self) -> None:
        with self._lock:
            self.is_playing = False

    def toggle_play_pause(self) -> None:
        self.pause() if self.is_playing else self.play()

    def seek(self, seconds: float) -> None:
        with self._lock:
            self._pos = int(np.clip(seconds, 0, self.duration)
                            * self.sample_rate)

    def stop(self) -> None:
        with self._lock:
            self.is_playing = False
            self._pos = 0
        if self._output is not None:
            self._output.stop()
            self._output = None
