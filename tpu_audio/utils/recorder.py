"""Audio capture abstraction.

Analogue of the reference example apps' AVFoundation AudioRecorder: on a
headless TPU host there is no microphone, so "recording" sources are a
file, a raw PCM stream (e.g. piped from arecord/ffmpeg on another box), or
pushed numpy blocks. Consumers pull fixed-size chunks for streaming ASR.
"""

from __future__ import annotations

import sys

import numpy as np

from tpu_audio.ops.resample import resample
from tpu_audio.utils.audio_io import read_wav, to_mono


class AudioRecorder:
    def __init__(self, target_rate: int = 16000):
        self.target_rate = target_rate
        self._buffer = np.zeros(0, np.float32)

    # -------------------------------------------------------------- sources

    def push(self, samples: np.ndarray, sample_rate: int | None = None) -> None:
        x = np.asarray(samples, np.float32)
        if sample_rate and sample_rate != self.target_rate:
            x = resample(x, sample_rate, self.target_rate)
        self._buffer = np.concatenate([self._buffer, x])

    def load_file(self, path: str) -> None:
        x, rate = read_wav(path)
        self.push(to_mono(x), rate)

    def read_raw_stream(self, stream=None, sample_rate: int = 16000,
                        dtype: str = "int16", chunk_bytes: int = 32000):
        """Generator over a raw PCM stream (default stdin)."""
        stream = stream or sys.stdin.buffer
        scale = 32768.0 if dtype == "int16" else 1.0
        np_dtype = "<i2" if dtype == "int16" else "<f4"
        while True:
            raw = stream.read(chunk_bytes)
            if not raw:
                break
            x = np.frombuffer(raw, dtype=np_dtype).astype(np.float32) / scale
            self.push(x, sample_rate)
            yield x

    # -------------------------------------------------------------- consume

    @property
    def duration(self) -> float:
        return len(self._buffer) / self.target_rate

    def pull(self, seconds: float) -> np.ndarray | None:
        """Take the next chunk of audio, or None if not enough buffered."""
        n = int(seconds * self.target_rate)
        if len(self._buffer) < n:
            return None
        out, self._buffer = self._buffer[:n], self._buffer[n:]
        return out

    def drain(self) -> np.ndarray:
        out, self._buffer = self._buffer, np.zeros(0, np.float32)
        return out
