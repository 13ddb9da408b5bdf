"""Stage timers + optional jax.profiler traces.

TPU-native analogue of the reference's compile-time-gated Profiler with
per-stage time/timeAsync wrappers (reference:
package/TTS/Orpheus/TTSEngine/OrpheusTTS.swift:18-42) and the benchmark
stage timers (package/Tests/ChatterboxBenchmark.swift:107-113).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStats:
    total_s: float = 0.0
    count: int = 0

    @property
    def mean_s(self) -> float:
        return self.total_s / self.count if self.count else 0.0


@dataclass
class Profiler:
    """Accumulating per-stage wall-clock timers.

    Enabled by default (overhead is one perf_counter pair per stage); the
    jax.profiler device trace is gated by TPU_AUDIO_TRACE_DIR.
    """

    stages: dict = field(default_factory=lambda: defaultdict(StageStats))

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stages[stage]
            s.total_s += dt
            s.count += 1

    def record(self, stage: str, seconds: float) -> None:
        s = self.stages[stage]
        s.total_s += seconds
        s.count += 1

    def summary(self) -> dict:
        return {k: {"total_s": v.total_s, "count": v.count, "mean_s": v.mean_s}
                for k, v in self.stages.items()}

    def reset(self) -> None:
        self.stages.clear()


@contextlib.contextmanager
def device_trace(name: str = "tpu_audio"):
    """Capture a jax.profiler trace if TPU_AUDIO_TRACE_DIR is set."""
    trace_dir = os.environ.get("TPU_AUDIO_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
