"""Category loggers + timing helpers.

TPU-native analogue of the reference's os.Logger categories
(reference: package/Utils/Log.swift:14-53 — audio/tts/model/ui/perf categories,
plus Logger.timing/rtf extensions).
"""

from __future__ import annotations

import logging
import os

_CATEGORIES = ("audio", "tts", "stt", "model", "perf", "hub", "parallel",
               "training")
_CONFIGURED = False


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    level = os.environ.get("TPU_AUDIO_LOG", "WARNING").upper()
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S")
    )
    root = logging.getLogger("tpu_audio")
    root.setLevel(level)
    if not root.handlers:
        root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def get_logger(category: str = "model") -> logging.Logger:
    """Return the logger for one of the framework categories."""
    _configure()
    if category not in _CATEGORIES:
        raise ValueError(f"unknown log category {category!r}; use one of {_CATEGORIES}")
    return logging.getLogger(f"tpu_audio.{category}")


def log_timing(operation: str, seconds: float, category: str = "perf") -> None:
    get_logger(category).info("%s took %.3fs", operation, seconds)


def log_rtf(operation: str, processing_time: float, audio_duration: float,
            category: str = "perf") -> None:
    """Log a real-time factor (processing_time / audio_duration; <1 is faster
    than real time — reference: package/Models/AudioResult.swift:56-61)."""
    rtf = processing_time / audio_duration if audio_duration > 0 else float("inf")
    get_logger(category).info(
        "%s: %.3fs for %.2fs audio (RTF %.3f, %.1fx real time)",
        operation, processing_time, audio_duration, rtf,
        (1.0 / rtf) if rtf > 0 else float("inf"),
    )
