"""Device (HBM) memory introspection.

Analogue of the reference's MLXMemory snapshot/limits
(package/Utils/MLXMemory.swift:43-119). XLA owns the HBM allocator; this
module surfaces its stats and lets callers cap the client allocation
fraction (the moral equivalent of Memory.cacheLimit).
"""

from __future__ import annotations

import os

import jax

from tpu_audio.utils.logging import get_logger

_log = get_logger("perf")


def snapshot(device=None) -> dict:
    """Return {bytes_in_use, peak_bytes_in_use, bytes_limit, ...} for the
    first (or given) device; empty dict if the backend exposes nothing."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return stats


def log_stats(tag: str = "") -> None:
    s = snapshot()
    if not s:
        _log.info("memory stats unavailable on this backend")
        return
    mb = 1024 * 1024
    _log.info("%s memory: in_use=%.0fMB peak=%.0fMB limit=%.0fMB", tag,
              s.get("bytes_in_use", 0) / mb,
              s.get("peak_bytes_in_use", 0) / mb,
              s.get("bytes_limit", 0) / mb)


def set_memory_fraction(fraction: float) -> None:
    """Cap XLA's preallocation fraction. Must be called before the backend
    initializes (start of program)."""
    os.environ["XLA_PYTHON_CLIENT_MEM_FRACTION"] = str(fraction)


def clear_caches() -> None:
    """Drop JAX's compilation + array caches (the moral equivalent of the
    reference's Memory.clearCache between sentences)."""
    jax.clear_caches()
