"""Probe isolation: compile probes run a candidate kernel eagerly ONCE at
real shapes before a decode graph commits to it (Mosaic compiles per
backend; a lowering failure inside a jitted loop would otherwise surface
mid-generation with no fallback).

Callers may invoke a probe while TRACING another function (whisper's
encoder scan gates on packed_probe at trace time). JAX's tracing context
is ambient — even ops on fully-concrete inputs are staged into the active
trace — so np.asarray on the probe's output raises
TracerArrayConversionError, which the probe's except clause would then
silently memoize as a kernel failure, disabling the kernel for the whole
process (observed on chip: the whisper batch-16 headline fell 666x→485x).
jax.ensure_compile_time_eval is not a fix: the eval context leaks into the
pallas kernel trace and turns in-kernel iota/mask expressions into
concrete captured constants, which pallas rejects. The trace context is
thread-local, so running the probe body in a fresh thread executes it
under plain eager dispatch exactly as at load time.
"""

from __future__ import annotations

import threading


def run_outside_trace(fn):
    """Run fn() in a fresh thread (no ambient JAX trace) and return its
    value; exceptions propagate to the caller."""
    out: dict = {}

    def runner():
        try:
            out["value"] = fn()
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            out["exc"] = exc

    t = threading.Thread(target=runner, name="tpu-audio-kernel-probe")
    t.start()
    t.join()
    if "exc" in out:
        raise out["exc"]
    return out["value"]
