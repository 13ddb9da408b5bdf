"""ctypes bindings for the native runtime core (native/tpuaudio.cpp).

Builds on demand with `make -C native` if the shared library is missing
and a toolchain exists; every entry point has a NumPy fallback, so the
framework works (slower) without the native layer. The Python fallbacks
are the correctness references in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from tpu_audio.utils.logging import get_logger

_log = get_logger("perf")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuaudio.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure → fallback
            _log.warning("native build failed (%s); using NumPy fallbacks", e)
            return None
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ta_resample.restype = ctypes.c_int64
        lib.ta_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.ta_bpe_new.restype = ctypes.c_void_p
        lib.ta_bpe_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int32, ctypes.c_int32]
        lib.ta_bpe_free.argtypes = [ctypes.c_void_p]
        lib.ta_bpe_encode_piece.restype = ctypes.c_int32
        lib.ta_bpe_encode_piece.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.ta_dtw.restype = ctypes.c_int64
        lib.ta_dtw.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                               ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                               ctypes.POINTER(ctypes.c_int32)]
        lib.ta_ring_new.restype = ctypes.c_void_p
        lib.ta_ring_new.argtypes = [ctypes.c_int64]
        lib.ta_ring_free.argtypes = [ctypes.c_void_p]
        for fn in ("ta_ring_write", "ta_ring_read"):
            f = getattr(lib, fn)
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                          ctypes.c_int64]
        lib.ta_ring_available.restype = ctypes.c_int64
        lib.ta_ring_available.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------------ resample

def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from tpu_audio.ops.resample import resample as np_resample

        return np_resample(x, sr_in, sr_out)
    x = np.ascontiguousarray(x, dtype=np.float32)
    if sr_in == sr_out:
        return x
    import math

    g = math.gcd(sr_in, sr_out)
    n_out = -(-len(x) * (sr_out // g) // (sr_in // g))
    out = np.empty(n_out, dtype=np.float32)
    n = lib.ta_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in,
        sr_out, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out[:n]


# ------------------------------------------------------------------ BPE

class NativeBPE:
    """Drop-in accelerator for tokenizer merge loops."""

    def __init__(self, ranks: dict[bytes, int]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.ta_bpe_new()
        for tok, rank in ranks.items():
            lib.ta_bpe_add(self._h, tok, len(tok), rank)

    def encode_piece(self, piece: bytes) -> list[int]:
        cap = max(16, len(piece) * 2)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.ta_bpe_encode_piece(self._h, piece, len(piece), out, cap)
        return list(out[:n])

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.ta_bpe_free(self._h)
            self._h = None


# ------------------------------------------------------------------ DTW

def dtw(x: np.ndarray):
    """Native DTW with the same semantics as models/whisper/timing.dtw."""
    lib = _load()
    if lib is None:
        from tpu_audio.models.whisper.timing import dtw as py_dtw

        return py_dtw(x)
    x = np.ascontiguousarray(x, dtype=np.float32)
    n, m = x.shape
    ti = np.empty(n + m, dtype=np.int32)
    tj = np.empty(n + m, dtype=np.int32)
    k = lib.ta_dtw(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
                   ti.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   tj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return ti[:k].copy(), tj[:k].copy()


# ------------------------------------------------------------------ ring buffer

class RingBuffer:
    """SPSC float ring buffer for streaming playback sinks."""

    def __init__(self, capacity: int):
        lib = _load()
        self._lib = lib
        if lib is None:
            self._buf = np.zeros(0, np.float32)
            self._capacity = capacity
            self._h = None
        else:
            self._h = lib.ta_ring_new(capacity)
            self._capacity = capacity

    def write(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        if self._h is None:
            room = self._capacity - len(self._buf)
            todo = min(room, len(data))
            self._buf = np.concatenate([self._buf, data[:todo]])
            return todo
        return self._lib.ta_ring_write(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(data))

    def read(self, n: int) -> np.ndarray:
        if self._h is None:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        out = np.empty(n, np.float32)
        got = self._lib.ta_ring_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        return out[:got]

    @property
    def available(self) -> int:
        if self._h is None:
            return len(self._buf)
        return self._lib.ta_ring_available(self._h)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.ta_ring_free(self._h)
            self._h = None
