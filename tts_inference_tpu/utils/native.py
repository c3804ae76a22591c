"""ctypes binding for the C++ streaming runtime (native/tts_runtime.cpp).

Auto-builds the shared library on first import if a toolchain is present;
falls back to the pure-Python implementations in protocol.py otherwise.
`NativeExtractor` / `native_deinterleave` are drop-in equivalents of
`protocol.TokenExtractor` / `protocol.deinterleave_frames` (equivalence is
test-enforced in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)
)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtts_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
        os.path.join(_NATIVE_DIR, "tts_runtime.cpp")
    ):
        _build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ex_create.restype = ctypes.c_void_p
    lib.ex_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ex_destroy.argtypes = [ctypes.c_void_p]
    lib.ex_started.argtypes = [ctypes.c_void_p]
    lib.ex_finished.argtypes = [ctypes.c_void_p]
    lib.ex_total_codes.argtypes = [ctypes.c_void_p]
    lib.ex_total_codes.restype = ctypes.c_int64
    lib.ex_restarts.argtypes = [ctypes.c_void_p]
    lib.ex_restarts.restype = ctypes.c_int64
    lib.ex_feed.restype = ctypes.c_int64
    lib.ex_feed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.ex_codes.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.deinterleave.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.emission_window.restype = ctypes.c_int
    lib.emission_window.argtypes = [ctypes.c_int64] * 6 + [
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeExtractor:
    """C++ twin of protocol.TokenExtractor (same semantics)."""

    def __init__(self, restart_on_sos: bool = False, started: bool = False):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.ex_create(int(restart_on_sos), int(started))

    def __del__(self):
        try:
            self._lib.ex_destroy(self._h)
        except Exception:
            pass

    @property
    def started(self) -> bool:
        return bool(self._lib.ex_started(self._h))

    @property
    def finished(self) -> bool:
        return bool(self._lib.ex_finished(self._h))

    @property
    def total_codes(self) -> int:
        return int(self._lib.ex_total_codes(self._h))

    @property
    def restart_count(self) -> int:
        return int(self._lib.ex_restarts(self._h))

    def feed_many(self, tokens) -> List[int]:
        toks = np.ascontiguousarray(tokens, dtype=np.int32)
        out = np.empty(max(len(toks), 1), dtype=np.int32)
        n = self._lib.ex_feed(
            self._h, _i32ptr(toks), len(toks), _i32ptr(out), len(out)
        )
        return out[:n].tolist()

    def codes_range(self, lo: int, hi: int) -> np.ndarray:
        out = np.empty(max(hi - lo, 0), dtype=np.int32)
        if hi > lo:
            self._lib.ex_codes(self._h, lo, hi, _i32ptr(out))
        return out


def native_deinterleave(
    codes,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    flat = np.ascontiguousarray(codes, dtype=np.int32)
    n = len(flat) // 7
    flat = flat[: n * 7]
    l1 = np.empty(n, np.int32)
    l2 = np.empty(2 * n, np.int32)
    l3 = np.empty(4 * n, np.int32)
    lib.deinterleave(_i32ptr(flat), n, _i32ptr(l1), _i32ptr(l2), _i32ptr(l3))
    return l1, l2, l3


def native_emission_window(
    samples_emitted: int, total_frames: int, samples_per_frame: int,
    lookahead: int, left_context: int, frames_per_chunk: int, flush: bool,
) -> Optional[Tuple[int, int, int, int]]:
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    out = (ctypes.c_int64 * 4)()
    ok = lib.emission_window(
        samples_emitted, total_frames, samples_per_frame, lookahead,
        left_context, frames_per_chunk, int(flush), out,
    )
    if not ok:
        return None
    return tuple(int(x) for x in out)
