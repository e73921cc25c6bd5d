"""ctypes bindings + lazy build of the native window-gather library.

The .so is compiled on first use with the system g++ (no pip deps) and cached
next to the source; if no compiler is available the caller falls back to the
numpy gather path, so the framework never hard-requires the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "window_gather.cc")
_LIB = os.path.join(_HERE, "libwindow_gather.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load_library():
    """The ctypes library, or None if unavailable. Thread-safe, cached."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        pp = ctypes.POINTER(ctypes.c_float)
        lib.gather_windows_pair.argtypes = [
            ctypes.POINTER(pp), ctypes.POINTER(pp),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            pp, pp,
        ]
        lib.gather_windows_pair.restype = None
        _lib = lib
        return _lib


def _ptr_array(arrays: list[np.ndarray]):
    pp = ctypes.POINTER(ctypes.c_float)
    arr_t = pp * len(arrays)
    return arr_t(*[a.ctypes.data_as(pp) for a in arrays])


class NativeGather:
    """Bound gather over one dataset's clip buffers.

    Holds the per-clip pointer arrays (and references to the numpy buffers so
    they cannot be garbage-collected under the native code).
    """

    def __init__(self, audio: list[np.ndarray], facial: list[np.ndarray],
                 table: np.ndarray, window: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native gather library unavailable")
        for a in audio + facial:
            assert a.dtype == np.float32 and a.flags["C_CONTIGUOUS"]
        self._lib = lib
        self._audio = audio
        self._facial = facial
        self._audio_ptrs = _ptr_array(audio)
        self._facial_ptrs = _ptr_array(facial)
        self._table = np.ascontiguousarray(table, dtype=np.int64)
        self.window = window
        self.audio_dim = audio[0].shape[1] if audio else 0
        self.facial_dim = facial[0].shape[1] if facial else 0

    def __call__(self, idxs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idxs = np.ascontiguousarray(idxs, dtype=np.int64)
        B = len(idxs)
        src = np.empty((B, self.window, self.audio_dim), np.float32)
        trg = np.empty((B, self.window, self.facial_dim), np.float32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        fp = ctypes.POINTER(ctypes.c_float)
        self._lib.gather_windows_pair(
            self._audio_ptrs, self._facial_ptrs,
            self._table.ctypes.data_as(i64p), idxs.ctypes.data_as(i64p),
            B, self.window, self.audio_dim, self.facial_dim,
            src.ctypes.data_as(fp), trg.ctypes.data_as(fp),
        )
        return src, trg
