"""ctypes bindings for the native host-runtime components (native/).

NativeFrameLoader wraps native/frame_loader.cc: a C++ worker pool that
decodes dataset frames (PNG/PGM → grayscale) ahead of the consumer into a
bounded ring — the ingestion part of the reference's runtime (cv::imread on
the tracking thread) moved off the Python hot path. Falls back to the Python
decoder for unsupported formats.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "libframe_loader.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.fl_next.restype = ctypes.c_long
    lib.fl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.fl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


class NativeFrameLoader:
    """Prefetching grayscale frame iterator over a list of image paths."""

    def __init__(self, paths, height: int, width: int, lookahead: int = 8,
                 n_threads: int = 2):
        self._lib = _load_lib()
        self._paths = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self._h, self._w = height, width
        self._handle = self._lib.fl_open(
            arr, len(self._paths), height, width, lookahead, n_threads
        )
        self._closed = False

    def __iter__(self):
        buf = np.empty((self._h, self._w), np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        while True:
            idx = self._lib.fl_next(self._handle, ptr)
            if idx == -1:
                break
            if idx == -2:
                # decode fallback (format outside the native subset)
                from orbslamm_tpu.io.datasets import imread_gray

                i = getattr(self, "_emitted", 0)
                yield imread_gray(self._paths[i])
            else:
                yield buf.copy()
            self._emitted = getattr(self, "_emitted", 0) + 1
        self.close()

    def close(self):
        if not self._closed:
            self._lib.fl_close(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
