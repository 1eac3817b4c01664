"""ctypes binding for the native frame sink (native/framesink.cpp).

The presentation layer: the render loop pushes RGB frames into a native
ring buffer; a C++ writer thread encodes PNGs off the critical path - the
headless replacement for the reference's swap-chain present
(``main.cpp:194-217``).  Builds the shared library on first use; if no
C++ toolchain is available, falls back to synchronous PIL writes so the
driver still works everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = _NATIVE_DIR / "libframesink.so"


def _load():
    if not _LIB.exists():
        try:
            subprocess.run(["sh", str(_NATIVE_DIR / "build.sh")], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.framesink_create.restype = ctypes.c_void_p
    lib.framesink_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int]
    lib.framesink_push.restype = ctypes.c_int
    lib.framesink_push.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_int, ctypes.c_int,
                                   ctypes.c_uint64]
    lib.framesink_flush.argtypes = [ctypes.c_void_p]
    lib.framesink_written.restype = ctypes.c_uint64
    lib.framesink_written.argtypes = [ctypes.c_void_p]
    lib.framesink_dropped.restype = ctypes.c_uint64
    lib.framesink_dropped.argtypes = [ctypes.c_void_p]
    lib.framesink_destroy.argtypes = [ctypes.c_void_p]
    lib.framesink_write_png.restype = ctypes.c_int
    lib.framesink_write_png.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.c_int, ctypes.c_int]
    return lib


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _load() or False
    return _lib or None


class FrameSink:
    """Async PNG frame writer backed by the C++ ring buffer."""

    def __init__(self, directory: str, prefix: str = "frame_",
                 capacity: int = 16):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.prefix = prefix
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.framesink_create(
                directory.encode(), prefix.encode(), capacity)
        else:
            self._h = None  # PIL fallback
            self._written = 0

    def push(self, rgb_u8: np.ndarray, index: int) -> bool:
        """Queue an (H, W, 3) uint8 frame; returns False if dropped."""
        a = np.ascontiguousarray(rgb_u8, np.uint8)
        h, w, c = a.shape
        assert c == 3
        if self._h is not None:
            rc = self._lib.framesink_push(
                self._h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, index)
            return rc == 0
        from PIL import Image
        Image.fromarray(a).save(
            os.path.join(self.directory, f"{self.prefix}{index:06d}.png"))
        self._written += 1
        return True

    def flush(self):
        if self._h is not None:
            self._lib.framesink_flush(self._h)

    @property
    def written(self) -> int:
        if self._h is not None:
            return int(self._lib.framesink_written(self._h))
        return self._written

    @property
    def dropped(self) -> int:
        if self._h is not None:
            return int(self._lib.framesink_dropped(self._h))
        return 0

    def close(self):
        if self._h is not None:
            self.flush()
            self._lib.framesink_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
