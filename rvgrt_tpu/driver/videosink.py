"""ctypes binding for the native video sink (native/videosink.cpp).

Completes the driver's presentation contract (SURVEY.md §7.7 "PNG/video"):
the render loop pushes RGB frames; a C++ writer thread encodes baseline
JPEG (self-contained encoder - the image has no ffmpeg) and muxes
Motion-JPEG into an AVI ('MJPG') or MP4 ('mp4v' with JPEG
objectTypeIndication 0x6C) chosen by file extension.  Blocking is bounded:
a full queue drops frames rather than stalling the frame loop, mirroring
the swap-chain present semantics (``main.cpp:194-217``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = _NATIVE_DIR / "libvideosink.so"


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
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.videosink_create.restype = ctypes.c_void_p
    lib.videosink_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_double,
                                     ctypes.c_int, ctypes.c_int]
    lib.videosink_push.restype = ctypes.c_int
    lib.videosink_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int,
                                   ctypes.c_int]
    lib.videosink_close.argtypes = [ctypes.c_void_p]
    lib.videosink_frames.restype = ctypes.c_uint64
    lib.videosink_frames.argtypes = [ctypes.c_void_p]
    lib.videosink_dropped.restype = ctypes.c_uint64
    lib.videosink_dropped.argtypes = [ctypes.c_void_p]
    lib.videosink_write_jpeg.restype = ctypes.c_int
    lib.videosink_write_jpeg.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
    return lib


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _load() or False
    return _lib or None


class VideoSink:
    """Async MJPEG video writer (container from the file extension)."""

    def __init__(self, path: str, width: int, height: int,
                 fps: float = 30.0, quality: int = 90):
        self.path = path
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native video sink unavailable "
                               "(no C++ toolchain?)")
        container = 1 if path.lower().endswith(".mp4") else 0
        self._h = self._lib.videosink_create(
            path.encode(), width, height, float(fps), int(quality),
            container)
        if not self._h:
            raise RuntimeError(f"cannot open {path}")

    def push(self, rgb_u8: np.ndarray) -> bool:
        """Queue an (H, W, 3) uint8 frame; returns False if dropped."""
        a = np.ascontiguousarray(rgb_u8, np.uint8)
        h, w, c = a.shape
        assert c == 3
        rc = self._lib.videosink_push(
            self._h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h)
        return rc == 0

    @property
    def frames(self) -> int:
        return int(self._lib.videosink_frames(self._h))

    @property
    def dropped(self) -> int:
        return int(self._lib.videosink_dropped(self._h))

    def close(self):
        """Drain the queue, finalize the container, release the handle."""
        if self._h:
            self._lib.videosink_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
