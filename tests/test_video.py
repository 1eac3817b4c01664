"""Native video sink tests (native/videosink.cpp via driver/videosink.py).

The encoder is self-contained (no ffmpeg in the image), so correctness is
gated by parsing the containers back and decoding the embedded JPEG
samples with PIL: bitstream validity (PIL rejects malformed Huffman/DQT
segments) + pixel fidelity vs the pushed frames.
"""

import io
import math
import struct

import numpy as np
import pytest

from rvgrt_tpu.driver import videosink


@pytest.fixture(scope="module")
def lib():
    lb = videosink.get_lib()
    if lb is None:
        pytest.skip("no C++ toolchain for the native video sink")
    return lb


def _frames(n=6, h=64, w=96):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for i in range(n):
        img = np.stack([(xx + 5 * i) / w % 1.0, yy / h,
                        0.5 + 0.5 * np.sin(xx / 9 + i)], -1)
        out.append(np.ascontiguousarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)))
    return out


def _psnr(a, b):
    mse = ((a.astype(np.float32) - b.astype(np.float32)) ** 2).mean()
    return 10 * math.log10(255 * 255 / max(mse, 1e-9))


def test_jpeg_roundtrip(lib, tmp_path):
    from PIL import Image
    import ctypes

    f = _frames(1)[0]
    path = str(tmp_path / "f.jpg")
    rc = lib.videosink_write_jpeg(
        path.encode(), f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        f.shape[1], f.shape[0], 90)
    assert rc == 0
    dec = np.asarray(Image.open(path).convert("RGB"))
    assert _psnr(dec, f) >= 38.0


def test_avi_mjpeg(lib, tmp_path):
    from PIL import Image

    frames = _frames()
    path = str(tmp_path / "out.avi")
    with videosink.VideoSink(path, 96, 64, fps=30.0) as vs:
        for f in frames:
            assert vs.push(f)
        import time
        for _ in range(100):
            if vs.frames == len(frames):
                break
            time.sleep(0.05)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    pos = data.find(b"movi") + 4
    count = 0
    while data[pos:pos + 4] == b"00dc":
        n = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        jpg = data[pos + 8:pos + 8 + n]
        dec = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
        assert _psnr(dec, frames[count]) >= 38.0
        pos += 8 + n + (n & 1)
        count += 1
    assert count == len(frames)
    assert b"idx1" in data


def _find_box(data, path, start=0, end=None):
    end = len(data) if end is None else end
    p = start
    while p < end:
        n, = struct.unpack(">I", data[p:p + 4])
        t = data[p + 4:p + 8]
        if t == path[0]:
            if len(path) == 1:
                return p + 8, p + n
            off = 8 if t == b"stsd" else 0
            return _find_box(data, path[1:], p + 8 + off, p + n)
        p += n
    return None


def test_mp4_mjpeg(lib, tmp_path):
    from PIL import Image

    frames = _frames()
    path = str(tmp_path / "out.mp4")
    with videosink.VideoSink(path, 96, 64, fps=30.0) as vs:
        for f in frames:
            assert vs.push(f)
    data = open(path, "rb").read()
    assert data[4:8] == b"ftyp"
    stsz = _find_box(data, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                            b"stsz"])
    stco = _find_box(data, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                            b"stco"])
    stsd = _find_box(data, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                            b"stsd"])
    assert stsz and stco and stsd
    assert b"mp4v" in data[stsd[0]:stsd[1]]
    n, = struct.unpack(">I", data[stsz[0] + 8:stsz[0] + 12])
    assert n == len(frames)
    sizes = struct.unpack(f">{n}I", data[stsz[0] + 12:stsz[0] + 12 + 4 * n])
    offs = struct.unpack(f">{n}I", data[stco[0] + 8:stco[0] + 8 + 4 * n])
    for k in (0, n - 1):
        jpg = data[offs[k]:offs[k] + sizes[k]]
        dec = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
        assert _psnr(dec, frames[k]) >= 38.0
