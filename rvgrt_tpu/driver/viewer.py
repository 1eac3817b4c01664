"""Interactive live viewer: the App-shell/present surface, TPU-style.

The reference's L7/L6 is a Win32 window with raw-mouse + WASD input and a
D3D12 swap chain (``main.cpp:555-674``, ``renderLoop`` ``main.cpp:104-234``).
On a headless TPU host the equivalent is a tiny HTTP server + browser page:

* the render loop runs in a background thread, stepping the engine with the
  latest input snapshot (the ``InputState`` dataclass replaces key polling);
* "present" is an MJPEG stream (multipart/x-mixed-replace) - each part is
  one JPEG-encoded frame fetched from the device;
* the page captures WASD / space / shift and pointer-lock mouse deltas and
  POSTs them as JSON (the raw-input registration analogue,
  ``main.cpp:651-656``); Escape releases the pointer like the reference's
  Escape-quit (``WndProc``, ``main.cpp:560``).

The server depends only on the stdlib + an ``engine`` object exposing
``step(InputState, dt) -> FrameOutputs`` and a ``character`` - so it is
testable with a stub and reusable over sharded engines.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from rvgrt_tpu.scene.camera import InputState

_PAGE = """<!doctype html>
<title>rvgrt_tpu viewer</title>
<style>
 body { margin:0; background:#111; color:#9ab; font:13px monospace }
 #hud { position:fixed; top:8px; left:8px; }
 img  { display:block; margin:0 auto; image-rendering:pixelated;
        width:min(100vw, 100vh * %ASPECT%); }
</style>
<img id=v src="/stream">
<div id=hud>click to fly &mdash; WASD + mouse, space up, shift down,
Esc releases</div>
<script>
const keys = {};
let mdx = 0, mdy = 0;
const v = document.getElementById('v');
v.onclick = () => v.requestPointerLock();
document.addEventListener('keydown', e => { keys[e.code] = 1; });
document.addEventListener('keyup',   e => { keys[e.code] = 0; });
document.addEventListener('mousemove', e => {
  if (document.pointerLockElement === v) { mdx += e.movementX; mdy += e.movementY; }
});
setInterval(() => {
  const body = JSON.stringify({
    move_x: (keys['KeyD']?1:0) - (keys['KeyA']?1:0),
    move_y: (keys['ShiftLeft']?1:0) - (keys['Space']?1:0),
    move_z: (keys['KeyW']?1:0) - (keys['KeyS']?1:0),
    mouse_dx: mdx, mouse_dy: mdy,
  });
  mdx = 0; mdy = 0;
  fetch('/input', {method: 'POST', body});
}, 33);
</script>
"""


def _encode_jpeg(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, "JPEG", quality=88)
    return buf.getvalue()


class ViewerServer:
    """Live viewer around any engine-like object.

    ``engine.step(inputs, dt)`` must return an object with a ``color``
    (H, W, 3) float array in [0, 1] (device or host).  The render loop is
    paced by the engine itself (one step per loop turn); clients only ever
    see the latest completed frame.
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 max_fps: float = 60.0):
        self.engine = engine
        self._inputs = InputState()
        self._lock = threading.Lock()
        self._frame_jpeg: bytes | None = None
        self._frame_seq = 0
        self._frame_cv = threading.Condition()
        self._stop = threading.Event()
        self._min_dt = 1.0 / max_fps
        self.frame_count = 0
        self.last_frame_ms = 0.0

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/":
                    h, w = viewer._shape()
                    page = _PAGE.replace("%ASPECT%", f"{w / h:.5f}")
                    body = page.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/frame.jpg":
                    data = viewer._wait_frame()
                    if not data:  # no frame yet (e.g. first-frame compile)
                        self.send_error(503, "no frame rendered yet")
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=f")
                    self.end_headers()
                    last = -1
                    try:
                        while not viewer._stop.is_set():
                            data, last = viewer._wait_frame_after(last)
                            if not data:
                                # nothing rendered yet (long first-frame
                                # jit): keep the stream open, never emit an
                                # empty part (browsers drop the stream)
                                continue
                            self.wfile.write(
                                b"--f\r\nContent-Type: image/jpeg\r\n"
                                + f"Content-Length: {len(data)}\r\n\r\n"
                                .encode())
                            self.wfile.write(data)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                elif self.path == "/stats":
                    body = json.dumps(dict(
                        frames=viewer.frame_count,
                        frame_ms=round(viewer.last_frame_ms, 2))).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404)

            def do_POST(self):
                if self.path == "/input":
                    n = int(self.headers.get("Content-Length", 0))
                    d = json.loads(self.rfile.read(n) or b"{}")
                    with viewer._lock:
                        # mouse deltas ACCUMULATE across posts (the render
                        # loop zeroes them on consume); frames take seconds
                        # on big configs while input posts at ~30 Hz -
                        # overwriting would drop most look motion
                        prev = viewer._inputs
                        viewer._inputs = InputState(
                            move_x=float(d.get("move_x", 0)),
                            move_y=float(d.get("move_y", 0)),
                            move_z=float(d.get("move_z", 0)),
                            mouse_dx=prev.mouse_dx + float(d.get("mouse_dx", 0)),
                            mouse_dy=prev.mouse_dy + float(d.get("mouse_dy", 0)))
                    self.send_response(204)
                    self.end_headers()
                else:
                    self.send_error(404)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._threads: list[threading.Thread] = []

    # -- frame plumbing -------------------------------------------------
    def _shape(self):
        r = self.engine.ecfg.render
        return r.height, r.width

    def _publish(self, jpeg: bytes):
        with self._frame_cv:
            self._frame_jpeg = jpeg
            self._frame_seq += 1
            self._frame_cv.notify_all()

    def _wait_frame(self) -> bytes:
        with self._frame_cv:
            self._frame_cv.wait_for(lambda: self._frame_jpeg is not None,
                                    timeout=60)
            return self._frame_jpeg or b""

    def _wait_frame_after(self, seq: int):
        with self._frame_cv:
            self._frame_cv.wait_for(
                lambda: self._frame_seq != seq or self._stop.is_set(),
                timeout=60)
            return self._frame_jpeg or b"", self._frame_seq

    def _render_loop(self):
        while not self._stop.is_set():
            t0 = time.time()
            with self._lock:
                inputs = self._inputs
                # mouse deltas are consumed once per frame
                self._inputs = InputState(move_x=inputs.move_x,
                                          move_y=inputs.move_y,
                                          move_z=inputs.move_z)
            out = self.engine.step(inputs, max(self.last_frame_ms / 1e3,
                                               1 / 60))
            img = np.asarray(out.color)
            u8 = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
            self._publish(_encode_jpeg(u8))
            self.frame_count += 1
            dt = time.time() - t0
            self.last_frame_ms = dt * 1e3
            if dt < self._min_dt:
                time.sleep(self._min_dt - dt)

    # -- lifecycle -------------------------------------------------------
    def start(self):
        for target in (self._render_loop, self.httpd.serve_forever):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()
        with self._frame_cv:
            self._frame_cv.notify_all()
        self.httpd.shutdown()
        self.httpd.server_close()


def main(argv=None):
    import argparse

    from rvgrt_tpu.driver import cli as cli_mod
    from rvgrt_tpu.driver.engine import Engine

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="tiny",
                   choices=list(cli_mod.CONFIGS) + ["tiny"])
    p.add_argument("--no-gi", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8777)
    args = p.parse_args(argv)

    ecfg = (cli_mod.tiny_config() if args.config == "tiny"
            else cli_mod.CONFIGS[args.config]())
    eng = Engine(ecfg, include_gi=not args.no_gi)
    cli_mod.spawn_above_terrain(eng)
    srv = ViewerServer(eng, host=args.host, port=args.port).start()
    print(f"viewer at http://{args.host}:{srv.port}/  (Ctrl-C to quit)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
