"""Round-5 probe: interactive input->photon latency (VERDICT r4 #3/#8).

Runs the real ViewerServer (driver/viewer.py) over a real Engine on the
chip and measures, from the HTTP client's side, the wall time from
POSTing an input event to receiving a frame that is GUARANTEED to
include it:

  * POST /input with a distinctive mouse_dx; record the frame seq s0.
  * ``first-after``  = time until seq > s0 (optimistic: that frame was
    already in flight when the input landed, so it may not include it).
  * ``guaranteed``   = time until seq >= s0 + 2 (the render loop consumed
    the input at the start of that frame or earlier).

The measured span covers: input parse, Engine.step dispatch, device
render, HBM->host readback, JPEG encode, publish, HTTP fetch - i.e. the
full server-side photon path.  A browser adds its own network + decode +
vsync (~1 display frame); the reference's loop is vsync-paced
(main.cpp:217, Present(1,0)) so its floor is 1-2 vsyncs + GPU frame.

Usage: python scripts/probe_r31_latency.py [--config stage2] [--trials 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="stage2")
    p.add_argument("--trials", type=int, default=10)
    p.add_argument("--no-gi", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.driver import cli as cli_mod
    from rvgrt_tpu.driver.engine import Engine
    from rvgrt_tpu.driver.viewer import ViewerServer

    print(f"device={jax.devices()[0]}", flush=True)
    ecfg = (cli_mod.tiny_config() if args.config == "tiny"
            else cli_mod.CONFIGS[args.config]())
    t0 = time.time()
    eng = Engine(ecfg, include_gi=not args.no_gi)
    cli_mod.spawn_above_terrain(eng)
    print(f"engine ready {time.time() - t0:.1f}s", flush=True)

    srv = ViewerServer(eng, port=0, max_fps=1000).start()
    base = f"http://127.0.0.1:{srv.port}"

    def get_stats():
        with urllib.request.urlopen(base + "/stats", timeout=120) as r:
            return json.loads(r.read())

    # warm: let the first frames compile/settle
    t0 = time.time()
    while get_stats().get("frames", 0) < 3:
        time.sleep(0.5)
        if time.time() - t0 > 1200:
            print("warmup timeout", flush=True)
            return
    print(f"warm after {time.time() - t0:.1f}s; "
          f"frame_ms={get_stats().get('frame_ms')}", flush=True)

    first_after, guaranteed = [], []
    for i in range(args.trials):
        s0 = get_stats()["frames"]
        t0 = time.time()
        data = json.dumps({"mouse_dx": 3.0}).encode()
        req = urllib.request.Request(base + "/input", data=data,
                                     method="POST")
        urllib.request.urlopen(req, timeout=60).read()
        t_post = time.time()
        fa = None
        while True:
            s = get_stats()["frames"]
            if fa is None and s > s0:
                fa = time.time() - t0
            if s >= s0 + 2:
                guaranteed.append(time.time() - t0)
                first_after.append(fa)
                break
            time.sleep(0.002)
        print(f"trial {i}: post {1e3 * (t_post - t0):.1f} ms, "
              f"first-after {1e3 * first_after[-1]:.0f} ms, "
              f"guaranteed {1e3 * guaranteed[-1]:.0f} ms", flush=True)

    fa = np.array(first_after) * 1e3
    ga = np.array(guaranteed) * 1e3
    print(f"\nconfig={args.config} gi={not args.no_gi} trials={args.trials}")
    print(f"first-after : median {np.median(fa):.0f} ms  p90 "
          f"{np.percentile(fa, 90):.0f} ms")
    print(f"guaranteed  : median {np.median(ga):.0f} ms  p90 "
          f"{np.percentile(ga, 90):.0f} ms")
    srv.stop()


if __name__ == "__main__":
    main()
