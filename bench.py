"""Headline benchmark: Mrays/s + FPS, 1080p hybrid SDF+DDA trace, 1024^3 world.

BASELINE.md config 3.  Builds the world on-device, renders an orbit
flythrough, and prints ONE JSON line on stdout:
  {"metric": ..., "value": Mrays/s, "unit": "Mrays/s", "vs_baseline": FPS/30}

vs_baseline is the fraction of the north-star gate (>=30 FPS interactive
flythrough; the reference publishes no numbers - BASELINE.md).  All
diagnostics go to stderr.  Knobs via env: BENCH_CUBE (default 10),
BENCH_W/BENCH_H (1920x1080), BENCH_FRAMES (8), BENCH_GI (0).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import orbit_path

    cube = int(os.environ.get("BENCH_CUBE", "10"))
    width = int(os.environ.get("BENCH_W", "1920"))
    height = int(os.environ.get("BENCH_H", "1080"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "8"))
    include_gi = os.environ.get("BENCH_GI", "0") == "1"

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(cube),
        render=dataclasses.replace(RenderConfig(), width=width,
                                   height=height),
    )
    dev = jax.devices()[0]
    log(f"device: {dev}, world {2**cube}^3, {width}x{height}, "
        f"gi={include_gi}")

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=include_gi)
    log(f"world build total: {time.time() - t0:.1f}s")

    size = ecfg.world.size_x
    cams = orbit_path(n_frames + 2,
                      center=np.array([size / 2, 0, size / 2], np.float32),
                      radius=size * 0.25,
                      height=min(ecfg.world.size_y * 0.8, 500.0),
                      look_target=np.array([size / 2, 100.0, size / 2],
                                           np.float32))

    render = jax.jit(lambda b, s, g, a, cam: pipeline.render_frame(
        b, s, g, a, cam, ecfg, include_gi=include_gi))

    def frame(cam_obj, prev_vp=None):
        cam = eng_mod.camera_arrays(cam_obj, jitter=(0.0, 0.0))
        return render(world.bits, world.sdf, world.gi, world.atlas, cam)

    # warmup / compile
    t0 = time.time()
    out = frame(cams[0])
    out.color.block_until_ready()
    log(f"compile+first frame: {time.time() - t0:.1f}s")
    out = frame(cams[1])
    out.color.block_until_ready()

    hit_frac = float(jnp.mean((out.depth < 1.0).astype(jnp.float32)))
    its_mean = None
    log(f"warm frame ok; hit_frac={hit_frac:.3f}")

    t0 = time.time()
    for i in range(n_frames):
        out = frame(cams[2 + i])
        out.color.block_until_ready()
    dt = time.time() - t0
    fps = n_frames / dt

    # Rays actually traced per frame: full-res primary + half-res primary +
    # half-res shadow (water/reflection lanes excluded - undercount is
    # conservative).
    rays_per_frame = width * height + 2 * (width // 2) * (height // 2)
    mrays = rays_per_frame * fps / 1e6

    log(f"{n_frames} frames in {dt:.2f}s -> {fps:.2f} FPS, "
        f"{mrays:.1f} Mrays/s")

    print(json.dumps({
        "metric": f"Mrays/s at {width}x{height} hybrid SDF+DDA trace "
                  f"({2**cube}^3 world, gi={'on' if include_gi else 'off'}, "
                  f"single chip)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fps / 30.0, 4),
        "extra": {"fps": round(fps, 3), "hit_frac": round(hit_frac, 4),
                  "frames": n_frames, "device": str(dev)},
    }))


if __name__ == "__main__":
    main()
