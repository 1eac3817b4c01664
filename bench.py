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

    cube = int(os.environ.get("BENCH_CUBE", "10"))
    width = int(os.environ.get("BENCH_W", "1920"))
    height = int(os.environ.get("BENCH_H", "1080"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "8"))
    include_gi = os.environ.get("BENCH_GI", "0") == "1"
    # stage-5 operating point: render low-res + learned 3x upscale
    # (the reference's own 1280x800 -> DLSS -> 3840x2400 pipeline shape)
    upscale = os.environ.get("BENCH_UPSCALE", "0") == "1"

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

    # camera: above the terrain column at world center, panning in place
    # (a degenerate camera - inside rock or all-sky - benchmarks nothing)
    import math as _math

    from rvgrt_tpu.scene.camera import Camera
    from rvgrt_tpu.world import voxel_grid as vg

    size = ecfg.world.size_x
    cx, cz = size // 2, size // 2
    bits_np = np.asarray(world.bits).reshape(
        ecfg.world.size_z, ecfg.world.size_y, ecfg.world.size_x // 32)
    col = np.asarray(vg.unpack_bits_x(bits_np[cz]))[:, cx]
    solid_ys = np.where(col)[0]
    top = float(solid_ys.max()) if len(solid_ys) else 30.0
    cam_y = min(top + 12.0, ecfg.world.size_y - 2.0)
    log(f"terrain top at center: {top}, camera y: {cam_y}")

    def pan_cam(i):
        ang = 0.35 * i
        fwd = np.array([_math.cos(ang) * 0.87, -0.5, _math.sin(ang) * 0.87],
                       np.float32)
        fwd /= np.linalg.norm(fwd)
        wup = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, wup)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        return Camera(pos=np.array([cx, cam_y, cz], np.float32),
                      forward=fwd, right=right.astype(np.float32),
                      up=(up / np.linalg.norm(up)).astype(np.float32))

    cams = [pan_cam(i) for i in range(n_frames + 2)]

    up_net = up_params = history = None
    if upscale:
        from rvgrt_tpu.upscale import model as up_model

        ckpt = os.path.join(os.path.dirname(__file__),
                            "checkpoints", "upscaler.pkl")
        if os.path.exists(ckpt):
            up_net, up_params = up_model.load_checkpoint(ckpt)
            log(f"loaded trained upscaler from {ckpt}")
        else:
            up_net, up_params = up_model.init_params(
                jax.random.PRNGKey(0), height, width)
        history = jnp.zeros((height * up_model.SCALE,
                             width * up_model.SCALE, 3), jnp.float32)

    # GI frames dispatch as base + composite (two jits): the fused graph
    # hits XLA's slow-schedule mode (~2x) on TPU - see PERF.md
    def _base(b, s, g, a, cam, sky, tbl):
        return pipeline.render_frame(b, s, g, a, cam, ecfg,
                                     include_gi=False, sky_y=sky, table=tbl,
                                     return_gbuffer=include_gi)

    def _post(out, gb, g, s, occ, cam, hist):
        if include_gi:
            out = out._replace(color=pipeline.gi_composite(
                out.color, gb, g, s, ecfg, gi_occ=occ))
        if upscale:
            hi, _ = up_model.upscale(up_net, up_params, out.color,
                                     out.motion, out.depth, cam.jitter,
                                     hist)
            return out._replace(color=hi)
        return out

    base_j = jax.jit(_base)
    post_j = jax.jit(_post)

    def render(b, s, g, a, cam, occ, sky, tbl, hist):
        r = base_j(b, s, g, a, cam, sky, tbl)
        out, gb = r if include_gi else (r, None)
        if include_gi or upscale:
            return post_j(out, gb, g, s, occ, cam, hist)
        return out

    def frame(cam_obj, prev_vp=None):
        nonlocal_hist = frame.history
        cam = eng_mod.camera_arrays(cam_obj, jitter=(0.0, 0.0))
        out = render(world.bits, world.sdf, world.gi, world.atlas, cam,
                     world.gi_occ, world.sky_y, world.trace_table,
                     nonlocal_hist)
        if upscale:
            frame.history = out.color
        return out

    frame.history = history if upscale else jnp.zeros((1, 1, 3))

    def sync(out):
        # force a real device->host readback: block_until_ready alone can
        # return early through the remote-device tunnel
        return float(jnp.sum(out.depth))

    # warmup / compile
    t0 = time.time()
    out = frame(cams[0])
    sync(out)
    log(f"compile+first frame: {time.time() - t0:.1f}s")
    out = frame(cams[1])
    sync(out)

    # bench camera uses identity VP matrices, so depth = hit.pos.z for hits
    # and exactly 1.0 for misses
    hit_frac = float(jnp.mean((out.depth != 1.0).astype(jnp.float32)))
    log(f"warm frame ok; hit_frac={hit_frac:.3f}")

    t0 = time.time()
    for i in range(n_frames):
        out = frame(cams[2 + i])
        sync(out)
    dt = time.time() - t0
    fps = n_frames / dt

    # Rays actually traced per frame: full-res primary + half-res primary +
    # half-res shadow (water/reflection lanes excluded - undercount is
    # conservative).
    rays_per_frame = width * height + 2 * (width // 2) * (height // 2)
    mrays = rays_per_frame * fps / 1e6

    log(f"{n_frames} frames in {dt:.2f}s -> {fps:.2f} FPS, "
        f"{mrays:.1f} Mrays/s")

    op = (f"{width}x{height}+3x upscale" if upscale
          else f"{width}x{height}")
    print(json.dumps({
        "metric": f"Mrays/s at {op} hybrid SDF+DDA trace "
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
