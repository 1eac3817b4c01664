"""Round-2 probe D: tile-shape / steps_per_check sweep with lane-step
normalization.

PERF.md documents a bimodal XLA scheduler (~11 vs ~22 ns/lane-step).
This probe times the prepass-primary, prepass-shadow and full-res primary
traces at several tile shapes WITHIN one run and divides by the true work
(sum over lanes of the tile superstep count, from TraceResult.steps) to
read each config's ns/lane-step directly - separating schedule luck from
actual work changes.

Usage: python scripts/probe_sched.py [--cube 10 --w 1280 --h 800]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=10)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--h", type=int, default=800)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.trace import wavefront

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=args.w,
                                   height=args.h))
    cfg, rcfg0, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"{args.w}x{args.h}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=False)
    print(f"world build {time.time() - t0:.1f}s", flush=True)

    cx, cz = cfg.size_x // 2, cfg.size_z // 2

    @jax.jit
    def terrain_top(bits):
        vol = bits.reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)
        word = vol[cz, :, cx // 32]
        solid = (word >> jnp.uint32(cx % 32)) & jnp.uint32(1)
        return jnp.where(
            solid.any(),
            cfg.size_y - 1 - jnp.argmax(solid[::-1]).astype(jnp.int32),
            30).astype(jnp.float32)

    cam_y = min(float(terrain_top(world.bits)) + 12.0, cfg.size_y - 2.0)
    fwd = np.array([math.cos(0.5) * 0.87, -0.5, math.sin(0.5) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup); right /= np.linalg.norm(right)
    up = np.cross(fwd, right); up /= np.linalg.norm(up)
    from rvgrt_tpu.scene.camera import Camera
    cam = eng_mod.camera_arrays(Camera(
        pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
        right=right.astype(np.float32), up=up.astype(np.float32)))

    h, w = args.h, args.w
    sky_y = world.sky_y

    def timed(name, f, *a, reps=args.reps):
        r = f(*a)
        jax.block_until_ready(r)
        float(jnp.sum(jax.tree.leaves(r)[0]).astype(jnp.float32))
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            float(jnp.sum(jax.tree.leaves(r)[0]).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        return sorted(ts)[len(ts) // 2], r

    # ---- full-res primary: tile-shape x steps_per_check sweep ----
    # start from the real prepass so work matches the production frame
    pj = jax.jit(lambda t, sy: pipeline.half_res_prepass(
        None, None, cfg, rcfg0, lcfg, cam, table=t, sky_y=sy))
    hd, _ = pj(world.trace_table, sky_y)
    start = pipeline.min_dist_upsample(hd)

    for rows, cols, k in ((20, 128, 2), (8, 128, 2), (10, 128, 2),
                          (16, 128, 2), (32, 128, 2), (20, 256, 2),
                          (20, 128, 4), (8, 128, 4)):
        rc = dataclasses.replace(rcfg0, trace_tile_rows=rows,
                                 trace_tile_cols=cols, steps_per_check=k)

        def primary(t, sy, st, _rc=rc):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            r = wavefront.trace(None, None, cfg, _rc,
                                cam.pos[0], cam.pos[1], cam.pos[2],
                                dx, dy, dz, st, table=t, sky_y=sy)
            return r.steps

        ms, steps = timed(f"primary r{rows} c{cols} k{k}",
                          jax.jit(primary), world.trace_table, sky_y, start)
        lane_steps = float(jnp.sum(steps.astype(jnp.float64)))
        print(f"primary rows={rows:3d} cols={cols} k={k}: {ms:7.1f} ms, "
              f"{lane_steps/1e6:6.1f} M lane-steps, "
              f"{ms*1e6/lane_steps:5.2f} ns/lane-step", flush=True)

    # ---- prepass pair, same sweep (its own shape: 640x400) ----
    for rows, cols, k in ((20, 128, 2), (8, 128, 2), (16, 128, 2),
                          (25, 128, 2), (20, 128, 4)):
        rc = dataclasses.replace(rcfg0, trace_tile_rows=rows,
                                 trace_tile_cols=cols, steps_per_check=k)

        def prepass(t, sy, _rc=rc):
            hd_, sh_ = pipeline.half_res_prepass(None, None, cfg, _rc,
                                                 lcfg, cam, table=t,
                                                 sky_y=sy)
            return hd_ + sh_

        ms, _ = timed(f"prepass r{rows} k{k}", jax.jit(prepass),
                      world.trace_table, sky_y)
        print(f"prepass rows={rows:3d} cols={cols} k={k}: {ms:7.1f} ms",
              flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
