"""Round-2 probe C: straggler-respite budget sweep at the operating point.

Within-run A/B (only same-process numbers are load-bearing through the
tunnel, PERF.md): prepass pair + full-res primary at 1280x800/1024^3 with
straggler_budget in {0, 12, 16, 24, 32} at the production cap (0.25).
Also verifies hit-fraction consistency vs single-phase on-device.

Usage: python scripts/probe_straggler.py [--cube 10 --w 1280 --h 800]
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

    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=False)
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

    def timeit(name, f, *a, reps=args.reps):
        r = f(*a)
        jax.block_until_ready(r)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:54s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    h, w = args.h, args.w
    sky_y = world.sky_y

    ref_hits = None
    for budget in (0, 12, 16, 24, 32):
        rc = dataclasses.replace(rcfg0, straggler_budget=budget)

        def prepass(t, sy, _rc=rc):
            return pipeline.half_res_prepass(None, None, cfg, _rc, lcfg,
                                             cam, table=t, sky_y=sy)

        def primary(t, sy, st, _rc=rc):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            r = wavefront.trace(None, None, cfg, _rc,
                                cam.pos[0], cam.pos[1], cam.pos[2],
                                dx, dy, dz, st, table=t, sky_y=sy)
            return r.hit, r.its

        pj = jax.jit(prepass)
        hd, _ = pj(world.trace_table, sky_y)
        timeit(f"prepass pair [budget={budget}]", pj,
               world.trace_table, sky_y)
        start = pipeline.min_dist_upsample(hd)
        hit, its = timeit(f"full-res primary [budget={budget}]",
                          jax.jit(primary), world.trace_table, sky_y, start)
        hf = float(jnp.mean(hit.astype(jnp.float32)))
        print(f"    hit_frac={hf:.5f} mean_its="
              f"{float(jnp.mean(its.astype(jnp.float32))):.1f}", flush=True)
        if budget == 0:
            ref_hits = hit
        else:
            diff = int(jnp.sum(hit != ref_hits))
            print(f"    hit flags vs single-phase: {diff} differ", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
