"""Tracer micro-sweep at the stage-5 operating point.

The primary trace (~410 ms) is now the largest frame stage.  Within-run
A/Bs over the tracer's cadence knobs, on the primary full-res trace with
the production min-2x2 start:

  * dda_substeps in {2, 4, 6, 8}: DDA iterations run against one gathered
    4x2x4 brick word (more = fewer gathers, more masked VPU per superstep);
  * steps_per_check in {1, 2, 4}: supersteps between tile-convergence
    checks;
  * sdf_probe_interval in {8, 16}: reference uses 8 (every 8th DDA step
    re-probes the SDF; 16 halves probe supersteps, longer DDA runs);
    NOTE interval 16 changes `its`/jump behavior vs the reference - a
    perf observation, not a parity-safe default;
  * dist_bias in {8, 4}: a tighter conservative start (reference uses 8);
    reports hit/normal disagreements vs bias 8 (NOT image-safe unless 0).

Usage: python scripts/probe_r6.py [--cube 10 --w 1280 --h 800 --reps 3]
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

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.trace import wavefront

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=args.w,
                                   height=args.h))
    cfg, rcfg = ecfg.world, ecfg.render
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"{args.w}x{args.h}", flush=True)

    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)
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
    from rvgrt_tpu.scene.camera import Camera
    fwd = np.array([math.cos(0.5) * 0.87, -0.5, math.sin(0.5) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup); right /= np.linalg.norm(right)
    up = np.cross(fwd, right); up /= np.linalg.norm(up)
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
        print(f"{name:52s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    h, w = args.h, args.w
    sky_y = world.sky_y
    tbl = world.trace_table

    # production start distances
    pre_j = jax.jit(lambda tb, sy: pipeline.half_res_prepass(
        None, world.sdf, cfg, rcfg, ecfg.lighting, cam, table=tb, sky_y=sy))
    hd, _ = pre_j(tbl, sky_y)
    start = pipeline.min_dist_upsample(hd)

    def primary(rc):
        def f(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            return wavefront.trace(None, None, cfg, rc,
                                   cam.pos[0], cam.pos[1], cam.pos[2],
                                   dx, dy, dz, st, table=tb, sky_y=sy)
        return jax.jit(f)

    res0 = timeit("primary [defaults: sub4 chk2 probe8]", primary(rcfg),
                  tbl, sky_y, start)
    print(f"    mean its {float(jnp.mean(res0.its)):.1f} "
          f"tile-steps {float(jnp.mean(res0.steps)):.1f}", flush=True)

    for sub in (2, 6, 8):
        rc = dataclasses.replace(rcfg, dda_substeps=sub)
        r = timeit(f"primary [substeps={sub}]", primary(rc), tbl, sky_y,
                   start)
        print(f"    tile-steps {float(jnp.mean(r.steps)):.1f}", flush=True)

    for chk in (1, 4):
        rc = dataclasses.replace(rcfg, steps_per_check=chk)
        r = timeit(f"primary [steps_per_check={chk}]", primary(rc), tbl,
                   sky_y, start)
        print(f"    tile-steps {float(jnp.mean(r.steps)):.1f}", flush=True)

    rc = dataclasses.replace(rcfg, sdf_probe_interval=16)
    r = timeit("primary [probe_interval=16]", primary(rc), tbl, sky_y,
               start)
    print(f"    tile-steps {float(jnp.mean(r.steps)):.1f}", flush=True)

    # tighter conservative start (the same prepass, 4 voxels less bias:
    # min-filter commutes with +const, so start+4 IS the bias-4 start)
    start4 = start + 4.0
    r4 = timeit("primary [dist_bias=4 via start+4]", primary(rcfg), tbl,
                sky_y, start4)
    dis = int(np.sum(np.asarray(r4.hit) != np.asarray(res0.hit)))
    ndis = int(np.sum((np.asarray(r4.nx) != np.asarray(res0.nx))
                      | (np.asarray(r4.ny) != np.asarray(res0.ny))
                      | (np.asarray(r4.nz) != np.asarray(res0.nz))))
    print(f"    tile-steps {float(jnp.mean(r4.steps)):.1f}; vs bias-8: "
          f"hit diff {dis}/1M, normal diff {ndis}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
