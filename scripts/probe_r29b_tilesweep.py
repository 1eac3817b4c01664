"""Round-5 probe: retirement-tile shape sweep under the fused superstep.

The fused Pallas superstep (probe_r29: 336.5 -> 316.8 ms primary, +6%)
changes the per-superstep cost structure: a Mosaic kernel launch +
VMEM I/O is a FIXED cost per (tile, superstep), so the round-3 tile
sweep (rows 20/25 best at cols 128, XLA body) may not hold - bigger
tiles amortize the launch at the price of tile-worst retirement.

One process, within-run: primary trace at 1280x800/1024^3 (bench
cadence, production starts) for {XLA, fused} x tile shapes.

Usage: python scripts/probe_r29b_tilesweep.py [--cube 10]
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
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device={jax.devices()[0]}", flush=True)
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    def timeit(name, f, *a, reps=args.reps):
        try:
            r = f(*a)
            jax.block_until_ready(r)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        except Exception as e:
            print(f"{name:44s} FAILED: {str(e)[:200]}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:44s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera
    from rvgrt_tpu.trace import wavefront

    base_r = dataclasses.replace(
        RenderConfig(), width=args.w, height=args.h,
        dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
        prepass_divisor=8, shadow_site_divisor=4, steps_per_check=1,
        gi_res_divisor=16)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube), render=base_r,
        lighting=dataclasses.replace(
            EngineConfig().lighting, soft_shadows=True,
            soft_shadow_stride=2))
    cfg = ecfg.world

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
    cam = eng_mod.camera_arrays(Camera(
        pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
        right=right.astype(np.float32), up=up.astype(np.float32)))

    sky_y = world.sky_y
    tbl = world.trace_table

    lc = ecfg.lighting
    hd, _ = jax.jit(lambda tb, sy: pipeline.half_res_prepass(
        None, world.sdf, cfg, base_r, lc, cam, table=tb, sky_y=sy))(
            tbl, sky_y)
    m = hd
    for ax in (0, 1):
        acc = m
        for dlt in (-1, 1, 2):
            acc = jnp.minimum(acc, pipeline._clamped_shift(m, dlt, ax))
        m = acc
    start = jnp.repeat(jnp.repeat(m, base_r.prepass_divisor, axis=0),
                       base_r.prepass_divisor, axis=1)
    jax.block_until_ready(start)

    def primary(rc):
        def f(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, args.w, args.h,
                                            pixel_center=False)
            return wavefront.trace(None, None, cfg, rc,
                                   cam.pos[0], cam.pos[1], cam.pos[2],
                                   dx, dy, dz, st, table=tb, sky_y=sy)
        return jax.jit(f)

    ref = None
    for rows, cols in ((20, 128), (20, 256), (40, 256), (50, 320),
                       (100, 640), (800, 1280)):
        for fused in (False, True):
            rc = dataclasses.replace(base_r, trace_tile_rows=rows,
                                     trace_tile_cols=cols,
                                     fused_superstep=fused)
            tag = f"rows{rows} cols{cols} {'fused' if fused else 'xla'}"
            r = timeit(f"primary [{tag}]", primary(rc), tbl, sky_y, start)
            if r is None:
                continue
            if ref is None:
                ref = r
            else:
                hd_ = int(np.sum(np.asarray(r.hit) != np.asarray(ref.hit)))
                if hd_:
                    print(f"    hit diff vs first: {hd_}", flush=True)
            print(f"    tile-steps {float(jnp.mean(r.steps)):.1f}",
                  flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
