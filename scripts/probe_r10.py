"""Round-3 probe: prepass_divisor ladder + strided GI init (warm).

Within-run A/Bs at 1280x800 / 1024^3, bench cadence: the prepass at
divisor 2 (reference) / 4 / 8, each followed by the primary trace started
from ITS conservative upsample - the end-to-end (prepass + primary) pair
decides the bench default.  GI init variants timed WARM (second call)
to exclude compile.

Usage: python scripts/probe_r10.py [--cube 10]
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

    from rvgrt_tpu.config import (EngineConfig, LightingConfig, RenderConfig,
                                  WorldConfig)
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.gi import update as gi_update
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera

    print(f"device={jax.devices()[0]}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    def rcfg_d(d):
        return dataclasses.replace(
            RenderConfig(), width=args.w, height=args.h,
            dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
            prepass_divisor=d)

    lcfg = dataclasses.replace(LightingConfig(), soft_shadows=True,
                               soft_shadow_stride=2)
    ecfg = EngineConfig(world=WorldConfig().with_cube(args.cube),
                        render=rcfg_d(2), lighting=lcfg,
                        gi_straggler_budget=12)
    cfg = ecfg.world

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=False)
    print(f"world build {time.time() - t0:.1f}s", flush=True)
    T, D, S = world.trace_table, world.sdf, world.sky_y

    size = cfg.size_x
    cx, cz = size // 2, size // 2

    @jax.jit
    def terrain_top(bits):
        vol = bits.reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)
        word = vol[cz, :, cx // 32]
        solid = (word >> jnp.uint32(cx % 32)) & jnp.uint32(1)
        return jnp.where(solid.any(),
                         cfg.size_y - 1
                         - jnp.argmax(solid[::-1]).astype(jnp.int32),
                         30).astype(jnp.float32)

    cam_y = min(float(terrain_top(world.bits)) + 12.0, cfg.size_y - 2.0)
    ang = 0.35
    fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    cam = eng_mod.camera_arrays(
        Camera(pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
               right=right.astype(np.float32),
               up=(up / np.linalg.norm(up)).astype(np.float32)))

    def timeit(name, f, *a, reps=args.reps):
        try:
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        except Exception as e:
            print(f"{name:46s} FAILED: {str(e)[:240]}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        print(f"{name:46s} {sorted(ts)[len(ts) // 2]:9.1f} ms  "
              f"(min {min(ts):.1f})", flush=True)
        return r

    # ---- GI init, warm ----
    for st in ((1, 1), (2, 2), (4, 2)):
        g = gi_update.init_gi_strided(world.bits, world.sdf, ecfg,
                                      sky_y=S, table=T, stride=st)
        g.block_until_ready()
        t0 = time.time()
        g = gi_update.init_gi_strided(world.bits, world.sdf, ecfg,
                                      sky_y=S, table=T, stride=st)
        g.block_until_ready()
        float(jnp.sum(g[:8].astype(jnp.float32)))
        print(f"GI init stride {st} (warm): {time.time() - t0:.1f}s",
              flush=True)

    # ---- prepass divisor ladder + primary ----
    par0 = jax.device_put(jnp.int32(0))
    base_hits = None
    for d in (2, 4, 8):
        rc = rcfg_d(d)

        def prepass(tbl, sdf, sky, cam, rc=rc):
            tf = pipeline.make_trace_fn(None, None, cfg, rc, table=tbl,
                                        sky_y=sky)
            hd, hs = pipeline.half_res_prepass(None, sdf, cfg, rc, lcfg,
                                               cam, trace_fn=tf, sky_y=sky)
            start = pipeline._min_dist_upsample_slab(
                jnp.pad(hd, ((1, 1), (0, 0)), mode="edge"), args.h, d=d)
            shadow = pipeline._bilinear_upsample_slab(
                jnp.pad(hs, ((1, 1), (0, 0)), mode="edge"), args.h, d=d)
            return start, shadow

        def primary(tbl, sky, cam, start_full, par, rc=rc):
            tf = pipeline.make_trace_fn(None, None, cfg, rc, table=tbl,
                                        sky_y=sky)
            dx, dy, dz = pipeline._ray_dirs(cam, args.w, args.h,
                                            pixel_center=False)
            sel = lambda a: pipeline.checker_select(a, par)  # noqa: E731
            return tf(cam.pos[0] + jnp.zeros_like(sel(dx)), cam.pos[1],
                      cam.pos[2], sel(dx), sel(dy), sel(dz),
                      sel(start_full))

        pre_j = jax.jit(prepass)
        pri_j = jax.jit(primary)
        r = timeit(f"prepass d{d} (trace+shadow+upsample)", pre_j, T, D, S,
                   cam)
        if r is None:
            continue
        start = r[0]
        rp = timeit(f"primary d{d} starts", pri_j, T, S, cam, start, par0)
        if rp is not None:
            st = float(jnp.mean(rp.steps.astype(jnp.float32)))
            hits = np.asarray(rp.hit)
            if base_hits is None:
                base_hits = hits
                mis = 0
            else:
                mis = int((hits != base_hits).sum())
            print(f"  d{d}: tile-supersteps {st:.1f}, hit mismatches "
                  f"vs d2: {mis}/{hits.size}", flush=True)


if __name__ == "__main__":
    main()
