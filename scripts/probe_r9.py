"""Round-3 probe: can the half-res prepass TRACE be dropped?

probe_r8 showed primary tile-supersteps are nearly insensitive to start
tightness (17.4 -> 17.2 with temporal hints on top of minDist).  If that
insensitivity extends down to cascade-only starts, the ~150 ms half-res
prepass trace can be removed from the frame: the primary starts from the
(cheap) cascade, and shadows march from the PRIMARY's own hits.

Within-run A/Bs at 1280x800 / 1024^3, bench cadence (fast trace, checker):

  1. GI init: full vs strided (2,2) / (4,2)  [VERDICT #8]
  2. cascade coarse trace cost (stride-8-of-full-res lattice)
  3. primary from: minDist(prepass) / cascade-only / zero starts
  4. soft-shadow march from strided PRIMARY hits (the prepass shadow
     replacement) vs today's prepass-site march

Usage: python scripts/probe_r9.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    from rvgrt_tpu.render import pipeline, shading
    from rvgrt_tpu.scene.camera import Camera

    print(f"device={jax.devices()[0]}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    rcfg = dataclasses.replace(
        RenderConfig(), width=args.w, height=args.h,
        dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube), render=rcfg,
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=True,
                                     soft_shadow_stride=2),
        gi_straggler_budget=12)
    cfg, lcfg = ecfg.world, ecfg.lighting

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

    def mk_cam(i):
        ang = 0.35 * i
        fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                       np.float32)
        fwd /= np.linalg.norm(fwd)
        wup = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, wup)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        return eng_mod.camera_arrays(
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

    # ---------------- 1: GI init variants ----------------
    for st in ((1, 1), (2, 2), (4, 2)):
        t0 = time.time()
        g = gi_update.init_gi_strided(world.bits, world.sdf, ecfg,
                                      sky_y=S, table=T, stride=st)
        g.block_until_ready()
        float(jnp.sum(g[:8].astype(jnp.float32)))
        print(f"GI init stride {st}: {time.time() - t0:.1f}s", flush=True)

    # ---------------- 2-4: trace-stage variants ----------------
    cam = mk_cam(1)
    hh, hw = rcfg.half_height, rcfg.half_width

    def prepass_full(tbl, sdf, sky, cam):
        tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                    sky_y=sky)
        return pipeline.half_res_prepass(None, sdf, cfg, rcfg, lcfg, cam,
                                         trace_fn=tf, sky_y=sky)

    def cascade_only(tbl, sky, cam):
        tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                    sky_y=sky)
        return pipeline._cascade_start(tf, rcfg, cam, jnp.int32(0), hh)

    def primary(tbl, sky, cam, start_full, par):
        tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                    sky_y=sky)
        dx, dy, dz = pipeline._ray_dirs(cam, args.w, args.h,
                                        pixel_center=False)
        sel = lambda a: pipeline.checker_select(a, par)  # noqa: E731
        dx, dy, dz = sel(dx), sel(dy), sel(dz)
        start = sel(start_full)
        return tf(cam.pos[0] + jnp.zeros_like(dx), cam.pos[1], cam.pos[2],
                  dx, dy, dz, start)

    def shadow_from_primary(sdf, sky, res_px, res_py, res_pz, res_nx,
                            res_ny, res_nz, res_hit):
        # strided sites over the (H, W/2) checker buffer: every 4th row x
        # every 2nd col = 64K sites (the prepass-march site count)
        sub = lambda a: a[::4, ::2]  # noqa: E731
        return shading.soft_shadow_march(
            sub(res_px), sub(res_py), sub(res_pz), sub(res_nx),
            sub(res_ny), sub(res_nz), sub(res_hit), sdf, cfg, lcfg,
            sky_y=sky)

    prepass_j = jax.jit(prepass_full)
    cascade_j = jax.jit(cascade_only)
    primary_j = jax.jit(primary)
    shadow_j = jax.jit(shadow_from_primary)
    par0 = jax.device_put(jnp.int32(0))

    pre = timeit("prepass full (trace+shadow)", prepass_j, T, D, S, cam)
    cas = timeit("cascade-only coarse starts", cascade_j, T, S, cam)

    start_mindist = pipeline.min_dist_upsample(pre[0])[:args.h]
    start_cascade = pipeline.min_dist_upsample(
        jnp.maximum(cas - 0.0, 0.0))[:args.h]
    start_zero = jnp.zeros((args.h, args.w), jnp.float32)

    rb = timeit("primary (minDist starts)", primary_j, T, S, cam,
                start_mindist, par0)
    rc = timeit("primary (cascade starts)", primary_j, T, S, cam,
                start_cascade, par0)
    rz = timeit("primary (zero starts)", primary_j, T, S, cam,
                start_zero, par0)
    for name, r in (("minDist", rb), ("cascade", rc), ("zero", rz)):
        if r is None:
            continue
        st = float(jnp.mean(r.steps.astype(jnp.float32)))
        print(f"  {name}: tile-supersteps {st:.1f}", flush=True)
    if rb is not None and rc is not None:
        mis = int((np.asarray(rb.hit) != np.asarray(rc.hit)).sum())
        print(f"  cascade-vs-minDist hit mismatches: {mis}/"
              f"{np.asarray(rb.hit).size}", flush=True)

    if rc is not None:
        timeit("shadow march from primary hits", shadow_j, D, S,
               rc.px, rc.py, rc.pz, rc.nx, rc.ny, rc.nz, rc.hit)


if __name__ == "__main__":
    main()
