"""Round-2 probe C: where the headline frame's 1.75 s goes, and the
1-gather bilinear_shift history warp.

Within-run A/Bs at the headline operating point (1024^3, 1280x800, GI on,
temporal 3x upscale).  Only same-process numbers are load-bearing through
the tunnel (PERF.md).

  1. temporal upscale step: warp_taps = bilinear (4 gathers) vs
     bilinear_shift (1 gather + VPU shifts) vs nearest (1 gather);
  2. prepass decomposition: cascade alone, prepass primary alone, shadow
     alone, full pair - which half of the ~500 ms is the shadow?
  3. full-res primary + its/steps stats;
  4. GI update + GI composite;
  5. base frame fused vs the sum of its parts (schedule-lottery check).

Usage: python scripts/probe_r3.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    from rvgrt_tpu.gi import update as gi_update
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.trace import wavefront
    from rvgrt_tpu.upscale import temporal as up_temporal

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=args.w,
                                   height=args.h))
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"{args.w}x{args.h}", flush=True)

    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=True)
    print(f"world build (warm cache) {time.time() - t0:.1f}s", flush=True)

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
        print(f"{name:52s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    h, w = args.h, args.w
    sky_y = world.sky_y
    tbl = world.trace_table

    # ---- 5a. base frame (fused prepass+primary+shade), G-buffer out ----
    base_j = jax.jit(lambda b, s, g, a, t, sy: pipeline.render_frame(
        b, s, g, a, cam, ecfg, include_gi=False, sky_y=sy, table=t,
        return_gbuffer=True))
    out, gb = timeit("base frame (no GI) fused", base_j, world.bits,
                     world.sdf, world.gi, world.atlas, tbl, sky_y)

    # ---- 1. temporal upscale warp variants ----
    hist0 = up_temporal.init_state(h, w)
    # warm history: one step so conf > 0 (cold history shortcuts nothing,
    # but keep it representative)
    for mode in ("bilinear", "bilinear_shift", "nearest"):
        uj = jax.jit(lambda c, m, d, st, _m=mode: up_temporal.temporal_upscale(
            c, m, d, cam.jitter, st, warp_taps=_m))
        timeit(f"temporal upscale [{mode}]", uj, out.color, out.motion,
               out.depth, hist0)

    # ---- 2. prepass decomposition ----
    def trace_fn(ox, oy, oz, dx, dy, dz, t0_):
        return wavefront.trace(None, None, cfg, rcfg, ox, oy, oz,
                               dx, dy, dz, t0_, table=tbl, sky_y=sky_y)

    hw_, hh_ = rcfg.half_width, rcfg.half_height

    casc_j = jax.jit(lambda t, sy: pipeline._cascade_start(
        lambda *a: wavefront.trace(None, None, cfg, rcfg, *a, table=t,
                                   sky_y=sy), rcfg, cam, 0, hh_))
    start = timeit("cascade start (1/8 of half res)", casc_j, tbl, sky_y)

    def prep_primary(t, sy, st):
        dx, dy, dz = pipeline._ray_dirs(cam, hw_, hh_, pixel_center=True)
        r = wavefront.trace(None, None, cfg, rcfg,
                            cam.pos[0] + jnp.zeros_like(dx), cam.pos[1],
                            cam.pos[2], dx, dy, dz, st, table=t, sky_y=sy)
        return r

    pres = timeit("prepass primary only (cascade start)",
                  jax.jit(prep_primary), tbl, sky_y, start)
    print(f"    prepass-primary its mean "
          f"{float(jnp.mean(pres.its.astype(jnp.float32))):.1f} "
          f"steps mean {float(jnp.mean(pres.steps.astype(jnp.float32))):.1f}",
          flush=True)

    def prep_shadow(t, sy, hitb, px, py, pz, nx, ny, nz):
        from rvgrt_tpu.core import vecmath as vm
        sun = vm.splat(lcfg.sun_dir, hitb.shape)
        sh = pipeline._shadow_trace(
            lambda *a: wavefront.trace(None, None, cfg, rcfg, *a, table=t,
                                       sky_y=sy),
            hitb, (px, py, pz), (nx, ny, nz), sun, offset=1e-1)
        return sh

    timeit("prepass shadow only", jax.jit(prep_shadow), tbl, sky_y,
           pres.hit, pres.px, pres.py, pres.pz, pres.nx, pres.ny, pres.nz)

    prep_j = jax.jit(lambda t, sy: pipeline.half_res_prepass(
        None, None, cfg, rcfg, lcfg, cam, table=t, sky_y=sy))
    hd, _ = timeit("prepass pair (cascade+primary+shadow)", prep_j, tbl,
                   sky_y)

    # ---- 2b. soft-shadow prepass variants (SDF penumbra march) ----
    for stride in (1, 2):
        lsoft = dataclasses.replace(ecfg.lighting, soft_shadows=True,
                                    soft_shadow_stride=stride)
        sj = jax.jit(lambda b, s, t, sy, _l=lsoft: pipeline.half_res_prepass(
            b, s, cfg, rcfg, _l, cam, table=t, sky_y=sy))
        timeit(f"prepass pair [soft shadows, stride {stride}]", sj,
               world.bits, world.sdf, tbl, sky_y)

    # ---- 3. full-res primary ----
    def primary(t, sy, st):
        dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
        return wavefront.trace(None, None, cfg, rcfg,
                               cam.pos[0], cam.pos[1], cam.pos[2],
                               dx, dy, dz, st, table=t, sky_y=sy)

    startf = pipeline.min_dist_upsample(hd)
    r = timeit("full-res primary (minDist start)", jax.jit(primary), tbl,
               sky_y, startf)
    print(f"    primary its mean "
          f"{float(jnp.mean(r.its.astype(jnp.float32))):.1f} "
          f"steps mean {float(jnp.mean(r.steps.astype(jnp.float32))):.1f}",
          flush=True)

    # ---- 4. GI update + composite ----
    gj = jax.jit(lambda gi, b, s, a, t, sy, fr, off:
                 gi_update.update_gi(gi, b, s, a, ecfg, fr, off,
                                     sky_y=sy, table=t))
    timeit("GI update (derived window)", gj, world.gi, world.bits,
           world.sdf, world.atlas, tbl, sky_y, jnp.uint32(1), jnp.int32(0))

    comp_j = jax.jit(lambda c, g, s: pipeline.gi_composite(
        c, gb, g, s, ecfg))
    timeit("GI composite", comp_j, out.color, world.gi, world.sdf)

    print("done", flush=True)


if __name__ == "__main__":
    main()
