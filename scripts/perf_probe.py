"""Within-run perf probe: dissect the frame cost structure on the real chip.

The device tunnel's throughput varies up to ~3x across runs (PERF.md), so
only same-process A/B comparisons are load-bearing.  This script builds one
world and times, in one process:

  1. the per-superstep floor: parked full-res traces with varying
     max_supersteps (slope = ns/lane/superstep, intercept = call overhead);
  2. each frame stage standalone (cascade / prepass / shadow / primary /
     GI gather / water pair);
  3. the full frame.

Usage:  python scripts/perf_probe.py [--cube 9 --w 1280 --h 720 --reps 5]
Everything prints to stdout as it measures.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=9)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--h", type=int, default=720)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--gi", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="its analysis + tile/steps knob sweeps")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import os
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
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"{args.w}x{args.h}", flush=True)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=args.gi)
    print(f"world build {time.time() - t0:.1f}s", flush=True)

    # camera above terrain center (same as bench.py)
    from rvgrt_tpu.world import voxel_grid as vg
    bits_np = np.asarray(world.bits).reshape(cfg.size_z, cfg.size_y,
                                             cfg.size_x // 32)
    col = np.asarray(vg.unpack_bits_x(bits_np[cfg.size_z // 2]))[
        :, cfg.size_x // 2]
    ys = np.where(col)[0]
    top = float(ys.max()) if len(ys) else 30.0
    cam_y = min(top + 12.0, cfg.size_y - 2.0)
    import math
    fwd = np.array([math.cos(0.5) * 0.87, -0.5, math.sin(0.5) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup); right /= np.linalg.norm(right)
    up = np.cross(fwd, right); up /= np.linalg.norm(up)
    from rvgrt_tpu.scene.camera import Camera
    cam_obj = Camera(pos=np.array([cfg.size_x / 2, cam_y, cfg.size_z / 2],
                                  np.float32),
                     forward=fwd, right=right.astype(np.float32),
                     up=up.astype(np.float32))
    cam = eng_mod.camera_arrays(cam_obj)

    def timeit(name, fn, *a, reps=args.reps, raw=False, **kw):
        f = fn if raw or isinstance(fn, jax.stages.Wrapped) \
            else jax.jit(fn)
        r = f(*a, **kw)
        jax.block_until_ready(r)
        # force real completion via a tiny readback
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf).astype(jnp.float32)) if leaf.size else None
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a, **kw)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:42s} {med:9.1f} ms   (min {min(ts):.1f})", flush=True)
        return med

    table = world.trace_table
    sky_y = world.sky_y
    h, w = args.h, args.w

    # ---- 1. superstep floor: parked rays (start OOB), vary cap ----
    parked = dict(ox=jnp.full((h, w), -10.0, jnp.float32),
                  oy=jnp.full((h, w), -10.0, jnp.float32),
                  oz=jnp.full((h, w), -10.0, jnp.float32))
    ones = jnp.ones((h, w), jnp.float32)
    for cap in (2, 8, 32):
        rc = dataclasses.replace(rcfg, max_supersteps=cap)

        def parked_trace(ox, oy, oz, tbl):
            return wavefront.trace(None, None, cfg, rc, ox, oy, oz,
                                   ones, ones * 0, ones * 0, ones * 0,
                                   table=tbl).its
        timeit(f"parked full-res trace (cap={cap})",
               functools.partial(jax.jit(parked_trace)),
               parked["ox"], parked["oy"], parked["oz"], table)

    # ---- 2. stages ----
    def cascade(tbl, sy):
        return pipeline._cascade_start(
                                       pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                                             sky_y=sy), rcfg, cam, 0, rcfg.half_height)
    timeit("cascade start (1/8 res)", jax.jit(cascade), table, sky_y)

    def prepass(tbl, sy):
        return pipeline.half_res_prepass(None, None, cfg, rcfg, lcfg, cam,
                                         table=tbl, sky_y=sy)
    timeit("half-res prepass (primary+shadow)", jax.jit(prepass), table,
           sky_y)

    hd, hs = jax.jit(prepass)(table, sky_y)
    start = pipeline.min_dist_upsample(hd)

    def primary(tbl, sy, st):
        dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
        return wavefront.trace(None, None, cfg, rcfg,
                               cam.pos[0], cam.pos[1], cam.pos[2],
                               dx, dy, dz, st, table=tbl, sky_y=sy).its
    timeit("full-res primary (minDist start)", jax.jit(primary), table,
           sky_y, start)
    timeit("full-res primary (start=0)", jax.jit(primary), table, sky_y,
           start * 0)

    # ---- its / tile-straggler analysis + knob sweeps ----
    if args.sweep:
        def prepass_its(tbl, sy):
            dx, dy, dz = pipeline._ray_dirs(cam, rcfg.half_width,
                                            rcfg.half_height,
                                            pixel_center=True)
            st = pipeline._cascade_start(
                                         pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                                               sky_y=sy), rcfg, cam, 0, rcfg.half_height)
            res = wavefront.trace(None, None, cfg, rcfg,
                                  cam.pos[0], cam.pos[1], cam.pos[2],
                                  dx, dy, dz, st, table=tbl, sky_y=sy)
            sun = jnp.asarray(lcfg.sun_dir)
            sox = jnp.where(res.hit, res.px + res.nx * 0.1, -10.0)
            soy = jnp.where(res.hit, res.py + res.ny * 0.1, -10.0)
            soz = jnp.where(res.hit, res.pz + res.nz * 0.1, -10.0)
            sh = wavefront.trace(None, None, cfg, rcfg, sox, soy, soz,
                                 sun[0], sun[1], sun[2],
                                 jnp.zeros_like(sox), table=tbl, sky_y=sy)
            return res.its, sh.its

        p_its, s_its = jax.jit(prepass_its)(table, sky_y)
        for name, its in (("prepass primary", p_its),
                          ("prepass shadow", s_its)):
            a = np.asarray(its)
            th, tw = 20, 128
            hh, ww = a.shape[0] // th * th, a.shape[1] // tw * tw
            tiles = a[:hh, :ww].reshape(hh // th, th, ww // tw, tw)
            tmax = tiles.max(axis=(1, 3)).ravel()
            print(f"{name}: its mean {a.mean():.1f} p90 "
                  f"{np.percentile(a, 90):.0f} max {a.max()}; tile-max "
                  f"mean {tmax.mean():.1f} p90 "
                  f"{np.percentile(tmax, 90):.0f} max {tmax.max()} "
                  f"(straggler waste {tmax.mean() / max(a.mean(), 1):.1f}x)",
                  flush=True)

        for rows in (8, 12, 20, 40):
            rc = dataclasses.replace(rcfg, trace_tile_rows=rows)

            def prim_r(tbl, sy, st, rc=rc):
                dx, dy, dz = pipeline._ray_dirs(cam, w, h,
                                                pixel_center=False)
                return wavefront.trace(None, None, cfg, rc,
                                       cam.pos[0], cam.pos[1], cam.pos[2],
                                       dx, dy, dz, st, table=tbl,
                                       sky_y=sy).its
            timeit(f"primary tile_rows={rows}", jax.jit(prim_r), table,
                   sky_y, start)
        for spc in (1, 2, 4):
            rc = dataclasses.replace(rcfg, steps_per_check=spc)

            def prim_k(tbl, sy, st, rc=rc):
                dx, dy, dz = pipeline._ray_dirs(cam, w, h,
                                                pixel_center=False)
                return wavefront.trace(None, None, cfg, rc,
                                       cam.pos[0], cam.pos[1], cam.pos[2],
                                       dx, dy, dz, st, table=tbl,
                                       sky_y=sy).its
            timeit(f"primary steps_per_check={spc}", jax.jit(prim_k),
                   table, sky_y, start)
        for rows in (8, 10, 12, 15, 18, 20):
            rc = dataclasses.replace(rcfg, trace_tile_rows=rows)

            def prep_r(tbl, sy, rc=rc):
                return pipeline.half_res_prepass(None, None, cfg, rc, lcfg,
                                                 cam, table=tbl, sky_y=sy)
            timeit(f"prepass tile_rows={rows}", jax.jit(prep_r), table,
                   sky_y, reps=5)

            # true work: sum over tiles of the supersteps each tile ran
            def prep_steps(tbl, sy, rc=rc):
                dx, dy, dz = pipeline._ray_dirs(cam, rcfg.half_width,
                                                rcfg.half_height,
                                                pixel_center=True)
                st = pipeline._cascade_start(
                                             pipeline.make_trace_fn(None, None, cfg, rc, table=tbl,
                                                                   sky_y=sy), rc, cam, 0, rcfg.half_height)
                res = wavefront.trace(None, None, cfg, rc,
                                      cam.pos[0], cam.pos[1], cam.pos[2],
                                      dx, dy, dz, st, table=tbl, sky_y=sy)
                sun = jnp.asarray(lcfg.sun_dir)
                sox = jnp.where(res.hit, res.px + res.nx * 0.1, -10.0)
                soy = jnp.where(res.hit, res.py + res.ny * 0.1, -10.0)
                soz = jnp.where(res.hit, res.pz + res.nz * 0.1, -10.0)
                sh = wavefront.trace(None, None, cfg, rc, sox, soy, soz,
                                     sun[0], sun[1], sun[2],
                                     jnp.zeros_like(sox), table=tbl,
                                     sky_y=sy)
                return res.steps, sh.steps

            ps, ss = jax.jit(prep_steps)(table, sky_y)
            hh2 = rcfg.half_height // rows * rows
            lanes = rows * 128
            tp = np.asarray(ps)[:hh2:rows, ::128]
            ts = np.asarray(ss)[:hh2:rows, ::128]
            print(f"  rows={rows}: primary tile-steps sum {tp.sum()} "
                  f"(lane-steps {tp.sum() * lanes / 1e6:.0f}M), shadow "
                  f"{ts.sum()} ({ts.sum() * lanes / 1e6:.0f}M)", flush=True)
        # correctness: the fast tile window must be bit-identical
        import jax.numpy as jnp2
        d12, s12 = jax.jit(lambda tbl, sy: pipeline.half_res_prepass(
            None, None, cfg, dataclasses.replace(rcfg, trace_tile_rows=15),
            lcfg, cam, table=tbl, sky_y=sy))(table, sky_y)
        d20, s20 = jax.jit(lambda tbl, sy: pipeline.half_res_prepass(
            None, None, cfg, dataclasses.replace(rcfg, trace_tile_rows=20),
            lcfg, cam, table=tbl, sky_y=sy))(table, sky_y)
        print("prepass rows15 vs rows20 identical:",
              bool(jnp2.all(d12 == d20)), bool(jnp2.all(s12 == s20)),
              flush=True)

        # in-frame shape: traced hy0, halo-padded hrows
        for rows in (12, 15, 20):
            rc = dataclasses.replace(rcfg, trace_tile_rows=rows)
            hneed = h // 2 + 2
            hrows = -(-hneed // rows) * rows

            def prep_f(tbl, sy, hy0, rc=rc, hrows=hrows):
                return pipeline.half_res_prepass(None, None, cfg, rc, lcfg,
                                                 cam, hy0=hy0, hrows=hrows,
                                                 table=tbl, sky_y=sy)
            timeit(f"prepass in-frame shape rows={rows} hrows={hrows}",
                   jax.jit(prep_f), table, sky_y,
                   jnp.asarray(-1, jnp.int32), reps=5)

        for rows, spc in ((20, 2), (12, 1), (8, 1)):
            ec = dataclasses.replace(
                ecfg, render=dataclasses.replace(
                    rcfg, trace_tile_rows=rows, steps_per_check=spc))

            def fr(bits, sdf, gi, atlas, tbl, sy, ec=ec):
                return pipeline.render_frame(bits, sdf, gi, atlas, cam, ec,
                                             include_gi=args.gi, sky_y=sy,
                                             table=tbl).color
            timeit(f"frame rows={rows} spc={spc}", jax.jit(fr), world.bits,
                   world.sdf, world.gi, world.atlas, table, sky_y)

    if args.gi:
        def gi_gather(tbl, sy, st, gi, sdf):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            res = wavefront.trace(None, None, cfg, rcfg,
                                  cam.pos[0], cam.pos[1], cam.pos[2],
                                  dx, dy, dz, st, table=tbl, sky_y=sy)
            return pipeline.gather_gi_image(res, gi, sdf, cfg, rcfg, lcfg)
        timeit("primary + GI gather", jax.jit(gi_gather), table, sky_y,
               start, world.gi, world.sdf)

        # split-dispatch GI frame: trace+direct in one jit, GI gather +
        # composite in a second — two smaller graphs, each more likely to
        # land the compiler's fast schedule than the fused GI frame
        base = jax.jit(lambda bits, sdf, gi, atlas, sy, tbl:
                       pipeline.render_frame(bits, sdf, gi, atlas, cam,
                                             ecfg, include_gi=False,
                                             sky_y=sy, table=tbl))

        def gb(tbl, sy):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            res = wavefront.trace(None, None, cfg, rcfg,
                                  cam.pos[0], cam.pos[1], cam.pos[2],
                                  dx, dy, dz, start, table=tbl, sky_y=sy)
            return res

        gbj = jax.jit(gb)

        def gi_pass(res, gi, sdf, color):
            ir, ig, ib = pipeline.gather_gi_image(res, gi, sdf, cfg, rcfg,
                                                  lcfg)
            from rvgrt_tpu.world import atlas as atlas_mod2
            from rvgrt_tpu.core import vecmath as vm2
            alb = vm2.v3(*atlas_mod2.sample_texture(
                world.atlas, res.uv_u, res.uv_v, res.px, res.py, res.pz))
            ind = vm2.mul(vm2.v3(ir, ig, ib),
                          vm2.scale(alb, lcfg.gi_strength))
            return color + jnp.stack(ind, -1) * res.hit[..., None]

        gij = jax.jit(gi_pass)

        def split_frame(bits, sdf, gi, atlas, tbl, sy):
            out = base(bits, sdf, gi, atlas, sy, tbl)
            res = gbj(tbl, sy)
            return gij(res, gi, sdf, out.color)

        # note: re-traces the primary (the honest version would return the
        # G-buffer from the base frame); counts as an upper bound
        timeit("split GI frame (base + retrace + gi)", split_frame,
               world.bits, world.sdf, world.gi, world.atlas, table, sky_y,
               raw=True)
        # honest-split decomposition: base alone + gi-composite alone
        out0 = base(world.bits, world.sdf, world.gi, world.atlas, sky_y,
                    table)
        res0 = gbj(table, sky_y)
        timeit("  base frame (gi off) alone", base, world.bits, world.sdf,
               world.gi, world.atlas, sky_y, table)
        timeit("  gi composite alone (given G-buffer)", gij, res0,
               world.gi, world.sdf, out0.color)

    def frame(bits, sdf, gi, atlas, tbl, sy):
        return pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                     include_gi=args.gi, sky_y=sy,
                                     table=tbl).color
    timeit("full frame", jax.jit(frame), world.bits, world.sdf, world.gi,
           world.atlas, table, sky_y)


if __name__ == "__main__":
    main()
