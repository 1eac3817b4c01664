"""Round-2 session-2 probe: schedule sweep + warp A/B + coherent starts.

Within-run A/Bs at the stage-5 operating point (1280x800, 1024^3).  All
measurements one process, one world build (the tunnel varies ~3x across
runs; only same-process ratios are load-bearing - PERF.md).

  1. stage breakdown baseline (cascade / prepass pair / primary / GI
     update / GI composite / temporal upscale);
  2. trace_tile_rows sweep at the stage-5 shapes - the schedule lottery
     (PERF.md) was only swept at 720p; 1280x800 graphs may land the slow
     (~22 ns/lane-step) mode with the 720p-tuned default;
  3. temporal-upscale history warp: bilinear (4 gathers) vs bilinear_shift
     (1 gather + output-space shifts) vs nearest - time and agreement;
  4. coherent plane starts: where the 4 half-res prepass samples around a
     full-res ray hit the SAME voxel-face plane, the ray's intersection
     with that plane is an analytic, near-exact start distance; interior
     tiles then converge in ~2 supersteps instead of paying the tile-worst
     ~42 (the measured 4-5x straggler tax).  Reports time, mean its, mean
     tile supersteps, and exactness (hit agreement + |t| error) vs the
     min-2x2 baseline.

Usage: python scripts/probe_r4.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    p.add_argument("--skip", default="", help="comma list: sweep,warp,coh")
    args = p.parse_args()
    skip = set(args.skip.split(","))

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

    def pan_cam(i):
        ang = 0.35 * i + 0.5
        fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                       np.float32)
        fwd /= np.linalg.norm(fwd)
        wup = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, wup); right /= np.linalg.norm(right)
        up = np.cross(fwd, right); up /= np.linalg.norm(up)
        return eng_mod.camera_arrays(Camera(
            pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
            right=right.astype(np.float32), up=up.astype(np.float32)))

    cam = pan_cam(0)

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

    # ---- 1. baseline stage breakdown ----
    def mk(rc):
        def cascade(tb, sy):
            tf = pipeline.make_trace_fn(None, None, cfg, rc, table=tb,
                                        sky_y=sy)
            return pipeline._cascade_start(tf, rc, cam, 0, rc.half_height)

        def prepass(tb, sy):
            return pipeline.half_res_prepass(None, None, cfg, rc, lcfg,
                                             cam, table=tb, sky_y=sy)

        def primary(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            r = wavefront.trace(None, None, cfg, rc,
                                cam.pos[0], cam.pos[1], cam.pos[2],
                                dx, dy, dz, st, table=tb, sky_y=sy)
            return r
        return jax.jit(cascade), jax.jit(prepass), jax.jit(primary)

    cas_j, pre_j, pri_j = mk(rcfg)
    timeit("cascade (1/8 res)", cas_j, tbl, sky_y)
    hd, hs = pre_j(tbl, sky_y)
    timeit("prepass pair (1/2 res)", pre_j, tbl, sky_y)
    start = pipeline.min_dist_upsample(hd)
    res0 = timeit("primary (min2x2 start)", pri_j, tbl, sky_y, start)
    print(f"    primary mean its {float(jnp.mean(res0.its)):.1f}  "
          f"mean tile-steps {float(jnp.mean(res0.steps)):.1f}", flush=True)

    gi_j = jax.jit(lambda g, bi, sd, at, tb, sy, fr, off:
                   gi_update.update_gi(g, bi, sd, at, ecfg, fr, off,
                                       sky_y=sy, table=tb))
    timeit("GI update (derived window)", gi_j, world.gi, world.bits,
           world.sdf, world.atlas, tbl, sky_y, jnp.uint32(1), jnp.int32(0))

    base_j = jax.jit(lambda bi, sd, g, at, tb, sy: pipeline.render_frame(
        bi, sd, g, at, cam, ecfg,
        include_gi=False, sky_y=sy, table=tb, return_gbuffer=True))
    out, gb = base_j(world.bits, world.sdf, world.gi, world.atlas, tbl,
                     sky_y)
    timeit("base frame (no GI, fused prepass+primary+shade)", base_j,
           world.bits, world.sdf, world.gi, world.atlas, tbl, sky_y)
    comp_j = jax.jit(lambda c, gbb, g, sd: pipeline.gi_composite(
        c, gbb, g, sd, ecfg))
    timeit("GI composite (1/4-res cones)", comp_j, out.color, gb, world.gi,
           world.sdf)

    # ---- 2. tile-rows sweep on the primary+prepass shapes ----
    if "sweep" not in skip:
        for rows in (8, 10, 16, 20, 25, 32, 40):
            rc = dataclasses.replace(rcfg, trace_tile_rows=rows)
            _, pre_s, pri_s = mk(rc)
            timeit(f"  [rows={rows:3d}] prepass pair", pre_s, tbl, sky_y)
            r = timeit(f"  [rows={rows:3d}] primary", pri_s, tbl, sky_y,
                       start)
            print(f"      mean tile-steps {float(jnp.mean(r.steps)):.1f}",
                  flush=True)

    # ---- 3. temporal warp A/B ----
    if "warp" not in skip:
        from rvgrt_tpu.upscale import temporal as up_t
        st0 = up_t.init_state(h, w)
        jit_t = {}
        for taps in ("bilinear", "bilinear_shift", "nearest"):
            jit_t[taps] = jax.jit(
                lambda c, m, d, j, s, taps=taps: up_t.temporal_upscale(
                    c, m, d, j, s, warp_taps=taps))
        # warm a moving history so the warp does real reprojection
        cams = [pan_cam(0.06 * i) for i in range(6)]
        outs = {}
        rf_j = jax.jit(lambda bi, sd, g, at, tb, sy, cc:
                       pipeline.render_frame(bi, sd, g, at, cc, ecfg,
                                             include_gi=False, sky_y=sy,
                                             table=tb))
        for taps in jit_t:
            s = st0
            for i, c in enumerate(cams):
                o = rf_j(world.bits, world.sdf, world.gi, world.atlas,
                         tbl, sky_y, c)
                img, s = jit_t[taps](o.color, o.motion, o.depth,
                                     c.jitter, s)
            outs[taps] = np.asarray(img)
            timeit(f"  temporal_upscale[{taps}]", jit_t[taps], o.color,
                   o.motion, o.depth, c.jitter, s)
        for taps in ("bilinear_shift", "nearest"):
            mse = float(np.mean((outs[taps] - outs["bilinear"]) ** 2))
            psnr = 10 * math.log10(1.0 / max(mse, 1e-12))
            print(f"    {taps} vs bilinear after 6 moving frames: "
                  f"{psnr:.1f} dB", flush=True)

    # ---- 4. coherent plane starts ----
    if "coh" not in skip:
        def coherent_start(cam, hd_raw, pre_res):
            """Analytic start where the 2x2 prepass quad is one face plane.

            hd_raw = prepass distance MINUS bias (what half_res_prepass
            returns); pre_res = the prepass TraceResult.
            """
            code = pipeline._normal_code(pre_res.nx, pre_res.ny, pre_res.nz)
            # plane coordinate along the normal axis
            plane = jnp.where(code < 2, pre_res.px,
                              jnp.where(code < 4, pre_res.py, pre_res.pz))
            ok = pre_res.hit & (code < 6)

            def quad(a):
                pad = jnp.pad(a, ((0, 1), (0, 1)), mode="edge")
                return (pad[:-1, :-1], pad[:-1, 1:], pad[1:, :-1],
                        pad[1:, 1:])

            c0, c1, c2, c3 = quad(code)
            p0, p1, p2, p3 = quad(plane)
            o0, o1, o2, o3 = quad(ok)
            same = (o0 & o1 & o2 & o3 & (c0 == c1) & (c0 == c2)
                    & (c0 == c3)
                    & (jnp.abs(p0 - p1) < 1e-3) & (jnp.abs(p0 - p2) < 1e-3)
                    & (jnp.abs(p0 - p3) < 1e-3))
            up2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
            same_f = up2(same)
            code_f = up2(c0)
            plane_f = up2(p0)
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            o_a = jnp.where(code_f < 2, cam.pos[0],
                            jnp.where(code_f < 4, cam.pos[1], cam.pos[2]))
            d_a = jnp.where(code_f < 2, dx, jnp.where(code_f < 4, dy, dz))
            t_pl = (plane_f - o_a) / jnp.where(jnp.abs(d_a) < 1e-6,
                                               jnp.float32(1e-6), d_a)
            valid = same_f & (t_pl > 0.5) & (jnp.abs(d_a) >= 1e-6)
            margin = 0.75 + 1e-3 * t_pl
            base = pipeline.min_dist_upsample(hd_raw)
            return jnp.where(valid, jnp.maximum(t_pl - margin, 0.0), base), \
                valid

        pre_full = jax.jit(lambda tb, sy: wavefront.trace(
            None, None, cfg, rcfg,
            cam.pos[0], cam.pos[1], cam.pos[2],
            *pipeline._ray_dirs(cam, rcfg.half_width, rcfg.half_height,
                                pixel_center=True),
            pipeline._cascade_start(
                pipeline.make_trace_fn(None, None, cfg, rcfg, table=tb,
                                       sky_y=sy), rcfg, cam, 0,
                rcfg.half_height),
            table=tb, sky_y=sy))
        pr = pre_full(tbl, sky_y)
        d = jnp.sqrt((pr.px - cam.pos[0]) ** 2 + (pr.py - cam.pos[1]) ** 2
                     + (pr.pz - cam.pos[2]) ** 2)
        hd_raw = jnp.where(pr.hit, d, rcfg.miss_distance) - rcfg.dist_bias
        cst_j = jax.jit(coherent_start)
        cst, valid = cst_j(cam, hd_raw, pr)
        frac = float(jnp.mean(valid.astype(jnp.float32)))
        print(f"  coherent-start coverage: {frac * 100:.1f}% of rays",
              flush=True)
        timeit("  coherent-start compute (VPU only)", cst_j, cam,
               hd_raw, pr)
        res1 = timeit("primary (coherent start)", pri_j, tbl, sky_y, cst)
        print(f"    mean its {float(jnp.mean(res1.its)):.1f}  "
              f"mean tile-steps {float(jnp.mean(res1.steps)):.1f}",
              flush=True)
        # exactness vs baseline
        both = np.asarray(res0.hit), np.asarray(res1.hit)
        dis = int(np.sum(both[0] != both[1]))
        t_err = np.abs(np.asarray(res0.t) - np.asarray(res1.t))
        t_err = t_err[np.asarray(res0.hit) & np.asarray(res1.hit)]
        print(f"    hit disagreements: {dis}/{both[0].size}; "
              f"t err mean {t_err.mean():.4f} max {t_err.max():.3f}",
              flush=True)
        n_dis = int(np.sum(
            (np.asarray(res0.nx) != np.asarray(res1.nx))
            | (np.asarray(res0.ny) != np.asarray(res1.ny))
            | (np.asarray(res0.nz) != np.asarray(res1.nz))))
        print(f"    normal disagreements: {n_dis}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
