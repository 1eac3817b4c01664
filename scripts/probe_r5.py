"""Probe: soft-shadow prepass as the stage-5 default + GI composite split.

Within-run A/Bs at the stage-5 operating point (1280x800, 1024^3):

  1. half-res prepass with hard shadows (a second full hybrid trace - the
     measured straggler-heavy half of the 454 ms pair) vs SDF-marched soft
     shadows (16 fixed gathers/lane, stride 1 and 2) - the config-4
     feature (BASELINE stage 4 lists soft shadows) as a perf lever;
  2. GI composite internals: strided cone gather alone vs the
     geometry-aware upsample, to see which side of the 178 ms to attack;
  3. the assembled new-default frame: prepass(soft,stride2) + primary +
     GI update + composite + temporal upscale (bilinear_shift warp).

Usage: python scripts/probe_r5.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    from rvgrt_tpu.render import pipeline, shading
    from rvgrt_tpu.trace import wavefront

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=args.w,
                                   height=args.h))
    cfg, rcfg = ecfg.world, ecfg.render
    lcfg_hard = ecfg.lighting
    lcfg_soft1 = dataclasses.replace(lcfg_hard, soft_shadows=True,
                                     soft_shadow_stride=1)
    lcfg_soft2 = dataclasses.replace(lcfg_hard, soft_shadows=True,
                                     soft_shadow_stride=2)
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

    sky_y = world.sky_y
    tbl = world.trace_table

    # ---- 1. prepass shadow variants ----
    for label, lc in (("hard", lcfg_hard), ("soft s1", lcfg_soft1),
                      ("soft s2", lcfg_soft2)):
        pre_j = jax.jit(lambda tb, sd, sy, lc=lc:
                        pipeline.half_res_prepass(None, sd, cfg, rcfg, lc,
                                                  cam, table=tb, sky_y=sy))
        timeit(f"prepass pair [{label}]", pre_j, tbl, world.sdf, sky_y)

    # prepass primary trace alone (no shadow at all), for the floor
    def pre_primary(tb, sy):
        tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tb,
                                    sky_y=sy)
        hw, hh = rcfg.half_width, rcfg.half_height
        dx, dy, dz = pipeline._ray_dirs(cam, hw, hh, pixel_center=True)
        st = pipeline._cascade_start(tf, rcfg, cam, 0, hh)
        return tf(cam.pos[0] + jnp.zeros_like(dx), cam.pos[1], cam.pos[2],
                  dx, dy, dz, st)
    r = timeit("prepass primary trace alone", jax.jit(pre_primary), tbl,
               sky_y)
    print(f"    prepass-primary mean its {float(jnp.mean(r.its)):.1f} "
          f"mean tile-steps {float(jnp.mean(r.steps)):.1f}", flush=True)

    # ---- 2. GI composite internals ----
    base_j = jax.jit(lambda bi, sd, g, at, tb, sy: pipeline.render_frame(
        bi, sd, g, at, cam, ecfg, include_gi=False, sky_y=sy, table=tb,
        return_gbuffer=True))
    out, gb = base_j(world.bits, world.sdf, world.gi, world.atlas, tbl,
                     sky_y)

    d = rcfg.gi_res_divisor
    off = d // 2

    def cones_only(g, sd):
        sub = lambda a: a[off::d, off::d]  # noqa: E731
        return shading.gather_gi(
            (sub(gb.px), sub(gb.py), sub(gb.pz)),
            (sub(gb.nx), sub(gb.ny), sub(gb.nz)),
            g, sd, cfg, ecfg.lighting)
    timeit("GI cones alone (strided sites)", jax.jit(cones_only), world.gi,
           world.sdf)
    comp_j = jax.jit(lambda c, g, sd: pipeline.gi_composite(
        c, gb, g, sd, ecfg))
    timeit("GI composite (cones + upsample + add)", comp_j, out.color,
           world.gi, world.sdf)

    # ---- 3. assembled new-default frame ----
    ecfg_s2 = dataclasses.replace(ecfg, lighting=lcfg_soft2)
    from rvgrt_tpu.upscale import temporal as up_t

    base2_j = jax.jit(lambda bi, sd, g, at, tb, sy: pipeline.render_frame(
        bi, sd, g, at, cam, ecfg_s2, include_gi=False, sky_y=sy, table=tb,
        return_gbuffer=True))
    gi_j = jax.jit(lambda g, bi, sd, at, tb, sy, fr, off:
                   gi_update.update_gi(g, bi, sd, at, ecfg_s2, fr, off,
                                       sky_y=sy, table=tb))
    up_j = jax.jit(lambda c, m, dpt, j, s: up_t.temporal_upscale(
        c, m, dpt, j, s))

    st = up_t.init_state(args.h, args.w)

    def full_frame(g, st):
        g = gi_j(g, world.bits, world.sdf, world.atlas, tbl, sky_y,
                 jnp.uint32(1), jnp.int32(0))
        o, gbb = base2_j(world.bits, world.sdf, g, world.atlas, tbl, sky_y)
        col = jax.jit(lambda c, gbb, g, sd: pipeline.gi_composite(
            c, gbb, g, sd, ecfg_s2))(o.color, gbb, g, world.sdf)
        img, st2 = up_j(col, o.motion, o.depth, cam.jitter, st)
        return img, g, st2

    img, g2, st2 = full_frame(world.gi, st)
    jax.block_until_ready(img)
    ts = []
    for _ in range(args.reps):
        t = time.time()
        img, g2, st2 = full_frame(g2, st2)
        float(jnp.sum(img[:4, :4]))
        ts.append((time.time() - t) * 1e3)
    med = sorted(ts)[len(ts) // 2]
    print(f"{'FULL frame (soft s2 + split GI + temporal up)':52s} "
          f"{med:9.1f} ms -> {1e3 / med:.2f} FPS device-side", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
