"""Round-2 within-run probe: far-SDF A/B + full stage breakdown at the
stage-5 operating point.

One process, one world build; measures (tunnel throughput varies ~3x across
runs, so only these same-process numbers are load-bearing):

  1. plain vs far-mip-extended SDF: cascade / prepass pair / primary, with
     mean `its` per ray (the work counter) for each;
  2. GI update window (the per-frame "training step");
  3. GI composite (cones at 1/4 res + upsample);
  4. the learned 3x upscale step;
  5. full split-dispatch frame.

Usage: python scripts/probe_r2.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    from rvgrt_tpu.world import sdf as sdf_mod, voxel_grid as vg

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=args.w,
                                   height=args.h))
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"{args.w}x{args.h}", flush=True)

    # absorb the tunnel's one-time first-readback setup before timing
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=True)
    print(f"world build {time.time() - t0:.1f}s", flush=True)

    # plain (reference-capped) SDF + its table, for the A/B
    t0 = time.time()
    coarse = vg.coarse_occupancy(world.bits, cfg)
    sdf_plain = jax.jit(sdf_mod.build_sdf, static_argnums=1)(coarse, cfg)
    table_plain = jax.jit(wavefront.make_trace_table, static_argnums=2)(
        world.bits, sdf_plain, cfg)
    table_plain.block_until_ready()
    print(f"plain SDF + table {time.time() - t0:.1f}s", flush=True)

    # camera above terrain at center (on-device column scan)
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
        print(f"{name:46s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    h, w = args.h, args.w
    sky_y = world.sky_y

    # ---- 1. far-SDF A/B ----
    def stage_fns(label):
        def cascade(tbl, sy):
            tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                        sky_y=sy)
            return pipeline._cascade_start(tf, rcfg, cam, 0,
                                           rcfg.half_height)

        def prepass(tbl, sy):
            return pipeline.half_res_prepass(None, None, cfg, rcfg, lcfg,
                                             cam, table=tbl, sky_y=sy)

        def primary(tbl, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            r = wavefront.trace(None, None, cfg, rcfg,
                                cam.pos[0], cam.pos[1], cam.pos[2],
                                dx, dy, dz, st, table=tbl, sky_y=sy)
            return r.its
        return (jax.jit(cascade), jax.jit(prepass), jax.jit(primary))

    cas_j, pre_j, pri_j = stage_fns("x")
    for label, tbl in (("far-mip", world.trace_table),
                       ("plain", table_plain)):
        timeit(f"[{label}] cascade (1/8 res)", cas_j, tbl, sky_y)
        hd, _ = pre_j(tbl, sky_y)
        timeit(f"[{label}] prepass pair (1/2 res)", pre_j, tbl, sky_y)
        start = pipeline.min_dist_upsample(hd)
        its = timeit(f"[{label}] full-res primary", pri_j, tbl, sky_y,
                     start)
        print(f"    mean its/ray primary: "
              f"{float(jnp.mean(its.astype(jnp.float32))):.1f}", flush=True)

    # ---- 2. GI update ----
    def gi_step(gi, tbl, frame, off):
        return gi_update.update_gi(gi, world.bits, world.sdf, world.atlas,
                                   ecfg, frame, off, sky_y=sky_y, table=tbl)
    gi_j = jax.jit(gi_step)
    timeit("GI update (64^3 cells x 2 rays)", gi_j, world.gi,
           world.trace_table, jnp.uint32(1), jnp.int32(0))

    # ---- 3/5. base frame + composite (split dispatch) ----
    base_j = jax.jit(lambda tbl: pipeline.render_frame(
        world.bits, world.sdf, world.gi, world.atlas, cam, ecfg,
        include_gi=False, sky_y=sky_y, table=tbl, return_gbuffer=True))
    out, gb = base_j(world.trace_table)
    timeit("base frame (no GI)", base_j, world.trace_table)
    comp_j = jax.jit(lambda c, g: pipeline.gi_composite(
        c, gb, g, world.sdf, ecfg))
    timeit("GI composite (1/4-res cones)", comp_j, out.color, world.gi)

    # ---- 4. upscale ----
    from rvgrt_tpu.upscale import model as up_model
    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "upscaler.pkl")
    if os.path.exists(ckpt):
        net, params = up_model.load_checkpoint(ckpt)
    else:
        net, params = up_model.init_params(jax.random.PRNGKey(0), h, w)
    hist = jnp.zeros((h * up_model.SCALE, w * up_model.SCALE, 3),
                     jnp.float32)
    up_j = jax.jit(lambda c, m, d, hi: up_model.upscale(
        net, params, c, m, d, cam.jitter, hi)[0])
    timeit("3x upscale step", up_j, out.color, out.motion, out.depth, hist)

    print("done", flush=True)


if __name__ == "__main__":
    main()
