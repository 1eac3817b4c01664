"""Round-4 probe: jitted per-stage costs at the bench operating point,
one run: base checker frame / GI update / composite(div16) / the FULL
jitted post stage (composite + checker expand + temporal upscale, pallas
warp) / temporal upscale alone.

Usage: python scripts/probe_r14.py [--cube 10]
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
    from rvgrt_tpu.upscale import temporal as up_temporal

    print(f"device={jax.devices()[0]}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    rcfg = dataclasses.replace(
        RenderConfig(), width=args.w, height=args.h,
        dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
        prepass_divisor=8, shadow_site_divisor=4, steps_per_check=1,
        gi_res_divisor=16)
    lcfg = dataclasses.replace(LightingConfig(), soft_shadows=True,
                               soft_shadow_stride=2)
    ecfg = EngineConfig(world=WorldConfig().with_cube(args.cube),
                        render=rcfg, lighting=lcfg,
                        gi_straggler_budget=12,
                        gi_init_mode="heightfield")
    cfg = ecfg.world
    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=True)
    world.trace_table.block_until_ready()
    print(f"world build {time.time() - t0:.1f}s", flush=True)
    B, D, G, A = world.bits, world.sdf, world.gi, world.atlas
    T, S = world.trace_table, world.sky_y

    cx = cz = cfg.size_x // 2

    @jax.jit
    def terrain_top(bits):
        vol = bits.reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)
        word = vol[cz, :, cx // 32]
        solid = (word >> jnp.uint32(cx % 32)) & jnp.uint32(1)
        return jnp.where(solid.any(),
                         cfg.size_y - 1
                         - jnp.argmax(solid[::-1]).astype(jnp.int32),
                         30).astype(jnp.float32)

    cam_y = min(float(terrain_top(B)) + 12.0, cfg.size_y - 2.0)
    ang = 0.35
    fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    cam = eng_mod.camera_arrays(Camera(
        pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
        right=right.astype(np.float32),
        up=(up / np.linalg.norm(up)).astype(np.float32)))
    par0 = jax.device_put(jnp.int32(0))
    fr0 = jax.device_put(jnp.uint32(0))
    off0 = jax.device_put(jnp.int32(0))

    def timed(name, f, *a, reps=args.reps):
        r = f(*a)
        jax.tree.leaves(r)[0].block_until_ready()
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            jax.tree.leaves(r)[0].block_until_ready()
            ts.append((time.time() - t) * 1e3)
        print(f"{name:48s} {min(ts):9.1f} ms", flush=True)
        return r

    base_j = jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                     pipeline.render_frame(b, s, g, a, cam, ecfg,
                                           include_gi=False, sky_y=sky,
                                           table=tbl, return_gbuffer=True,
                                           checker_parity=par))
    out0, gb0 = timed("base checker frame (d8, ssd4, spc1)",
                      base_j, B, D, G, A, cam, S, T, par0)

    gi_j = jax.jit(lambda g, b, s, a, fr, off, sky, tbl:
                   gi_update.update_gi(g, b, s, a, ecfg, fr, off,
                                       sky_y=sky, table=tbl))
    timed("GI update window (respite 12)", gi_j, G, B, D, A, fr0, off0,
          S, T)

    comp_j = jax.jit(lambda col, gb, g, s: pipeline.gi_composite(
        col, gb, g, s, ecfg))
    timed("GI composite div16", comp_j, out0.color, gb0, G, D)

    hist0 = up_temporal.init_state(args.h, args.w)
    jit_nd = jnp.asarray([0.0005, 0.0007], jnp.float32)

    def post(col, mv, dp, gb, g, s, jit_nd, hist, par):
        col = pipeline.gi_composite(col, gb, g, s, ecfg)
        colx = pipeline.checker_expand(col, par)
        mvx = pipeline.checker_expand(mv, par)
        dpx = pipeline.checker_expand(dp, par)
        valid = pipeline.checker_valid_mask(args.h, args.w, par)
        return up_temporal.temporal_upscale(colx, mvx, dpx, jit_nd, hist,
                                            valid=valid,
                                            warp_taps="pallas")

    timed("post stage (composite+expand+upscale)", jax.jit(post),
          out0.color, out0.motion, out0.depth, gb0, G, D, jit_nd, hist0,
          par0)

    colx = pipeline.checker_expand(out0.color, par0)
    mvx = pipeline.checker_expand(out0.motion, par0)
    dpx = pipeline.checker_expand(out0.depth, par0)
    up_j = jax.jit(lambda c, m, d, j, st: up_temporal.temporal_upscale(
        c, m, d, j, st, warp_taps="pallas"))
    timed("temporal upscale alone (pallas warp)", up_j, colx, mvx, dpx,
          jit_nd, hist0)


if __name__ == "__main__":
    main()
