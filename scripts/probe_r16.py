"""Round-4 probe: split-dispatch the BASE frame (prepass jit + primary
jit) vs the fused base - the schedule-lottery lever that fixed the GI
frame in round 2 (fused 832 -> split 500 ms), never tried on the base.

Usage: python scripts/probe_r16.py [--cube 10]
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
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera

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

    # fused base (today's bench shape)
    base_j = jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                     pipeline.render_frame(b, s, g, a, cam, ecfg,
                                           include_gi=False, sky_y=sky,
                                           table=tbl, return_gbuffer=True,
                                           checker_parity=par))
    fused = timed("base FUSED (prepass+primary+shading)", base_j,
                  B, D, G, A, cam, S, T, par0)

    # split: jit A = prepass trace + conservative upsample -> full-res
    # start map; jit B = render with start_override (prepass skipped)
    d = rcfg.prepass_divisor

    def prepass(sdf, sky, tbl, cam):
        tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                    sky_y=sky)
        hd, _ = pipeline.half_res_prepass(None, sdf, cfg, rcfg, lcfg, cam,
                                          trace_fn=tf, sky_y=sky,
                                          want_shadow=False)
        start = pipeline._min_dist_upsample_slab(
            jnp.pad(hd, ((1, 1), (0, 0)), mode="edge"), args.h, d=d)
        return jnp.maximum(start, 0.0)

    pre_j = jax.jit(prepass)
    start = timed("split A: prepass trace + upsample", pre_j, D, S, T, cam)

    body_j = jax.jit(lambda b, s, g, a, cam, sky, tbl, par, st:
                     pipeline.render_frame(b, s, g, a, cam, ecfg,
                                           include_gi=False, sky_y=sky,
                                           table=tbl, return_gbuffer=True,
                                           checker_parity=par,
                                           start_override=st))
    split = timed("split B: primary+shading (start_override)", body_j,
                  B, D, G, A, cam, S, T, par0, start)

    def chained(b, s, g, a, cam, sky, tbl, par):
        st = pre_j(s, sky, tbl, cam)
        return body_j(b, s, g, a, cam, sky, tbl, par, st)

    timed("split A+B chained dispatch", chained, B, D, G, A, cam, S, T,
          par0)

    # equivalence: identical hit flags + color
    of, gf = fused
    os_, gs = split
    hm = int((np.asarray(gf.hit) != np.asarray(gs.hit)).sum())
    cd = float(np.abs(np.asarray(of.color) - np.asarray(os_.color)).max())
    print(f"split vs fused: hit mismatches {hm}, color maxdiff {cd:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
