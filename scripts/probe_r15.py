"""Round-4 probe: tile-shape sweep at the FINAL bench graph
(d8 + decoupled shadows + spc1 + div16) - the schedule lottery is
per-graph, and every previous sweep ran a different graph.

Usage: python scripts/probe_r15.py [--cube 10]
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

    lcfg = dataclasses.replace(LightingConfig(), soft_shadows=True,
                               soft_shadow_stride=2)

    def ecfg_v(rows, spc=1, sub=6):
        rc = dataclasses.replace(
            RenderConfig(), width=args.w, height=args.h,
            dda_substeps=sub, sdf_probe_interval=16, dist_bias=4.0,
            prepass_divisor=8, shadow_site_divisor=4, steps_per_check=spc,
            gi_res_divisor=16, trace_tile_rows=rows)
        return EngineConfig(world=WorldConfig().with_cube(args.cube),
                            render=rc, lighting=lcfg,
                            gi_straggler_budget=12,
                            gi_init_mode="heightfield")

    ecfg = ecfg_v(20)
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

    for rows, spc, sub in ((20, 1, 6), (16, 1, 6), (25, 1, 6), (30, 1, 6),
                           (40, 1, 6), (20, 2, 6), (25, 2, 6), (20, 1, 8),
                           (25, 1, 8)):
        ec = ecfg_v(rows, spc, sub)

        def base(b, s, g, a, cam, sky, tbl, par, ec=ec):
            return pipeline.render_frame(b, s, g, a, cam, ec,
                                         include_gi=False, sky_y=sky,
                                         table=tbl, return_gbuffer=True,
                                         checker_parity=par)

        r = timed(f"base d8ssd4 rows={rows} spc={spc} sub={sub}",
                  jax.jit(base), B, D, G, A, cam, S, T, par0)
        if r is not None and rows == 20 and spc == 1 and sub == 6:
            out, gb = r
            st = float(jnp.mean(gb.t * 0 + 1))  # no-op keep


if __name__ == "__main__":
    main()
