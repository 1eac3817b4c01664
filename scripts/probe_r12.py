"""Round-4 probe: the last ~65 ms single-chip (VERDICT r3 #2).

Within-run A/Bs at 1280x800 / 1024^3, bench cadence (fast trace, soft
shadows, checker primaries, GI div8):

1. prepass/shadow ladder: d4+coupled-stride2 (round-3 default) vs
   d8+decoupled shadow sites (RenderConfig.shadow_site_divisor) - the
   prepass at d8 only provides starts; shadows march from the TRUE
   primary hits.
2. GI update + composite stage costs (sizes the half-cadence win).
3. trace_tile_rows sweep on the CHECKER-batch primary (the round-3 note
   says the smaller batch hides gather latency worse - tile shape was
   never retuned there).

Usage: python scripts/probe_r12.py [--cube 10]
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
    p.add_argument("--skip-tiles", action="store_true")
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

    def rcfg_v(d, ssd=0, rows=None, spc=None):
        kw = dict(width=args.w, height=args.h,
                  dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
                  gi_res_divisor=8,
                  prepass_divisor=d, shadow_site_divisor=ssd)
        if rows is not None:
            kw["trace_tile_rows"] = rows
        if spc is not None:
            kw["steps_per_check"] = spc
        return dataclasses.replace(RenderConfig(), **kw)

    lcfg = dataclasses.replace(LightingConfig(), soft_shadows=True,
                               soft_shadow_stride=2)

    def ecfg_v(rc):
        return EngineConfig(world=WorldConfig().with_cube(args.cube),
                            render=rc, lighting=lcfg,
                            gi_straggler_budget=12)

    ecfg = ecfg_v(rcfg_v(4))
    cfg = ecfg.world

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=True)
    print(f"world build {time.time() - t0:.1f}s", flush=True)
    B, D, G, A = world.bits, world.sdf, world.gi, world.atlas
    T, S = world.trace_table, world.sky_y

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
    par0 = jax.device_put(jnp.int32(0))
    fr0 = jax.device_put(jnp.uint32(0))
    off0 = jax.device_put(jnp.int32(0))

    def timeit(name, f, *a, reps=args.reps):
        try:
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        except Exception as e:
            print(f"{name:52s} FAILED: {str(e)[:240]}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        print(f"{name:52s} {sorted(ts)[len(ts) // 2]:9.1f} ms  "
              f"(min {min(ts):.1f})", flush=True)
        return r

    # ---- 1. prepass/shadow ladder (base frame, checker, no GI) ----
    variants = [
        ("d4 coupled s2 (r3 default)", rcfg_v(4)),
        ("d4 decoupled ssd4", rcfg_v(4, ssd=4)),
        ("d8 decoupled ssd4", rcfg_v(8, ssd=4)),
        ("d8 decoupled ssd2", rcfg_v(8, ssd=2)),
    ]
    base_color = None
    for name, rc in variants:
        ec = ecfg_v(rc)

        def base(b, s, g, a, cam, sky, tbl, par, ec=ec):
            return pipeline.render_frame(b, s, g, a, cam, ec,
                                         include_gi=False, sky_y=sky,
                                         table=tbl, return_gbuffer=True,
                                         checker_parity=par)

        r = timeit(f"base frame {name}", jax.jit(base), B, D, G, A, cam,
                   S, T, par0)
        if r is not None:
            out, gb = r
            if base_color is None:
                base_color = np.asarray(out.color)
                gb0 = gb
            else:
                a_ = base_color
                b_ = np.asarray(out.color)
                mse = float(np.mean((a_ - b_) ** 2))
                ps = 99.0 if mse < 1e-12 else 10.0 * math.log10(1.0 / mse)
                hm = int((np.asarray(gb.hit) != np.asarray(gb0.hit)).sum())
                print(f"  vs default: {ps:.1f} dB, hit mismatches {hm}",
                      flush=True)

    # ---- 2. GI stage costs at bench cadence ----
    ec = ecfg_v(rcfg_v(4))

    def gi_upd(g, b, s, a, fr, off, sky, tbl):
        return gi_update.update_gi(g, b, s, a, ec, fr, off, sky_y=sky,
                                   table=tbl)

    timeit("GI update (bench window, respite 12)", jax.jit(gi_upd), G, B,
           D, A, fr0, off0, S, T)

    def base4(b, s, g, a, cam, sky, tbl, par):
        return pipeline.render_frame(b, s, g, a, cam, ec,
                                     include_gi=False, sky_y=sky,
                                     table=tbl, return_gbuffer=True,
                                     checker_parity=par)

    rb = jax.jit(base4)(B, D, G, A, cam, S, T, par0)
    out0, gb0 = rb

    def comp(col, gb, g, s):
        return pipeline.gi_composite(col, gb, g, s, ec)

    timeit("GI composite (div8 cones, checker)", jax.jit(comp), out0.color,
           gb0, G, D)

    # ---- 3. tile shape sweep on the checker BASE frame (the r3 note:
    # the half-width batch hides gather latency worse; rows were tuned at
    # full-width shapes and never revisited) ----
    if not args.skip_tiles:
        for rows in (10, 12, 16, 20, 25, 32):
            for spc in (2,) if rows != 20 else (1, 2, 4):
                rc = rcfg_v(4, rows=rows, spc=spc)
                ec2 = ecfg_v(rc)

                def base_t(b, s, g, a, cam, sky, tbl, par, ec2=ec2):
                    return pipeline.render_frame(
                        b, s, g, a, cam, ec2, include_gi=False, sky_y=sky,
                        table=tbl, checker_parity=par)

                timeit(f"base frame d4 rows={rows} spc={spc}",
                       jax.jit(base_t), B, D, G, A, cam, S, T, par0)


if __name__ == "__main__":
    main()
