"""Round-4 probe: GI composite cost at cone-site divisors 8/16/24, and
the full pipelined frame (base + GI + composite + upscale) at both, all
within one run - resolves the cross-run tunnel noise that made the div16
bench read slower than div8.

Usage: python scripts/probe_r13.py [--cube 10]
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
    p.add_argument("--frames", type=int, default=10)
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
    from rvgrt_tpu.scene.camera import Camera, phase_jitter_sequence
    from rvgrt_tpu.upscale import temporal as up_temporal

    print(f"device={jax.devices()[0]}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    def rcfg_v(gid):
        return dataclasses.replace(
            RenderConfig(), width=args.w, height=args.h,
            dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
            prepass_divisor=8, shadow_site_divisor=4, steps_per_check=1,
            gi_res_divisor=gid)

    lcfg = dataclasses.replace(LightingConfig(), soft_shadows=True,
                               soft_shadow_stride=2)

    def ecfg_v(gid):
        return EngineConfig(world=WorldConfig().with_cube(args.cube),
                            render=rcfg_v(gid), lighting=lcfg,
                            gi_straggler_budget=12,
                            gi_init_mode="heightfield")

    ecfg = ecfg_v(8)
    cfg = ecfg.world
    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=True)
    jax.tree.leaves(world.bits)[0].block_until_ready()
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

    def pan_cam(i):
        ang = 0.35 * i
        fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                       np.float32)
        fwd /= np.linalg.norm(fwd)
        wup = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, wup)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        return eng_mod.camera_arrays(Camera(
            pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
            right=right.astype(np.float32),
            up=(up / np.linalg.norm(up)).astype(np.float32)))

    par0 = jax.device_put(jnp.int32(0))
    par1 = jax.device_put(jnp.int32(1))
    fr0 = jax.device_put(jnp.uint32(0))
    off0 = jax.device_put(jnp.int32(0))
    seq = phase_jitter_sequence(3)

    # ---- composite-alone A/B ----
    ec8, ec16, ec24 = ecfg_v(8), ecfg_v(16), ecfg_v(24)
    base8 = jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                    pipeline.render_frame(b, s, g, a, cam, ec8,
                                          include_gi=False, sky_y=sky,
                                          table=tbl, return_gbuffer=True,
                                          checker_parity=par))
    out0, gb0 = base8(B, D, G, A, pan_cam(0), S, T, par0)
    out0.color.block_until_ready()
    for ec, tag in ((ec8, "div8"), (ec16, "div16"), (ec24, "div24")):
        comp = jax.jit(lambda col, gb, g, s, ec=ec:
                       pipeline.gi_composite(col, gb, g, s, ec))
        r = comp(out0.color, gb0, G, D)
        r.block_until_ready()
        ts = []
        for _ in range(3):
            t = time.time()
            r = comp(out0.color, gb0, G, D)
            r.block_until_ready()
            ts.append((time.time() - t) * 1e3)
        print(f"composite {tag}: {min(ts):.1f} ms", flush=True)

    # ---- full pipelined frames at div8 vs div16 (bench shape) ----
    for ec, tag in ((ec8, "div8"), (ec16, "div16")):
        base_j = jax.jit(lambda b, s, g, a, cam, sky, tbl, par, ec=ec:
                         pipeline.render_frame(b, s, g, a, cam, ec,
                                               include_gi=False, sky_y=sky,
                                               table=tbl,
                                               return_gbuffer=True,
                                               checker_parity=par))
        comp_j = jax.jit(lambda col, gb, g, s, ec=ec:
                         pipeline.gi_composite(col, gb, g, s, ec))
        gi_j = jax.jit(lambda g, b, s, a, fr, off, sky, tbl, ec=ec:
                       gi_update.update_gi(g, b, s, a, ec, fr, off,
                                           sky_y=sky, table=tbl))
        hist = up_temporal.init_state(args.h, args.w)

        def frame(i, gi, hist, acc):
            cam = pan_cam(i)
            par = par0 if i % 2 == 0 else par1
            if i % 2 == 0:
                gi = gi_j(gi, B, D, A, fr0, off0, S, T)
            out, gb = base_j(B, D, gi, A, cam, S, T, par)
            col = comp_j(out.color, gb, gi, D)
            colx = pipeline.checker_expand(col, par)
            mvx = pipeline.checker_expand(out.motion, par)
            dpx = pipeline.checker_expand(out.depth, par)
            valid = pipeline.checker_valid_mask(args.h, args.w, par)
            jx, jy = seq[i % len(seq)] * 0.5
            jit_nd = jnp.asarray([float(jx) * 2 / args.w,
                                  float(jy) * 2 / args.h], jnp.float32)
            hi, hist = up_temporal.temporal_upscale(
                colx, mvx, dpx, jit_nd, hist, valid=valid,
                warp_taps="pallas")
            return gi, hist, acc + jnp.sum(dpx)

        acc = jnp.zeros((), jnp.float32)
        gi = G
        gi, hist, acc = frame(0, gi, hist, acc)
        float(acc)
        t0 = time.time()
        for i in range(args.frames):
            gi, hist, acc = frame(1 + i, gi, hist, acc)
        float(acc)
        dt = (time.time() - t0) / args.frames
        print(f"full frame {tag}: {dt * 1e3:.1f} ms/frame "
              f"({1 / dt:.2f} FPS)", flush=True)


if __name__ == "__main__":
    main()
