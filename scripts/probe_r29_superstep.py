"""Round-5 probe: fused Pallas superstep A/B (VERDICT r4 #2).

Within-run A/B of the production primary trace + prepass pair at
1280x800/1024^3 (bench cadence) between:

  * the XLA superstep body (round-1..4 shape: one fused XLA loop body
    per superstep - gather + masked state machine), and
  * RenderConfig.fused_superstep: the same gather in XLA + the entire
    post-gather state machine as ONE Mosaic kernel with the tile state
    in VMEM (ops/superstep_kernel.py).

PERF.md:285 motivation: ~12-13 ns/lane of VPU work rides on each 7.5 ns
gather at 1M-lane shapes, so up to ~40% of superstep cost is not
gather-bound.  Success bar (VERDICT): >=1.15x on the primary trace
stage; the result is recorded in PERF.md either way.

Also prints bit-exactness counters (hit/normal/its deltas must be 0 -
the kernel calls the same jnp math; tests/test_trace.py gates this on
CPU interpret mode, this probe re-checks compiled Mosaic on the chip).

Usage: python scripts/probe_r29_superstep.py [--cube 10 --w 1280 --h 800]
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
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device={jax.devices()[0]}", flush=True)
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    def timeit(name, f, *a, reps=args.reps):
        try:
            t = time.time()
            r = f(*a)
            jax.block_until_ready(r)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            print(f"{name:48s} compile+first {time.time() - t0:.0f}s",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"{name:48s} FAILED: {msg}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:48s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera
    from rvgrt_tpu.trace import wavefront

    # the bench-cadence operating point (bench.py headline)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(
            RenderConfig(), width=args.w, height=args.h,
            dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
            prepass_divisor=8, shadow_site_divisor=4, steps_per_check=1,
            gi_res_divisor=16),
        lighting=dataclasses.replace(
            EngineConfig().lighting, soft_shadows=True,
            soft_shadow_stride=2))
    cfg, rcfg = ecfg.world, ecfg.render
    rc_fused = dataclasses.replace(rcfg, fused_superstep=True)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=False)
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
    fwd = np.array([math.cos(0.5) * 0.87, -0.5, math.sin(0.5) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup); right /= np.linalg.norm(right)
    up = np.cross(fwd, right); up /= np.linalg.norm(up)
    cam = eng_mod.camera_arrays(Camera(
        pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
        right=right.astype(np.float32), up=up.astype(np.float32)))

    h, w = args.h, args.w
    sky_y = world.sky_y
    tbl = world.trace_table

    def prepass(rc):
        lc = ecfg.lighting
        return jax.jit(lambda tb, sy: pipeline.half_res_prepass(
            None, world.sdf, cfg, rc, lc, cam, table=tb, sky_y=sy))

    hd, _ = prepass(rcfg)(tbl, sky_y)
    pd = rcfg.prepass_divisor
    if pd == 2:
        start = pipeline.min_dist_upsample(hd)
    else:
        # the d>2 conservative {-1,0,1,2} min window (pipeline slab path)
        m = hd
        for ax in (0, 1):
            acc = m
            for dlt in (-1, 1, 2):
                acc = jnp.minimum(acc, pipeline._clamped_shift(m, dlt, ax))
            m = acc
        start = jnp.repeat(jnp.repeat(m, pd, axis=0), pd, axis=1)
    jax.block_until_ready(start)

    def primary(rc, width=w, height=h):
        def f(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, width, height,
                                            pixel_center=False)
            return wavefront.trace(None, None, cfg, rc,
                                   cam.pos[0], cam.pos[1], cam.pos[2],
                                   dx, dy, dz, st, table=tb, sky_y=sy)
        return jax.jit(f)

    res0 = timeit("primary [XLA superstep]", primary(rcfg),
                  tbl, sky_y, start)
    print(f"    mean its {float(jnp.mean(res0.its)):.1f} "
          f"tile-steps {float(jnp.mean(res0.steps)):.1f}", flush=True)
    res1 = timeit("primary [fused Pallas superstep]", primary(rc_fused),
                  tbl, sky_y, start)
    if res1 is not None:
        hd_ = int(np.sum(np.asarray(res1.hit) != np.asarray(res0.hit)))
        nd = int(np.sum((np.asarray(res1.nx) != np.asarray(res0.nx))
                        | (np.asarray(res1.ny) != np.asarray(res0.ny))
                        | (np.asarray(res1.nz) != np.asarray(res0.nz))))
        it_ = int(np.sum(np.asarray(res1.its) != np.asarray(res0.its)))
        print(f"    vs XLA: hit diff {hd_}, normal diff {nd}, "
              f"its diff {it_} (must all be 0)", flush=True)

    timeit("prepass pair [XLA superstep]", prepass(rcfg), tbl, sky_y)
    timeit("prepass pair [fused Pallas]", prepass(rc_fused), tbl, sky_y)

    # checkerboard primary shape (the bench default tier)
    start_ck = start[:, ::2]

    def primary_ck(rc):
        def f(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            return wavefront.trace(None, None, cfg, rc,
                                   cam.pos[0], cam.pos[1], cam.pos[2],
                                   dx[:, ::2], dy[:, ::2], dz[:, ::2], st,
                                   table=tb, sky_y=sy)
        return jax.jit(f)

    timeit("primary checker [XLA superstep]", primary_ck(rcfg),
           tbl, sky_y, start_ck)
    timeit("primary checker [fused Pallas]", primary_ck(rc_fused),
           tbl, sky_y, start_ck)

    print("done", flush=True)


if __name__ == "__main__":
    main()
