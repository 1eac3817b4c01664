"""Round-3 probe: Pallas gather feasibility, slim carry, checkerboard.

Within-run A/Bs on the real chip (tunnel throughput varies ~3x across
runs; only within-run comparisons are load-bearing - PERF.md):

  1. Pallas/Mosaic per-lane dynamic gather from a VMEM-resident table
     (jnp.take flat / take_along_axis per-column) - feasibility + ns/elem
     vs the XLA HBM gather.  This decides whether a VMEM-table Pallas
     tracer (small worlds) and a Pallas history-warp kernel are on the
     table; round-2's toolchain could not lower these (PERF.md).
  2. VMEM capacity ladder: largest table a kernel can hold.
  3. Tracer: slim carry (RenderConfig.slim_carry - tMax recomputed, 3
     fewer f32 carries + in-body invariants) vs the incremental carry, on
     the production primary + prepass at 1280x800/1024^3.
  4. Checkerboard shape cost: the same primary trace over half the lanes
     (800x640) - the raw-shape upper bound for VERDICT item #2.
  5. shard_map dispatch overhead at mesh=1 on the full frame (VERDICT #5:
     turn the "~8x on 8 chips" extrapolation into a measured model).

Usage: python scripts/probe_r7.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    p.add_argument("--skip-pallas", action="store_true")
    p.add_argument("--skip-world", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
            r = f(*a)
            jax.block_until_ready(r)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"{name:52s} FAILED: {msg}", flush=True)
            return None
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

    # ---------------- 1+2: Pallas gather feasibility ----------------
    if not args.skip_pallas:
        rng = np.random.RandomState(0)
        R, C = 8192, 128  # 1M lanes
        n_lanes = R * C

        def xla_gather(tbl, idx):
            return jnp.take(tbl, idx, mode="clip")

        for mb in (2, 8, 32, 64, 100):
            n_words = mb * (1 << 20) // 4
            tbl = jnp.arange(n_words, dtype=jnp.uint32) * jnp.uint32(2654435761)
            idx = jnp.asarray(
                rng.randint(0, n_words, size=(R, C)), jnp.int32)
            r = timeit(f"XLA HBM gather 1M from {mb}MB",
                       jax.jit(xla_gather), tbl, idx)
            if r is not None:
                ref = np.asarray(r)

            # f1: flat take from a VMEM-resident table
            def pallas_take(tbl, idx, n_words=n_words, mb=mb):
                def kernel(tbl_ref, idx_ref, out_ref):
                    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0,
                                          mode="clip")
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=(mb + 8) * (1 << 20)),
                )(tbl, idx)

            r2 = timeit(f"Pallas VMEM flat take 1M from {mb}MB",
                        jax.jit(pallas_take), tbl, idx)
            if r2 is not None and r is not None:
                ok = bool(np.array_equal(np.asarray(r2), ref))
                print(f"    correct: {ok}", flush=True)

            # f2: per-column take_along_axis (dynamic_gather pattern)
            S = n_words // C

            def pallas_tala(tbl, idx, S=S, mb=mb):
                t2 = tbl[:S * C].reshape(S, C)
                i2 = idx % S

                def kernel(tbl_ref, idx_ref, out_ref):
                    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:],
                                                     axis=0)
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=(mb + 8) * (1 << 20)),
                )(t2, i2)

            r3 = timeit(f"Pallas VMEM col-take_along 1M from {mb}MB",
                        jax.jit(pallas_tala), tbl, idx)
            if r3 is not None:
                t2 = np.asarray(tbl[:S * C]).reshape(S, C)
                i2 = np.asarray(idx) % S
                want = np.take_along_axis(t2, i2, axis=0)
                print(f"    correct: "
                      f"{bool(np.array_equal(np.asarray(r3), want))}",
                      flush=True)

        # small-table XLA gather for comparison (latency vs size)
        for mb in (2, 64, 256):
            n_words = mb * (1 << 20) // 4
            tbl = jnp.arange(n_words, dtype=jnp.uint32)
            idx = jnp.asarray(rng.randint(0, n_words, size=(R, C)), jnp.int32)
            timeit(f"XLA HBM gather 1M from {mb}MB (ref)",
                   jax.jit(xla_gather), tbl, idx)

    if args.skip_world:
        print("done (pallas only)", flush=True)
        return

    # ---------------- world + camera ----------------
    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera
    from rvgrt_tpu.trace import wavefront

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(
            RenderConfig(), width=args.w, height=args.h,
            # TPU-tuned cadence (bench default)
            dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0,
            gi_res_divisor=8),
        lighting=dataclasses.replace(
            EngineConfig().lighting, soft_shadows=True,
            soft_shadow_stride=2))
    cfg, rcfg = ecfg.world, ecfg.render

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

    # ---------------- 3: slim carry on prepass + primary ----------------
    def prepass(rc):
        lc = ecfg.lighting
        return jax.jit(lambda tb, sy: pipeline.half_res_prepass(
            None, world.sdf, cfg, rc, lc, cam, table=tb, sky_y=sy))

    hd, _ = prepass(rcfg)(tbl, sky_y)
    start = pipeline.min_dist_upsample(hd)

    def primary(rc, width=w, height=h):
        def f(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, width, height,
                                            pixel_center=False)
            return wavefront.trace(None, None, cfg, rc,
                                   cam.pos[0], cam.pos[1], cam.pos[2],
                                   dx, dy, dz, st, table=tb, sky_y=sy)
        return jax.jit(f)

    res0 = timeit("primary [bench cadence, incremental carry]",
                  primary(rcfg), tbl, sky_y, start)
    print(f"    mean its {float(jnp.mean(res0.its)):.1f} "
          f"tile-steps {float(jnp.mean(res0.steps)):.1f}", flush=True)

    rc_slim = dataclasses.replace(rcfg, slim_carry=True)
    res1 = timeit("primary [slim carry]", primary(rc_slim), tbl, sky_y,
                  start)
    if res1 is not None:
        hd_ = int(np.sum(np.asarray(res1.hit) != np.asarray(res0.hit)))
        nd = int(np.sum((np.asarray(res1.nx) != np.asarray(res0.nx))
                        | (np.asarray(res1.ny) != np.asarray(res0.ny))
                        | (np.asarray(res1.nz) != np.asarray(res0.nz))))
        print(f"    vs incremental: hit diff {hd_}/1M, normal diff {nd}; "
              f"tile-steps {float(jnp.mean(res1.steps)):.1f}", flush=True)

    timeit("prepass pair [incremental]", prepass(rcfg), tbl, sky_y)
    timeit("prepass pair [slim]", prepass(rc_slim), tbl, sky_y)

    # ---------------- 4: checkerboard raw shape ----------------
    start_ck = start[:, ::2]

    def primary_ck(rc):
        def f(tb, sy, st):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            return wavefront.trace(None, None, cfg, rc,
                                   cam.pos[0], cam.pos[1], cam.pos[2],
                                   dx[:, ::2], dy[:, ::2], dz[:, ::2], st,
                                   table=tb, sky_y=sy)
        return jax.jit(f)

    timeit("primary checkerboard shape (h x w/2)", primary_ck(rcfg),
           tbl, sky_y, start_ck)
    timeit("primary checkerboard + slim", primary_ck(rc_slim),
           tbl, sky_y, start_ck)

    # ---------------- 5: shard_map overhead at mesh=1 ----------------
    from rvgrt_tpu.parallel import sharding

    # table/sky MUST be jit arguments (268 MB closure constants blow the
    # remote-compile request - HTTP 413) and the sharded path needs the
    # same table/sky or it silently rebuilds the table per call
    frame_j = jax.jit(lambda b, s, g, a, tb, sy: pipeline.render_frame(
        b, s, g, a, cam, ecfg, include_gi=False, sky_y=sy, table=tb))
    timeit("full frame (GI off) direct", frame_j,
           world.bits, world.sdf, world.gi, world.atlas, tbl, sky_y)
    try:
        mesh = sharding.make_mesh(1)
        b1, s1, g1, a1, t1, y1 = sharding.replicate(
            mesh, world.bits, world.sdf, world.gi, world.atlas, tbl, sky_y)
        shard_j = jax.jit(
            lambda b, s, g, a, tb, sy: sharding.render_frame_sharded(
                b, s, g, a, cam, ecfg, mesh, include_gi=False, sky_y=sy,
                table=tb))
        timeit("full frame (GI off) shard_map mesh=1", shard_j,
               b1, s1, g1, a1, t1, y1)
    except Exception as e:
        print(f"shard_map mesh=1 failed: {e}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
