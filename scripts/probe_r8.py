"""Round-3 probe: temporal start distances (pipeline.temporal_start_hint).

Within-run A/Bs on the real chip at the headline operating point
(1280x800, 1024^3, bench cadence: fast-trace + soft shadows + checker
primaries).  Measures, for the prepass and the primary trace:

  baseline          same-frame starts only (cascade / minDist)
  hint-rot          + temporal hints, rotating camera (bench motion)
  hint-trans        + temporal hints, rotating AND translating camera
  hint-nocascade    hints with the cascade trace disabled (prepass_cascade=1)

plus the cost of computing the hint maps themselves, and the mean
tile-supersteps (res.steps) per variant - the tracer's true cost counter.

Usage: python scripts/probe_r8.py [--cube 10 --w 1280 --h 800 --reps 3]
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
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    rcfg = dataclasses.replace(
        RenderConfig(), width=args.w, height=args.h,
        dda_substeps=6, sdf_probe_interval=16, dist_bias=4.0)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube), render=rcfg,
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=True,
                                     soft_shadow_stride=2))
    cfg, lcfg = ecfg.world, ecfg.lighting

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=False)
    print(f"world build {time.time() - t0:.1f}s", flush=True)

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
    print(f"camera y {cam_y}", flush=True)

    def mk_cam(i, trans=0.0):
        ang = 0.35 * i
        fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                       np.float32)
        fwd /= np.linalg.norm(fwd)
        wup = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, wup)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        pos = np.array([cx + trans * i, cam_y, cz + 0.4 * trans * i],
                       np.float32)
        return eng_mod.camera_arrays(
            Camera(pos=pos, forward=fwd, right=right.astype(np.float32),
                   up=(up / np.linalg.norm(up)).astype(np.float32)))

    def timeit(name, f, *a, reps=args.reps):
        try:
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        except Exception as e:
            print(f"{name:46s} FAILED: "
                  f"{str(e)[:240]}", flush=True)
            return None
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        print(f"{name:46s} {sorted(ts)[len(ts) // 2]:9.1f} ms  "
              f"(min {min(ts):.1f})", flush=True)
        return r

    # ---- jitted stages (table/sky as ARGUMENTS: a closed-over 268 MB
    # table ships as a constant in the remote-compile request -> 413) ----
    def prepass(tbl, sdf, sky, cam, hint_half, rc):
        tf = pipeline.make_trace_fn(None, None, cfg, rc, table=tbl,
                                    sky_y=sky)
        return pipeline.half_res_prepass(
            None, sdf, cfg, rc, lcfg, cam, trace_fn=tf,
            sky_y=sky, start_hint=hint_half)

    def primary(tbl, sky, cam, half_dist, hint_full, par):
        tf = pipeline.make_trace_fn(None, None, cfg, rcfg, table=tbl,
                                    sky_y=sky)
        start = pipeline.min_dist_upsample(half_dist)[:args.h]
        if hint_full is not None:
            start = jnp.maximum(start, hint_full)
        dx, dy, dz = pipeline._ray_dirs(cam, args.w, args.h,
                                        pixel_center=False)
        sel = lambda a: pipeline.checker_select(a, par)  # noqa: E731
        dx, dy, dz, start = sel(dx), sel(dy), sel(dz), sel(start)
        res = tf(cam.pos[0] + jnp.zeros_like(dx), cam.pos[1],
                 cam.pos[2], dx, dy, dz, start)
        return res

    def hints(prev_half_dist, cam, prev_cam):
        return pipeline.temporal_hints_from_prepass(
            prev_half_dist, cam, prev_cam, rcfg,
            sky_start=4.0 * cfg.size_x)

    prepass_j = jax.jit(
        lambda t, d, s, cam: prepass(t, d, s, cam, None, rcfg))
    prepass_h_j = jax.jit(
        lambda t, d, s, cam, hh: prepass(t, d, s, cam, hh, rcfg))
    rcfg_nc = dataclasses.replace(rcfg, prepass_cascade=1)
    prepass_nc_j = jax.jit(
        lambda t, d, s, cam, hh: prepass(t, d, s, cam, hh, rcfg_nc))
    primary_j = jax.jit(
        lambda t, s, cam, hd, par: primary(t, s, cam, hd, None, par))
    primary_h_j = jax.jit(primary)
    hints_j = jax.jit(hints)
    par0 = jax.device_put(jnp.int32(0))
    T, D, S = world.trace_table, world.sdf, world.sky_y

    for label, trans in (("rot", 0.0), ("trans0.8", 0.8)):
        cam0, cam1 = mk_cam(0, trans), mk_cam(1, trans)
        hd0, _ = prepass_j(T, D, S, cam0)
        hd0 = hd0 + 0.0  # materialize
        hh1, hf1 = timeit(f"[{label}] hint maps", hints_j, hd0, cam1, cam0)
        r = timeit(f"[{label}] prepass baseline", prepass_j, T, D, S, cam1)
        r = timeit(f"[{label}] prepass hinted", prepass_h_j, T, D, S, cam1,
                   hh1)
        hd1 = r[0] if r is not None else hd0
        timeit(f"[{label}] prepass hinted nocascade", prepass_nc_j,
               T, D, S, cam1, hh1)
        rb = timeit(f"[{label}] primary baseline", primary_j, T, S, cam1,
                    hd1, par0)
        rh = timeit(f"[{label}] primary hinted", primary_h_j, T, S, cam1,
                    hd1, hf1, par0)
        if rb is not None and rh is not None:
            sb = float(jnp.mean(rb.steps.astype(jnp.float32)))
            sh = float(jnp.mean(rh.steps.astype(jnp.float32)))
            hb = np.asarray(rb.hit)
            hhit = np.asarray(rh.hit)
            nmis = int((hb != hhit).sum())
            print(f"[{label}] primary tile-supersteps {sb:.1f} -> {sh:.1f}"
                  f"; hit mismatches {nmis}/{hb.size}", flush=True)


if __name__ == "__main__":
    main()
