"""Round-2 probe B: GI window scaling, history-warp variants, probe-interval.

Within-run A/Bs at the stage-5 operating point (only same-process numbers
are load-bearing through the tunnel, PERF.md):

  1. world build wall time with a warm persistent compile cache
     (VERDICT item 3: target < 60 s at 1024^3);
  2. GI update: derived reference-relative window (gi_num_cells/512) vs
     the reference's absolute RAYPS = 64^3 window;
  3. upscale step: bilinear (f32 x 3 gathers/tap) vs bilinear_packed
     (u32, 1 gather/tap) vs nearest_packed (1 tap);
  4. prepass pair + full-res primary with sdf_probe_interval 8 (reference)
     vs 4 (2x more long-jump opportunities).

Usage: python scripts/probe_r2b.py [--cube 10 --w 1280 --h 800 --reps 3]
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

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.gi import update as gi_update
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.trace import wavefront

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=args.w,
                                   height=args.h))
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"{args.w}x{args.h}", flush=True)

    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"tunnel setup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=True)
    print(f"world build (warm cache) {time.time() - t0:.1f}s", flush=True)

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
        print(f"{name:52s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    h, w = args.h, args.w
    sky_y = world.sky_y

    # ---- 2. GI window A/B ----
    for label, ec in (
            (f"derived ({ecfg.gi_window} cells)", ecfg),
            ("RAYPS 64^3",
             dataclasses.replace(ecfg, gi_rays_per_frame=64 ** 3))):
        gj = jax.jit(lambda gi, fr, off, _ec=ec: gi_update.update_gi(
            gi, world.bits, world.sdf, world.atlas, _ec, fr, off,
            sky_y=sky_y, table=world.trace_table))
        timeit(f"GI update [{label}]", gj, world.gi, jnp.uint32(1),
               jnp.int32(0))

    # ---- 3. upscale warp variants ----
    from rvgrt_tpu.upscale import model as up_model
    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "upscaler.pkl")
    if os.path.exists(ckpt):
        net, params = up_model.load_checkpoint(ckpt)
    else:
        net, params = up_model.init_params(jax.random.PRNGKey(0), h, w)
    base_j = jax.jit(lambda: pipeline.render_frame(
        world.bits, world.sdf, world.gi, world.atlas, cam, ecfg,
        include_gi=False, sky_y=sky_y, table=world.trace_table))
    out = base_j()
    hist = jnp.zeros((h * up_model.SCALE, w * up_model.SCALE, 3),
                     jnp.float32)
    for mode in ("bilinear", "bilinear_packed", "nearest_packed"):
        uj = jax.jit(lambda c, m, d, hi, _m=mode: up_model.upscale(
            net, params, c, m, d, cam.jitter, hi, warp_mode=_m)[0])
        timeit(f"3x upscale [{mode}]", uj, out.color, out.motion,
               out.depth, hist)

    # ---- 4. probe-interval A/B (prepass pair + full-res primary) ----
    for interval in (8, 4):
        rc = dataclasses.replace(rcfg, sdf_probe_interval=interval)

        def prepass(_rc=rc):
            return pipeline.half_res_prepass(None, None, cfg, _rc, lcfg,
                                             cam, table=world.trace_table,
                                             sky_y=sky_y)

        def primary(st, _rc=rc):
            dx, dy, dz = pipeline._ray_dirs(cam, w, h, pixel_center=False)
            r = wavefront.trace(None, None, cfg, _rc,
                                cam.pos[0], cam.pos[1], cam.pos[2],
                                dx, dy, dz, st, table=world.trace_table,
                                sky_y=sky_y)
            return r.its

        pj = jax.jit(prepass)
        hd, _ = pj()
        timeit(f"prepass pair [interval={interval}]", pj)
        start = pipeline.min_dist_upsample(hd)
        its = timeit(f"full-res primary [interval={interval}]",
                     jax.jit(primary), start)
        print(f"    mean its/ray: "
              f"{float(jnp.mean(its.astype(jnp.float32))):.1f}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
