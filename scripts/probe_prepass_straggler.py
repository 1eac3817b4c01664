"""Probe: two-phase straggler respite on the half-res prepass primary.

The prepass primary (256K lanes from cascade starts) runs ~29 mean
tile-supersteps vs the full-res primary's ~14.5 - the heaviest camera-ray
tail - and at 256K lanes the compaction that made the respite NEGATIVE at
1M lanes costs 4x less.  Within-run A/B at the stage-5 operating point.

Usage: python scripts/probe_prepass_straggler.py [--cube 10 --reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import (EngineConfig, LightingConfig,
                                  RenderConfig, WorldConfig)
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline

    import math

    rcfg = dataclasses.replace(RenderConfig(), width=1280, height=800,
                               dda_substeps=6, sdf_probe_interval=16,
                               dist_bias=4.0)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube), render=rcfg,
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=True,
                                     soft_shadow_stride=2))
    cfg = ecfg.world
    print(f"device={jax.devices()[0]} world={2**args.cube}^3", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)
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
    from rvgrt_tpu.scene.camera import Camera
    fwd = np.array([math.cos(0.5) * 0.87, -0.5, math.sin(0.5) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup); right /= np.linalg.norm(right)
    up = np.cross(fwd, right); up /= np.linalg.norm(up)
    cam = eng_mod.camera_arrays(Camera(
        pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
        right=right.astype(np.float32), up=up.astype(np.float32)))

    def timeit(name, f, *a, reps=args.reps):
        r = f(*a)
        jax.block_until_ready(r)
        float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
            ts.append((time.time() - t) * 1e3)
        print(f"{name:52s} {sorted(ts)[len(ts)//2]:9.1f} ms "
              f"(min {min(ts):.1f})", flush=True)
        return r

    for budget in (0, 12, 16, 24):
        rc = dataclasses.replace(rcfg, straggler_budget=budget)
        pre_j = jax.jit(lambda tb, sd, sy, rc=rc: pipeline.half_res_prepass(
            None, sd, cfg, rc, ecfg.lighting, cam, table=tb, sky_y=sy))
        r = timeit(f"prepass pair soft-s2 [budget={budget}]", pre_j,
                   world.trace_table, world.sdf, world.sky_y)
        if budget == 0:
            base = np.asarray(r[0])
        else:
            d = np.abs(np.asarray(r[0]) - base)
            print(f"    |dist delta| max {d.max():.4f} "
                  f"mean {d.mean():.6f}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
