"""Probe: straggler respite for the GI update's bounce rays.

At the 2048^3 stage-5 world the GI update window is 262K cells (the
reference's own grid size) and dominates the frame (~0.8 s of 2.1 s).
Bounce rays are random directions - the most tile-divergent population in
the engine, exactly the tail PERF.md kept the two-phase machinery for.
Within-run A/B: update_gi with straggler_budget 0 (default) vs 12/20,
plus the GI update split into its sun and bounce halves for attribution.

Usage: python scripts/probe_gi_straggler.py [--cube 11 --reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=11)
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
    from rvgrt_tpu.gi import update as gi_update

    rcfg = dataclasses.replace(RenderConfig(), width=1280, height=800,
                               dda_substeps=6, sdf_probe_interval=16,
                               dist_bias=4.0)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube), render=rcfg,
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=True,
                                     soft_shadow_stride=2))
    print(f"device={jax.devices()[0]} world={2**args.cube}^3 "
          f"gi_window={ecfg.gi_window}", flush=True)

    float(jnp.zeros((), jnp.float32) + 1.0)
    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=True)
    print(f"world build {time.time() - t0:.1f}s", flush=True)

    def timeit(name, f, *a, reps=args.reps):
        r = f(*a)
        jax.block_until_ready(r)
        float(jnp.sum(jax.tree.leaves(r)[0][:16].astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            float(jnp.sum(jax.tree.leaves(r)[0][:16].astype(jnp.float32)))
            ts.append((time.time() - t) * 1e3)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:52s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    # measured bound for straggler_cap_frac: fraction of bounce rays still
    # marching after the phase-1 budget, across several window offsets
    import numpy as np

    from rvgrt_tpu.trace import wavefront
    from rvgrt_tpu.world import gi_grid

    rc1 = dataclasses.replace(ecfg.render, max_supersteps=12)

    def unfinished_frac(tb, sy, off):
        # NB: tb/sy are jit ARGS - closing over the 2.3 GB table overflows
        # the remote-compile request (HTTP 413)
        n = ecfg.gi_window
        idx = off + jnp.arange(n, dtype=jnp.int32)
        idx = idx.reshape(-1, 4096)
        wx, wy, wz = gi_grid.cell_world_centers(ecfg.world, idx)
        seed = idx.astype(jnp.uint32) + jnp.uint32(7) * jnp.uint32(198491317)
        bdx, bdy, bdz = gi_update.random_sphere_dirs(seed)
        r = wavefront.trace(None, None, ecfg.world, rc1, wx, wy, wz,
                            bdx, bdy, bdz, jnp.full_like(wx, 0.001),
                            table=tb, sky_y=sy, _return_resume=True)
        return jnp.mean((r.exit_dir >= 2).astype(jnp.float32))

    uf = jax.jit(unfinished_frac)
    fracs = [float(uf(world.trace_table, world.sky_y,
                      jnp.int32(o * ecfg.gi_window))) for o in range(6)]
    print(f"bounce-ray unfinished fraction after 12 supersteps: "
          f"max {max(fracs):.4f} mean {np.mean(fracs):.4f} "
          f"(cap must exceed ~2.5x the max)", flush=True)

    for budget, cap in ((0, 0.25), (12, 0.25), (20, 0.25), (12, 0.15)):
        ec = dataclasses.replace(
            ecfg, gi_straggler_budget=budget,
            render=dataclasses.replace(ecfg.render,
                                       straggler_cap_frac=cap))
        gi_j = jax.jit(lambda g, b, s, a, tb, sy, fr, off, ec=ec:
                       gi_update.update_gi(g, b, s, a, ec, fr, off,
                                           sky_y=sy, table=tb))
        timeit(f"GI update [budget={budget} cap={cap}]", gi_j, world.gi,
               world.bits, world.sdf, world.atlas, world.trace_table,
               world.sky_y, jnp.uint32(1), jnp.int32(0))

    print("done", flush=True)


if __name__ == "__main__":
    main()
