"""Round-4 probe: where the world-build seconds go (VERDICT r3 #5).

Times each build phase INTERNAL step warm (second call) at 1024^3 on the
real chip: coarse occupancy reduce, X-scan, the two Pallas min-conv
passes, far-mip extension, the gather-table build, and the GI inits
(traced strided vs heightfield).

Usage: python scripts/probe_sdf_build.py [--cube 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, WorldConfig
    from rvgrt_tpu.gi import update as gi_update
    from rvgrt_tpu.trace import wavefront
    from rvgrt_tpu.world import sdf as sdf_mod
    from rvgrt_tpu.world import voxel_grid

    print(f"device={jax.devices()[0]}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    ecfg = EngineConfig(world=WorldConfig().with_cube(args.cube))
    cfg = ecfg.world

    def timed(name, f, *a, reps=2):
        r = f(*a)
        jax.tree.leaves(r)[0].block_until_ready()
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            jax.tree.leaves(r)[0].block_until_ready()
            ts.append(time.time() - t)
        print(f"{name:44s} {min(ts) * 1e3:9.1f} ms", flush=True)
        return r

    bits = timed("fine grid generate",
                 lambda: voxel_grid.generate(cfg, ecfg.terrain))

    occ = timed("coarse occupancy",
                jax.jit(functools.partial(voxel_grid.coarse_occupancy,
                                          cfg=cfg)), bits)
    cap = cfg.sdf_max_dist
    dx = timed("X scan (_axis_distance_1d)",
               jax.jit(functools.partial(sdf_mod._axis_distance_1d,
                                         axis=2, cap=cap)), occ)
    from rvgrt_tpu.ops.sdf_kernels import minconv_pass_pallas
    dxy = timed("min-conv Y (pallas)",
                jax.jit(functools.partial(minconv_pass_pallas, axis=1,
                                          cap=cap)), dx)
    dxyz = timed("min-conv Z (pallas)",
                 jax.jit(functools.partial(minconv_pass_pallas, axis=0,
                                           cap=cap)), dxy)
    sdf_base = dxyz.astype(jnp.uint8).reshape(-1)
    sdf = timed("far-mip extend",
                jax.jit(functools.partial(sdf_mod.extend_sdf_far,
                                          cfg=cfg)), sdf_base, occ)
    timed("full SDF phase (one jit, bench shape)",
          jax.jit(lambda b: sdf_mod.extend_sdf_far(
              sdf_mod.build_sdf(voxel_grid.coarse_occupancy(b, cfg), cfg),
              voxel_grid.coarse_occupancy(b, cfg), cfg)), bits)
    timed("trace table",
          jax.jit(functools.partial(wavefront.make_trace_table, cfg=cfg)),
          bits, sdf)
    sky = jax.jit(functools.partial(voxel_grid.sky_limit, cfg=cfg))(bits)
    sky.block_until_ready()
    table = wavefront.make_trace_table(bits, sdf, cfg)
    table.block_until_ready()

    timed("GI init heightfield",
          jax.jit(functools.partial(gi_update.init_gi_heightfield,
                                    ecfg=ecfg)), bits, reps=2)
    t0 = time.time()
    g = gi_update.init_gi_strided(bits, sdf, ecfg, sky_y=sky, table=table,
                                  stride=(2, 2))
    g.block_until_ready()
    print(f"{'GI init traced strided (2,2) warm':44s} "
          f"{(time.time() - t0) * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
