"""Round-5 probe: where do the 2048^3 fine-grid-generate seconds go?
(VERDICT r4 #7: stage-5 build <= 90 s total, fine grid <= 40 s.)

The round-4 census (PERF.md) pinned the build as compile-bound at
1024^3; at 2048^3 the fine grid was 75 s (BASELINE round-4 table) - this
probe separates compute vs dispatch vs compile for the generate phase:

  * eager ``voxel_grid.generate`` (the build path; lax.map over z-slabs)
    at slab_z 8 (default) / 32 / 64 - if per-iteration overhead
    dominates, bigger slabs collapse it at identical FLOPs (bit-exact:
    the slab is a pure index-range restriction);
  * the same under one jit (compile amortization + scheduling);
  * second call (warm) of each - isolates compile from run.

Usage: python scripts/probe_r30_worldbuild.py [--cube 11] [--slabs 8,32,64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=11)
    p.add_argument("--slabs", type=str, default="8,32,64")
    p.add_argument("--skip-jit", action="store_true")
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

    from rvgrt_tpu.config import WorldConfig
    from rvgrt_tpu.world import voxel_grid

    cfg = WorldConfig().with_cube(args.cube)
    print(f"world {cfg.size_x}^3, {cfg.num_words * 4 / 1e9:.2f} GB bits",
          flush=True)

    ref_sum = None
    for slab_z in [int(s) for s in args.slabs.split(",")]:
        for mode in (["eager", "jit"] if not args.skip_jit else ["eager"]):
            fn = voxel_grid.generate
            if mode == "jit":
                fn = jax.jit(voxel_grid.generate, static_argnums=(0,),
                             static_argnames=("slab_z",))
            for rep in range(2):
                t0 = time.time()
                try:
                    bits = fn(cfg, slab_z=slab_z)
                    bits.block_until_ready()
                except Exception as e:
                    print(f"slab_z={slab_z:3d} {mode:5s} FAILED: "
                          f"{str(e)[:200]}", flush=True)
                    break
                dt = time.time() - t0
                tag = "cold(+compile)" if rep == 0 else "warm"
                print(f"slab_z={slab_z:3d} {mode:5s} {tag:14s} {dt:7.1f} s",
                      flush=True)
                # deterministic wraparound checksum (uint32 sum)
                s = int(jnp.sum(bits))
                if ref_sum is None:
                    ref_sum = s
                elif s != ref_sum:
                    print(f"    BIT MISMATCH: sum {s} != {ref_sum}",
                          flush=True)
                del bits

    print("done", flush=True)


if __name__ == "__main__":
    main()
