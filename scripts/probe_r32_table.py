"""Round-5 probe: where do the 24 s of the 2048^3 trace-table phase go?

Times, separately jitted and warm (2 reps each):
  * ``to_brick_words`` (the 4x2x4 nibble-shuffle repack) as shipped
    (64 strided-slice ``.at[xg::8].add`` updates per z-chunk - strided
    updates lower to scatters on TPU);
  * a dense reformulation: per (by,bz), repeat each canonical word 8x
    along x and shift by ``4*(i&7)`` - elementwise only, no scatters
    (bit-exactness asserted against the shipped path);
  * the SDF 4-cells/word byte pack;
  * the full ``make_trace_table``.

Usage: python scripts/probe_r32_table.py [--cube 11]
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import WorldConfig
    from rvgrt_tpu.world import voxel_grid as vg
    from rvgrt_tpu.trace import wavefront
    from rvgrt_tpu.driver.engine import _sdf_phase_fn

    print(f"device={jax.devices()[0]}", flush=True)
    cfg = WorldConfig().with_cube(args.cube)
    t0 = time.time()
    bits = vg.generate(cfg)
    bits.block_until_ready()
    print(f"generate {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    sdf = jax.jit(_sdf_phase_fn, static_argnums=1)(bits, cfg)
    sdf.block_until_ready()
    print(f"sdf {time.time() - t0:.1f}s", flush=True)

    def timed(name, fn, *a):
        out = None
        for rep in range(2):
            t0 = time.time()
            out = fn(*a)
            out.block_until_ready()
            tag = "cold" if rep == 0 else "warm"
            print(f"{name:28s} {tag:4s} {time.time() - t0:7.2f} s",
                  flush=True)
        return out

    brick = timed("to_brick_words (shipped)",
                  jax.jit(vg.to_brick_words, static_argnums=1), bits, cfg)
    brick2 = timed("to_brick_words_dense",
                   jax.jit(vg.to_brick_words_dense, static_argnums=1),
                   bits, cfg)
    eq = bool((brick == brick2).all())
    print(f"dense == shipped: {eq}", flush=True)
    del brick, brick2

    def sdf_pack(s):
        s = s.astype(jnp.uint32)
        return (s[0::4] | (s[1::4] << 8) | (s[2::4] << 16)
                | (s[3::4] << 24))

    timed("sdf byte pack", jax.jit(sdf_pack), sdf)
    timed("make_trace_table (full)",
          jax.jit(wavefront.make_trace_table, static_argnums=2),
          bits, sdf, cfg)
    print("done", flush=True)


if __name__ == "__main__":
    main()
