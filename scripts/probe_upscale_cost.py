"""Probe: temporal-upscale internals at the operating point (3840x2400).

The accumulator is ~172 ms/frame - the #3 stage after primary and
prepass.  Time the pieces standalone (same shapes as production):

  * jitter_upsample (phase conv, dense VPU at display res),
  * history warp (1 packed gather + shifts),
  * neighborhood box + motion-adaptive params (low res + repeats),
  * full temporal_upscale for reference,
  * variant: nearest warp (1 gather, no shift stack).

Usage: python scripts/probe_upscale_cost.py [--h 800 --w 1280 --reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=800)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.upscale import temporal as t

    h, w = args.h, args.w
    print(f"device={jax.devices()[0]} {w}x{h} -> {3*w}x{3*h}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    motion = jnp.asarray(rng.normal(0, 0.003, (h, w, 2)), jnp.float32)
    depth = jnp.ones((h, w), jnp.float32)
    jit = jnp.asarray([0.2 / w, -0.3 / h], jnp.float32)
    state = t.TemporalState(
        history=jnp.asarray(rng.random((3 * h, 3 * w, 3)), jnp.float32),
        conf=jnp.asarray(rng.random((3 * h, 3 * w)) * 8, jnp.float32))

    def timeit(name, f, *a, reps=args.reps):
        r = f(*a)
        jax.block_until_ready(r)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf[:8, :8].astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf[:8, :8].astype(jnp.float32)))
            ts.append((time.time() - t0) * 1e3)
        print(f"{name:44s} {sorted(ts)[len(ts)//2]:8.1f} ms", flush=True)

    timeit("jitter_upsample", jax.jit(t.jitter_upsample), color, jit)
    timeit("warp [bilinear_shift]",
           jax.jit(lambda s, m: t._warp_state(s, m, taps="bilinear_shift")),
           state, motion)
    timeit("warp [nearest]",
           jax.jit(lambda s, m: t._warp_state(s, m, taps="nearest")),
           state, motion)
    timeit("neighborhood box (scalar gamma)",
           jax.jit(lambda c: t._neighborhood_box(c, 1.0)), color)
    timeit("pack_state", jax.jit(t.pack_state), state)
    timeit("FULL temporal_upscale",
           jax.jit(t.temporal_upscale), color, motion, depth, jit, state)
    timeit("FULL [nearest warp]",
           jax.jit(lambda c, m, d, j, s: t.temporal_upscale(
               c, m, d, j, s, warp_taps="nearest")),
           color, motion, depth, jit, state)
    print("done", flush=True)


if __name__ == "__main__":
    main()
