"""Round-3 probe: Pallas history-warp kernel vs the XLA gather.

At the display resolution (3840x2400) with a realistic motion field
(rotation-dominant + a depth-edge discontinuity band), measures:

  - XLA packed gather warp (bilinear taps - the current default's cost)
  - Pallas windowed-DMA warp (ops/warp_kernels.warp_packed_bilinear)
  - correctness: kernel vs the exact XLA 4-tap bilinear oracle
  - the out-of-window overflow count

Usage: python scripts/probe_r11.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.ops import warp_kernels as wk

    print(f"device={jax.devices()[0]}", flush=True)
    float(jnp.zeros((), jnp.float32) + 1.0)

    H, W = 2400, 3840
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.integers(0, 2**32, size=(H, W), dtype=np.uint64)
        .astype(np.uint32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # rotation-like smooth shift + scale, plus a discontinuity band (a
    # depth silhouette: motion jumps by ~40 px across a curve)
    xs = xx * 1.02 - 37.0 + 9.0 * np.sin(yy / 211.0)
    ys = yy * 1.01 + 12.0 + 5.0 * np.cos(xx / 173.0)
    band = (np.sin(xx / 97.0) + np.cos(yy / 131.0)) > 1.2
    xs = np.where(band, xs + 41.0, xs)
    ys = np.where(band, ys - 17.0, ys)
    xs = jnp.asarray(np.clip(xs, 0, W - 1))
    ys = jnp.asarray(np.clip(ys, 0, H - 1))

    def timeit(name, f, *a, reps=3):
        r = f(*a)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            leaf = jax.tree.leaves(r)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
            ts.append((time.time() - t) * 1e3)
        print(f"{name:42s} {sorted(ts)[len(ts) // 2]:9.1f} ms "
              f"(min {min(ts):.1f})", flush=True)
        return r

    ref = timeit("XLA 4-tap bilinear oracle",
                 jax.jit(wk.warp_packed_bilinear_xla), packed, xs, ys)
    got = timeit("Pallas windowed warp",
                 jax.jit(wk.warp_packed_bilinear), packed, xs, ys)
    if got is not None and ref is not None:
        ovf = int(got[1])
        diff = np.abs(np.asarray(ref[0]) - np.asarray(got[0]))
        # exclude overflow lanes? report both
        print(f"overflow lanes: {ovf}/{H * W}", flush=True)
        print(f"max abs diff: {diff.max():.6f}; "
              f"mismatched(>1e-5): {(diff > 1e-5).mean():.6%}", flush=True)


if __name__ == "__main__":
    main()
