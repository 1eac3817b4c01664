"""Volume-ring scaling measurement on a virtual CPU mesh.

VERDICT item 8: with empty-device round skip + bounded handoff packets
(parallel/volume.py), measure the z-slab ray-handoff ring at 2 vs 4 vs 8
devices within one run.  Absolute CPU times are NOT TPU times; the
load-bearing number is the RELATIVE cost of adding shards to a
fixed-size ray set (ring rounds scale with shard count - the question is
how much the round skip + packet bounding recover).

Usage: JAX_PLATFORMS=cpu python scripts/probe_volume_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from rvgrt_tpu.config import RenderConfig, WorldConfig
    from rvgrt_tpu.parallel import sharding, volume
    from rvgrt_tpu.trace import wavefront
    from rvgrt_tpu.world import sdf as sdf_mod, voxel_grid as vg

    assert len(jax.devices()) >= 8, jax.devices()

    cfg = WorldConfig().with_cube(8)  # 256^3
    bits = vg.generate(cfg)
    sdf = sdf_mod.build_sdf(vg.coarse_occupancy(bits, cfg), cfg)
    rcfg = RenderConfig()
    print(f"world {cfg.size_x}^3 on {len(jax.devices())} virtual CPU "
          f"devices", flush=True)

    # camera-style ray fan from above the terrain, plunging through
    # several z-slabs (the handoff-heavy direction)
    h, w = 128, 256
    o = np.float32([128.0, 200.0, 8.0])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = -0.5 + 1.0 * (xs / w)
    dy = -0.15 - 0.5 * (ys / h)
    dz = 0.9 * np.ones_like(dx)
    n_ = np.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx / n_, dy / n_, dz / n_
    t0 = jnp.zeros((h, w), jnp.float32)

    def timeit(name, f, *a, reps=3):
        r = f(*a)
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t = time.time()
            r = f(*a)
            jax.block_until_ready(r)
            ts.append((time.time() - t) * 1e3)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:46s} {med:9.1f} ms  (min {min(ts):.1f})", flush=True)
        return r

    base = timeit(
        "single-device wavefront trace",
        jax.jit(lambda b, s: wavefront.trace(
            b, s, cfg, rcfg, o[0], o[1], o[2], dx, dy, dz, t0)),
        bits, sdf)
    base_hit = np.asarray(base.hit)
    print(f"    hit_frac={base_hit.mean():.4f}", flush=True)

    N = h * w
    fl = lambda a: jnp.asarray(np.broadcast_to(a, (h, w)).reshape(N),
                               jnp.float32)
    rays = (fl(o[0]), fl(o[1]), fl(o[2]), fl(dx), fl(dy), fl(dz),
            jnp.zeros(N, jnp.float32))
    for n in (2, 4, 8):
        mesh = sharding.make_mesh(n, axis="z")
        tables = volume.build_shard_tables(bits, sdf, cfg, mesh)
        res = timeit(
            f"volume ring trace [{n} shards]",
            lambda tbl=tables, m=mesh: volume.trace_volume_sharded(
                tbl, cfg, rcfg, m, *rays))
        hit = np.asarray(res.hit).reshape(h, w)
        agree = float((hit == base_hit).mean())
        print(f"    hit agreement vs single: {agree:.4f}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
