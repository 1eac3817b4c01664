"""Defensible v5e-8 projection (VERDICT r2 #5).

The round-2 "~8x -> 8-11 FPS" multi-chip roadmap was asserted, not
derived.  This probe measures the two unknowns ON THE REAL CHIP:

1. shard_map dispatch overhead at mesh=1 - the sharded render / GI /
   temporal-upscale paths vs their plain-jit twins, same shapes, chained
   dispatch, one closing sync (the tunnel timing discipline from
   bench.py).  Any per-frame cost the shard_map wrapping adds shows up
   here; the collectives themselves are identities at mesh=1.
2. per-frame collective BYTES per tier at the headline operating point,
   tabulated from the actual array shapes (not guessed).

It then derives the projected v5e-8 FPS:

  T_8 = T_single / 8 + overhead_shardmap + bytes_allgather / bw_ici

using the v5e ICI one-way per-link bandwidth range 4.5e10-9e10 B/s
(public "How to Scale Your Model" hardware table; all-gather of B bytes
over an N-ring costs ~B*(N-1)/N per link).  Prints the full model so
PERF.md can cite measured numbers instead of "~8x".

Usage (real chip):  python scripts/probe_v5e8.py
Knobs: PROBE_CUBE (10), PROBE_FRAMES (6), PROBE_W/H (1280x800).
"""

from __future__ import annotations

import dataclasses
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, LightingConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.gi import update as gi_update
    from rvgrt_tpu.parallel import sharding
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera
    from rvgrt_tpu.upscale import temporal as up_temporal

    cube = int(os.environ.get("PROBE_CUBE", "10"))
    frames = int(os.environ.get("PROBE_FRAMES", "6"))
    width = int(os.environ.get("PROBE_W", "1280"))
    height = int(os.environ.get("PROBE_H", "800"))

    dev = jax.devices()[0]
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    print(f"device {dev}; channel setup {time.time() - t0:.1f}s",
          flush=True)

    rcfg = dataclasses.replace(RenderConfig(), width=width, height=height,
                               dda_substeps=6, sdf_probe_interval=16,
                               dist_bias=4.0, gi_res_divisor=8,
                               prepass_divisor=4)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(cube), render=rcfg,
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=True,
                                     soft_shadow_stride=2),
        gi_straggler_budget=12, gi_init_stride=(2, 2))

    t0 = time.time()
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=True)
    print(f"world build {time.time() - t0:.1f}s", flush=True)

    size = ecfg.world.size_x
    cx, cz = size // 2, size // 2
    fwd = np.array([0.6, -0.5, 0.6], np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    cam = eng_mod.camera_arrays(Camera(
        pos=np.array([cx, min(96.0, ecfg.world.size_y - 2.0), cz],
                     np.float32),
        forward=fwd, right=right.astype(np.float32),
        up=(up / np.linalg.norm(up)).astype(np.float32)))

    mesh1 = sharding.make_mesh(1)

    def timed(label, step, state0, n=frames):
        """Chained dispatch, one closing readback (bench.py discipline)."""
        st = state0
        st, acc = step(st, jnp.zeros((), jnp.float32))   # compile
        float(acc)
        t0 = time.time()
        st, acc = step(st, acc)
        float(acc)
        warm = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            st, acc = step(st, acc)
        float(acc)
        dt = (time.time() - t0) / n
        print(f"{label}: {dt * 1e3:.1f} ms/frame (warm-single "
              f"{warm * 1e3:.0f} ms, {n} chained)", flush=True)
        return dt

    results = {}

    # ---- 1. full-res render, plain jit vs shard_map(mesh=1) ----
    plain_render = jax.jit(lambda b, s, g, a, c, sky, tbl: pipeline.render_frame(
        b, s, g, a, c, ecfg, include_gi=False, sky_y=sky, table=tbl))

    def step_plain(st, acc):
        out = plain_render(world.bits, world.sdf, world.gi, world.atlas,
                           cam, world.sky_y, world.trace_table)
        return st, acc + jnp.sum(out.depth)

    results["render_plain"] = timed("render plain jit", step_plain, None)

    def step_shard(st, acc):
        out = sharding.render_frame_sharded(
            world.bits, world.sdf, world.gi, world.atlas, cam, ecfg,
            mesh=mesh1, include_gi=False, sky_y=world.sky_y,
            table=world.trace_table)
        return st, acc + jnp.sum(out.depth)

    results["render_shard1"] = timed("render shard_map mesh=1", step_shard,
                                     None)

    # ---- 2. temporal upscale, plain vs shard_map(mesh=1) ----
    h3, w3 = 3 * height, 3 * width
    color = jnp.zeros((height, width, 3), jnp.float32) + 0.5
    motion = jnp.zeros((height, width, 2), jnp.float32)
    depth = jnp.ones((height, width), jnp.float32)
    jit_ndc = jnp.zeros((2,), jnp.float32)
    state0 = up_temporal.init_state(height, width)

    plain_up = jax.jit(lambda c, m, d, j, st: up_temporal.temporal_upscale(
        c, m, d, j, st, warp_taps="pallas"))

    def step_up_plain(st, acc):
        out, nst = plain_up(color, motion, depth, jit_ndc, st)
        return nst, acc + out[0, 0, 0]

    results["upscale_plain"] = timed("temporal upscale plain", step_up_plain,
                                     state0)

    packed0 = jax.jit(up_temporal.pack_state)(state0)

    def step_up_shard(st, acc):
        # same warp kernel on both sides (ADVICE r3: defaulting the slab
        # to "bilinear_shift" conflated kernel choice with dispatch cost -
        # the exact confound the round-3 PERF entry documents)
        out, npk = sharding.temporal_upscale_sharded(color, motion, jit_ndc,
                                                     st, mesh1,
                                                     warp_taps="pallas")
        return npk, acc + out[0, 0, 0]

    results["upscale_shard1"] = timed("temporal upscale shard_map mesh=1",
                                      step_up_shard, packed0)

    # ---- 3. GI update, plain vs shard_map(mesh=1) ----
    fr0 = jax.device_put(jnp.uint32(0))
    off0 = jax.device_put(jnp.int32(0))
    # arrays must be jit ARGS, not closures: a closed-over world array is
    # baked into the program and ships in the remote-compile request
    # (observed HTTP 413 through the tunnel - the verify-skill trap)
    plain_gi = jax.jit(lambda g, b, s, a, fr, off, sky, tbl:
                       gi_update.update_gi(g, b, s, a, ecfg, fr, off,
                                           sky_y=sky, table=tbl))

    def step_gi_plain(st, acc):
        g = plain_gi(st, world.bits, world.sdf, world.atlas, fr0, off0,
                     world.sky_y, world.trace_table)
        return g, acc + g[0].astype(jnp.float32)

    results["gi_plain"] = timed("GI update plain", step_gi_plain, world.gi)

    def step_gi_shard(st, acc):
        g = sharding.update_gi_sharded(st, world.bits, world.sdf,
                                       world.atlas, ecfg, 0, 0, mesh1,
                                       sky_y=world.sky_y,
                                       table=world.trace_table)
        return g, acc + g[0].astype(jnp.float32)

    results["gi_shard1"] = timed("GI update shard_map mesh=1", step_gi_shard,
                                 world.gi)

    # ---- 4. collective byte table + derived 8-chip model ----
    n = 8
    f32 = 4
    bytes_tbl = {
        # low-res frame outputs resharded to replicated for the upscaler
        "lowres_color_allgather": height * width * 3 * f32,
        "lowres_motion_allgather": height * width * 2 * f32,
        # NOTE: low-res depth is only all-gathered when the (default-off)
        # temporal depth_reject option is on - excluded from the default
        # model so this table matches PERF.md's round-3 total (57.5 MB);
        # +4.1 MB (~+0.08 ms ring transit) when depth_reject is enabled.
        # packed temporal history (u32/display pixel) re-replicated
        "packed_history_allgather": h3 * w3 * 4,
        # GI window shards all-gathered before the grid write-back
        "gi_window_allgather": ecfg.gi_window * 4,
    }
    total_b = sum(bytes_tbl.values())
    print("\nper-frame collective bytes (8-chip pixel sharding, "
          f"{width}x{height} -> {w3}x{h3}):", flush=True)
    for k, v in bytes_tbl.items():
        print(f"  {k}: {v / 1e6:.2f} MB")
    print(f"  TOTAL: {total_b / 1e6:.2f} MB")

    ov_render = max(0.0, results["render_shard1"] - results["render_plain"])
    ov_up = max(0.0, results["upscale_shard1"] - results["upscale_plain"])
    ov_gi = max(0.0, results["gi_shard1"] - results["gi_plain"])
    overhead = ov_render + ov_up + ov_gi
    # headline single-chip frame time measured by bench.py this round
    t_single = float(os.environ.get("PROBE_T_SINGLE_MS", "315")) / 1e3
    for bw in (4.5e10, 9.0e10):
        t_coll = total_b * (n - 1) / n / bw
        t8 = t_single / n + overhead + t_coll
        print(f"\nmodel @ ICI {bw / 1e9:.0f} GB/s/link: T_single "
              f"{t_single * 1e3:.0f} ms -> T_8 = {t_single * 1e3 / n:.1f}"
              f" + overhead {overhead * 1e3:.1f} + collectives "
              f"{t_coll * 1e3:.2f} ms = {t8 * 1e3:.1f} ms "
              f"({1.0 / t8:.1f} FPS projected)", flush=True)
    print("\nresults_ms:",
          {k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
