"""Checkerboard-under-motion quality gate (VERDICT r3 #7).

Replays a deterministic moving camera path and accumulates, closed loop:
  * the full-rate pipeline (every pixel traced every frame),
  * the checkerboard pipeline (half the pixels per frame, alternating
    parity; untraced half neighbor-filled and down-weighted by the
    accumulator's validity mask),
and, per pose, an SSAA-supersampled reference target.

Reports, over the moving tail (history warm):
  * checker-vs-full output PSNR (agreement),
  * full-vs-truth and checker-vs-truth PSNR (what checkerboarding
    actually costs in delivered quality).

Usage: python scripts/probe_checker_motion.py [--cube 7] [--frames 24]
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
    p.add_argument("--cube", type=int, default=7)
    p.add_argument("--low-w", type=int, default=128)
    p.add_argument("--low-h", type=int, default=80)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--warm", type=int, default=6,
                   help="frames excluded from the reported means")
    p.add_argument("--ssaa", type=int, default=4)
    p.add_argument("--gi", action="store_true", default=True)
    p.add_argument("--mode", choices=["checker", "quarter"],
                   default="checker",
                   help="rate-cut shape: 2-phase checkerboard or 4-phase "
                        "quarter interleave")
    p.add_argument("--comp-cadence", type=int, default=2,
                   help="GI-composite reuse cadence for the checker "
                        "variant (1 = composite every frame)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver.cli import spawn_above_terrain
    from rvgrt_tpu.driver.engine import Engine, camera_arrays
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import InputState, phase_jitter_sequence
    from rvgrt_tpu.upscale import model as up_model
    from rvgrt_tpu.upscale import temporal

    print(f"device={jax.devices()[0]}", flush=True)
    h, w = args.low_h, args.low_w
    S = up_model.SCALE
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(args.cube),
        render=dataclasses.replace(RenderConfig(), width=w, height=h))
    hi_cfg = dataclasses.replace(ecfg, render=dataclasses.replace(
        ecfg.render, width=w * S, height=h * S))
    lo = Engine(ecfg, include_gi=args.gi, verbose=False)
    hi = Engine(hi_cfg, include_gi=args.gi, verbose=False)
    hi.world = lo.world
    hi.character.use_jitter = False
    lo.character.jitter_sequence = phase_jitter_sequence(3)
    spawn = spawn_above_terrain(lo)
    hi.character.position = spawn.copy()
    world = lo.world

    # deterministic motion script: fly forward + slow pan + a strafe leg
    def inputs(i):
        if i < args.frames // 2:
            return InputState(move_z=1.0, mouse_dx=6.0)
        return InputState(move_z=0.6, move_x=1.0, mouse_dx=-4.0)

    full_j = jax.jit(lambda b, s, g, a, cam, sky, tbl: pipeline.render_frame(
        b, s, g, a, cam, ecfg, include_gi=args.gi, sky_y=sky, table=tbl))
    # the checker variant runs the BENCH pipeline shape: split dispatch
    # (base + gi_composite) so the composite can be reused across frames
    if args.mode == "quarter":
        ck_j = jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                       pipeline.render_frame(
                           b, s, g, a, cam, ecfg, include_gi=False,
                           sky_y=sky, table=tbl, return_gbuffer=args.gi,
                           quarter_phase=par))
    else:
        ck_j = jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                       pipeline.render_frame(
                           b, s, g, a, cam, ecfg, include_gi=False,
                           sky_y=sky, table=tbl, return_gbuffer=args.gi,
                           checker_parity=par))
    comp_j = jax.jit(lambda col, gb, g, s: pipeline.gi_composite(
        col, gb, g, s, ecfg, return_addend=True))
    hi_j = jax.jit(lambda b, s, g, a, cam, sky, tbl: pipeline.render_frame(
        b, s, g, a, cam, hi_cfg, include_gi=args.gi, sky_y=sky,
        table=tbl).color)

    from rvgrt_tpu.gi import update as gi_update

    gi_j = jax.jit(lambda g, b, s, a, fr, off, sky, tbl:
                   gi_update.update_gi(g, b, s, a, ecfg, fr, off,
                                       sky_y=sky, table=tbl))

    st_full = temporal.init_state(h, w)
    st_ck = temporal.init_state(h, w)
    addend_prev = None
    agree, full_t, ck_t = [], [], []
    gi_grid = world.gi
    t0 = time.time()
    for i in range(args.frames):
        inp = inputs(i)
        lo.character.update(inp, 1.0 / 60.0, i)
        hi.character.position = lo.character.position.copy()
        hi.character.yaw = lo.character.yaw
        hi.character.pitch = lo.character.pitch
        hi.character.velocity = lo.character.velocity.copy()
        hi.character.update(InputState(), 0.0, i)
        cam = camera_arrays(lo.character.camera,
                            lo.character.unjittered_view_projection,
                            lo.character.prev_unjittered_view_projection,
                            lo.character.ray_jitter_ndc(), i / 60.0)
        if args.gi:
            gi_grid = gi_j(gi_grid, world.bits, world.sdf, world.atlas,
                           jnp.uint32(i), jnp.int32(0), world.sky_y,
                           world.trace_table)

        full = full_j(world.bits, world.sdf, gi_grid, world.atlas, cam,
                      world.sky_y, world.trace_table)
        out_full, st_full = temporal.temporal_upscale(
            full.color, full.motion, full.depth, cam.jitter, st_full)

        par = jnp.int32(i & (3 if args.mode == "quarter" else 1))
        r = ck_j(world.bits, world.sdf, gi_grid, world.atlas, cam,
                 world.sky_y, world.trace_table, par)
        half, gb = r if args.gi else (r, None)
        if args.gi:
            if i % args.comp_cadence == 0:
                col, addend_prev = comp_j(half.color, gb, gi_grid,
                                          world.sdf)
            else:
                col = jnp.clip(half.color + addend_prev, 0.0, 1.0)
            half = half._replace(color=col)
        if args.mode == "quarter":
            ex = lambda a: pipeline.quarter_expand(a, par)  # noqa: E731
            valid = pipeline.quarter_valid_mask(h, w, par)
        else:
            ex = lambda a: pipeline.checker_expand(a, par)  # noqa: E731
            valid = pipeline.checker_valid_mask(h, w, par)
        out_ck, st_ck = temporal.temporal_upscale(
            ex(half.color), ex(half.motion), ex(half.depth), cam.jitter,
            st_ck, valid=valid)

        # SSAA target at the unjittered hi-res pose
        hcam = camera_arrays(hi.character.camera,
                             hi.character.unjittered_view_projection,
                             hi.character.prev_unjittered_view_projection,
                             (0.0, 0.0), i / 60.0)
        acc = None
        rng = np.random.default_rng(1000 + i)
        for k in range(max(args.ssaa, 1)):
            if args.ssaa > 1:
                jx, jy = rng.random(2) - 0.5
                jcam = camera_arrays(
                    hi.character.camera,
                    hi.character.unjittered_view_projection,
                    hi.character.prev_unjittered_view_projection,
                    (2.0 * jx / (w * S), 2.0 * jy / (h * S)), i / 60.0)
            else:
                jcam = hcam
            img = hi_j(world.bits, world.sdf, gi_grid, world.atlas, jcam,
                       world.sky_y, world.trace_table)
            acc = img if acc is None else acc + img
        target = acc / max(args.ssaa, 1)

        def psnr(a, b):
            mse = float(jnp.mean((a - b) ** 2))
            return 99.0 if mse < 1e-12 else 10.0 * math.log10(1.0 / mse)

        pa = psnr(out_full, out_ck)
        pf = psnr(out_full, target)
        pc = psnr(out_ck, target)
        if i >= args.warm:
            agree.append(pa)
            full_t.append(pf)
            ck_t.append(pc)
        print(f"frame {i}: checker-vs-full {pa:.2f} dB, "
              f"full-vs-truth {pf:.2f}, checker-vs-truth {pc:.2f}",
              flush=True)

    print(f"\n== moving tail (frames {args.warm}..{args.frames - 1}, "
          f"{time.time() - t0:.0f}s) ==")
    print(f"checker-vs-full:  {np.mean(agree):.2f} dB")
    print(f"full-vs-truth:    {np.mean(full_t):.2f} dB")
    print(f"checker-vs-truth: {np.mean(ck_t):.2f} dB  "
          f"(checker cost {np.mean(full_t) - np.mean(ck_t):+.2f} dB)")


if __name__ == "__main__":
    main()
