"""Rate-tier-under-motion quality gate (VERDICT r3 #7, r4 #1).

Replays a deterministic moving camera path and accumulates, closed loop:
  * the full-rate pipeline (every pixel traced every frame),
  * one or more rate-cut variants: 2-phase checkerboard, 4-phase quarter
    interleave, and the motion-ADAPTIVE scheduler (render/scheduler.py)
    that picks checker under fast motion and quarter when slow/static,
and, per pose, an SSAA-supersampled reference target.

Reports, over the moving tail (history warm), per variant:
  * variant-vs-full output PSNR (agreement),
  * full-vs-truth and variant-vs-truth PSNR (what the rate cut actually
    costs in delivered quality),
  * for adaptive: the tier mix it chose.

Motion scripts:
  * ``pan``   - the round-3/4 gate: fly forward + fast pan, then a
                strafe leg (every frame is fast; the checker gate path).
  * ``mixed`` - an interactive profile in thirds: fast pan / slow look /
                near-static dwell (the adaptive scheduler's home turf).

Usage: python scripts/probe_checker_motion.py [--cube 7] [--frames 24]
         [--mode checker|quarter|adaptive|all] [--script pan|mixed]
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
    p.add_argument("--mode",
                   choices=["checker", "quarter", "adaptive", "all"],
                   default="checker",
                   help="rate-cut variant(s) to measure against full rate")
    p.add_argument("--script", choices=["pan", "mixed"], default="pan",
                   help="camera motion profile (see module docstring)")
    p.add_argument("--comp-cadence", type=int, default=2,
                   help="GI-composite reuse cadence for the fixed-rate "
                        "variants (1 = composite every frame; adaptive "
                        "always composites every frame)")
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
    from rvgrt_tpu.render.scheduler import AdaptiveRateScheduler
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

    # deterministic motion scripts
    def inputs_pan(i):
        if i < args.frames // 2:
            return InputState(move_z=1.0, mouse_dx=6.0)
        return InputState(move_z=0.6, move_x=1.0, mouse_dx=-4.0)

    def inputs_mixed(i):
        third = max(args.frames // 3, 1)
        if i < third:                      # fast pan (checker territory)
            return InputState(mouse_dx=6.0)
        if i < 2 * third:                  # slow look-around
            return InputState(mouse_dx=0.5)
        return InputState()                # dwell (velocity decays)

    inputs = inputs_pan if args.script == "pan" else inputs_mixed

    full_j = jax.jit(lambda b, s, g, a, cam, sky, tbl: pipeline.render_frame(
        b, s, g, a, cam, ecfg, include_gi=args.gi, sky_y=sky, table=tbl))

    # rate-cut base graphs (split dispatch: base + gi_composite, the bench
    # pipeline shape); compiled on demand per rate
    def make_rate_j(rate):
        if rate == "quarter":
            return jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                           pipeline.render_frame(
                               b, s, g, a, cam, ecfg, include_gi=False,
                               sky_y=sky, table=tbl, return_gbuffer=args.gi,
                               quarter_phase=par))
        return jax.jit(lambda b, s, g, a, cam, sky, tbl, par:
                       pipeline.render_frame(
                           b, s, g, a, cam, ecfg, include_gi=False,
                           sky_y=sky, table=tbl, return_gbuffer=args.gi,
                           checker_parity=par))

    rate_j = {"checker": make_rate_j("checker"),
              "quarter": make_rate_j("quarter")}
    comp_j = jax.jit(lambda col, gb, g, s: pipeline.gi_composite(
        col, gb, g, s, ecfg, return_addend=True))
    hi_j = jax.jit(lambda b, s, g, a, cam, sky, tbl: pipeline.render_frame(
        b, s, g, a, cam, hi_cfg, include_gi=args.gi, sky_y=sky,
        table=tbl).color)

    from rvgrt_tpu.gi import update as gi_update

    gi_j = jax.jit(lambda g, b, s, a, fr, off, sky, tbl:
                   gi_update.update_gi(g, b, s, a, ecfg, fr, off,
                                       sky_y=sky, table=tbl))

    variants = ([args.mode] if args.mode != "all"
                else ["checker", "quarter", "adaptive"])

    class Variant:
        def __init__(self, name):
            self.name = name
            self.state = temporal.init_state(h, w)
            self.addend = None
            self.vs_full, self.vs_truth = [], []
            self.sched = (AdaptiveRateScheduler(w, h)
                          if name == "adaptive" else None)
            self.tiers = []

        def rate_for(self, i, prev_cam, cam):
            if self.sched is None:
                return self.name
            if prev_cam is None:
                return "checker"
            r = self.sched.step(prev_cam, cam)
            self.tiers.append(r)
            return r

    vs = [Variant(n) for n in variants]

    def run_variant(v, i, cam_arrays_, gi_grid, rate, par):
        """One frame of a rate-cut variant; updates v.state, returns hi."""
        if rate == "full":
            out = full_j(world.bits, world.sdf, gi_grid, world.atlas,
                         cam_arrays_, world.sky_y, world.trace_table)
            hi_img, v.state = temporal.temporal_upscale(
                out.color, out.motion, out.depth, cam_arrays_.jitter,
                v.state)
            return hi_img
        r = rate_j[rate](world.bits, world.sdf, gi_grid, world.atlas,
                         cam_arrays_, world.sky_y, world.trace_table, par)
        half, gb = r if args.gi else (r, None)
        if args.gi:
            composite_now = (v.sched is not None
                             or i % args.comp_cadence == 0
                             or v.addend is None)
            if composite_now:
                col, v.addend = comp_j(half.color, gb, gi_grid, world.sdf)
            else:
                col = jnp.clip(half.color + v.addend, 0.0, 1.0)
            half = half._replace(color=col)
        if rate == "quarter":
            ex = lambda a: pipeline.quarter_expand(a, par)  # noqa: E731
            valid = pipeline.quarter_valid_mask(h, w, par)
        else:
            ex = lambda a: pipeline.checker_expand(a, par)  # noqa: E731
            valid = pipeline.checker_valid_mask(h, w, par)
        hi_img, v.state = temporal.temporal_upscale(
            ex(half.color), ex(half.motion), ex(half.depth),
            cam_arrays_.jitter, v.state, valid=valid)
        return hi_img

    st_full = temporal.init_state(h, w)
    full_t = []
    gi_grid = world.gi
    prev_cam_obj = None
    t0 = time.time()
    for i in range(args.frames):
        inp = inputs(i)
        lo.character.update(inp, 1.0 / 60.0, i)
        hi.character.position = lo.character.position.copy()
        hi.character.yaw = lo.character.yaw
        hi.character.pitch = lo.character.pitch
        hi.character.velocity = lo.character.velocity.copy()
        hi.character.update(InputState(), 0.0, i)
        cam_obj = lo.character.camera
        cam = camera_arrays(cam_obj,
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

        outs = {}
        for v in vs:
            rate = v.rate_for(i, prev_cam_obj, cam_obj)
            par = jnp.int32(pipeline.QUARTER_PHASE_ORDER[i & 3]
                            if rate == "quarter" else (i & 1))
            outs[v.name] = (run_variant(v, i, cam, gi_grid, rate, par),
                            rate)
        prev_cam_obj = dataclasses.replace(cam_obj,
                                           pos=cam_obj.pos.copy(),
                                           forward=cam_obj.forward.copy())

        # SSAA target at the unjittered hi-res pose
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
                jcam = camera_arrays(
                    hi.character.camera,
                    hi.character.unjittered_view_projection,
                    hi.character.prev_unjittered_view_projection,
                    (0.0, 0.0), i / 60.0)
            img = hi_j(world.bits, world.sdf, gi_grid, world.atlas, jcam,
                       world.sky_y, world.trace_table)
            acc = img if acc is None else acc + img
        target = acc / max(args.ssaa, 1)

        def psnr(a, b):
            mse = float(jnp.mean((a - b) ** 2))
            return 99.0 if mse < 1e-12 else 10.0 * math.log10(1.0 / mse)

        pf = psnr(out_full, target)
        if i >= args.warm:
            full_t.append(pf)
        line = f"frame {i}: full-vs-truth {pf:.2f}"
        for v in vs:
            hi_img, rate = outs[v.name]
            pa = psnr(out_full, hi_img)
            pc = psnr(hi_img, target)
            if i >= args.warm:
                v.vs_full.append(pa)
                v.vs_truth.append(pc)
            line += f" | {v.name}[{rate[0]}] vs-full {pa:.2f} vs-truth {pc:.2f}"
        print(line, flush=True)

    print(f"\n== moving tail (frames {args.warm}..{args.frames - 1}, "
          f"script={args.script}, {time.time() - t0:.0f}s) ==")
    print(f"full-vs-truth:    {np.mean(full_t):.2f} dB")
    for v in vs:
        mix = ""
        if v.sched is not None and v.tiers:
            from collections import Counter

            c = Counter(v.tiers)
            mix = "  tiers=" + ",".join(
                f"{k}:{n}" for k, n in sorted(c.items()))
        print(f"{v.name}: vs-full {np.mean(v.vs_full):.2f} dB, "
              f"vs-truth {np.mean(v.vs_truth):.2f} dB "
              f"(cost {np.mean(full_t) - np.mean(v.vs_truth):+.2f} dB)"
              + mix)


if __name__ == "__main__":
    main()
