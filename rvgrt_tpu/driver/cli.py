"""Headless driver: camera-path flythrough -> PNG frames + stats.

Replaces the reference's Win32 window / render thread / swap chain
(``main.cpp:104-234``) with a replayable runner: build the world, fly a
deterministic camera path, push frames to the native sink, print frame-time
stats (the title-bar FrameTimeAverager equivalent).

    python -m rvgrt_tpu.driver.cli --config stage1 --frames 8 --out /tmp/fly
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

from rvgrt_tpu import config as cfg_mod
from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.driver.engine import Engine
from rvgrt_tpu.driver.framesink import FrameSink
from rvgrt_tpu.scene.camera import InputState
from rvgrt_tpu.utils.timer import FrameTimeAverager
from rvgrt_tpu.world import voxel_grid as vg

CONFIGS = {
    "stage1": cfg_mod.config_stage1,
    "stage2": cfg_mod.config_stage2,
    "stage3": cfg_mod.config_stage3,
    "stage4": cfg_mod.config_stage4,
    "stage5": cfg_mod.config_stage5,
    "reference": cfg_mod.config_reference,
}


def tiny_config() -> EngineConfig:
    import dataclasses

    from rvgrt_tpu.config import RenderConfig, WorldConfig

    return EngineConfig(world=WorldConfig().with_cube(6),
                        render=dataclasses.replace(
                            RenderConfig(), width=160, height=96))


def find_interesting_column(eng: Engine):
    """(x, z, top_y) of a tall-terrain column - a view with actual content
    (ocean-only views defeat visual tests and upscaler training).

    Columns are required to leave sky headroom (top <= size_y - 10, so the
    spawn isn't clamped inside rock) and scored with an interior-margin
    bonus: a world-rim spawn can look straight out of the grid and render
    pure sky."""
    cfg = eng.ecfg.world
    bits_np = np.asarray(eng.world.bits).reshape(
        cfg.size_z, cfg.size_y, cfg.size_x // 32)
    # subsample columns for speed
    zs = np.arange(0, cfg.size_z, max(1, cfg.size_z // 64))
    best = (cfg.size_x // 2, cfg.size_z // 2, 30.0)
    best_score = -1e9
    max_top = cfg.size_y - 10
    xs = np.arange(cfg.size_x)
    for z in zs:
        plane = np.asarray(vg.unpack_bits_x(bits_np[z]))  # (Y, X)
        heights = (cfg.size_y - 1
                   - np.argmax(plane[::-1], axis=0)) * plane.any(axis=0)
        edge = np.minimum.reduce([
            xs, cfg.size_x - 1 - xs,
            np.full_like(xs, min(z, cfg.size_z - 1 - int(z)))])
        margin = np.minimum(edge / max(cfg.size_x, 1), 0.15)
        score = np.where(heights <= max_top, heights + 100.0 * margin, -1e9)
        x = int(score.argmax())
        if score[x] > best_score and heights[x] > 30:
            best_score = float(score[x])
            best = (x, int(z), float(heights[x]))
    return best


def spawn_above_terrain(eng: Engine, x: int | None = None,
                        z: int | None = None, clearance: float = 8.0):
    """Place the character in air above the terrain column at (x, z);
    defaults to a tall-terrain column."""
    cfg = eng.ecfg.world
    if x is None or z is None:
        x, z, top = find_interesting_column(eng)
    else:
        bits_np = np.asarray(eng.world.bits).reshape(
            cfg.size_z, cfg.size_y, cfg.size_x // 32)
        col = np.asarray(vg.unpack_bits_x(bits_np[z]))[:, x]  # (Y,) bools
        solid_ys = np.where(col)[0]
        top = float(solid_ys.max()) if len(solid_ys) else 30.0
    y = min(top + clearance, cfg.size_y - 2.0)
    eng.character.position = np.array([x, y, z], np.float32)
    eng.character.pitch = -math.pi - 0.5
    # aim at the world center: a fixed yaw from a corner spawn can point
    # straight out of the world and render pure sky.  dir_from_sphere gives
    # horizontal dir = cos(pitch) * (-sin yaw, cos yaw) with cos(pitch) < 0
    # over the legal pitch band, so yaw = atan2(-dx, dz).
    dx_c = cfg.size_x / 2.0 - x
    dz_c = cfg.size_z / 2.0 - z
    if abs(dx_c) + abs(dz_c) > 1e-3:
        eng.character.yaw = math.atan2(-dx_c, dz_c)
    return eng.character.position


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="tiny",
                   choices=list(CONFIGS) + ["tiny"])
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", default=None,
                   help="frame output directory, or a .mp4/.avi path for "
                        "the native MJPEG video sink")
    p.add_argument("--fps", type=float, default=30.0,
                   help="video timestamp rate for --out video files")
    p.add_argument("--no-gi", action="store_true")
    p.add_argument("--fly", action="store_true",
                   help="move forward + turn during the path")
    p.add_argument("--upscale", default=None, metavar="PARAMS",
                   help="run the 3x upscaler in the loop: path to trained "
                        "params, 'fresh' for randomly-initialized weights, "
                        "or 'temporal' for the analytic temporal "
                        "super-resolution accumulator (upscale/temporal.py)")
    args = p.parse_args(argv)

    ecfg = tiny_config() if args.config == "tiny" else CONFIGS[args.config]()
    t0 = time.time()
    eng = Engine(ecfg, include_gi=not args.no_gi)
    print(f"world ready in {time.time() - t0:.1f}s", file=sys.stderr)
    spawn = spawn_above_terrain(eng)
    print(f"spawn at {spawn}", file=sys.stderr)

    video = args.out and args.out.lower().endswith((".mp4", ".avi"))
    sink = None
    if args.out and not video:
        sink = FrameSink(args.out)
    vsink = None  # created lazily: the frame size depends on --upscale
    avg = FrameTimeAverager()
    # quantize + reduce on device: fetching u8 color (and a scalar hit
    # stat) moves 4x less data through the device tunnel than f32 buffers
    import jax
    import jax.numpy as jnp
    to_u8 = jax.jit(lambda c: (jnp.clip(c, 0, 1) * 255).astype(jnp.uint8))
    hit_frac = jax.jit(lambda d: (d < 1).mean())

    up_step = history = None
    if args.upscale == "temporal":
        from rvgrt_tpu.scene.camera import phase_jitter_sequence
        from rvgrt_tpu.upscale import model as up_model
        from rvgrt_tpu.upscale import temporal

        # full display-phase coverage for the accumulator (the reference's
        # 8-phase table misses 2 of the 9 phases of a 3x upscale)
        eng.character.jitter_sequence = phase_jitter_sequence(up_model.SCALE)
        t_state = temporal.init_state(ecfg.render.height, ecfg.render.width)
        t_up = jax.jit(temporal.temporal_upscale)
    elif args.upscale:
        from rvgrt_tpu.upscale import model as up_model

        if args.upscale == "fresh":
            net, params = up_model.init_params(
                jax.random.PRNGKey(0), ecfg.render.height, ecfg.render.width)
        else:
            net, params = up_model.load_checkpoint(args.upscale)
        hh = ecfg.render.height * up_model.SCALE
        hw = ecfg.render.width * up_model.SCALE

        @jax.jit
        def up_step(params, color, motion, depth, jitter, history):
            out, _ = up_model.upscale(net, params, color, motion, depth,
                                      jitter, history)
            return out

        history = jnp.zeros((hh, hw, 3), jnp.float32)

    for i in range(args.frames):
        inputs = InputState(move_z=1.0 if args.fly else 0.0,
                            mouse_dx=2.0 if args.fly else 0.0)
        out = eng.step(inputs)
        if args.upscale == "temporal":
            jitter = jnp.asarray(eng.character.ray_jitter_ndc(), jnp.float32)
            hi, t_state = t_up(out.color, out.motion, out.depth, jitter,
                               t_state)
            img = np.asarray(to_u8(hi))
        elif up_step is not None:
            jitter = jnp.asarray(eng.character.ray_jitter_ndc(), jnp.float32)
            history = up_step(params, out.color, out.motion, out.depth,
                              jitter, history)
            img = np.asarray(to_u8(history))
        else:
            img = np.asarray(to_u8(out.color))
        ms = avg.tick()
        if sink is not None:
            sink.push(img, i)
        elif video:
            if vsink is None:
                from rvgrt_tpu.driver.videosink import VideoSink
                vsink = VideoSink(args.out, img.shape[1], img.shape[0],
                                  fps=args.fps)
            vsink.push(img)
        print(f"frame {i}: {ms:.1f} ms avg, hit "
              f"{float(hit_frac(out.depth)):.2f}",
              file=sys.stderr)
    if sink is not None:
        sink.flush()
        print(f"wrote {sink.written} frames to {args.out} "
              f"(dropped {sink.dropped})", file=sys.stderr)
    if vsink is not None:
        n, d = vsink.frames, vsink.dropped
        vsink.close()
        print(f"wrote {n} video frames to {args.out} (dropped {d})",
              file=sys.stderr)
    print(f"avg frame time {avg.average_ms:.1f} ms ({avg.fps:.1f} FPS)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
