"""Investigate the order-dependent quarter-prepass gate failure (VERDICT r3
weak #1): reproduce the stepped pose from tests/test_render.py module order,
compare prepass_divisor 2 vs 4, and classify the flipped hit flags.

Run on CPU: JAX_PLATFORMS=cpu python scripts/probe_prepass_d4.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
from rvgrt_tpu.driver.engine import Engine, camera_arrays
from rvgrt_tpu.render import pipeline
from rvgrt_tpu.scene.camera import InputState
from rvgrt_tpu.world import voxel_grid as vg


def build_engine():
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(6),
        render=dataclasses.replace(RenderConfig(), width=64, height=48),
    )
    eng = Engine(ecfg, include_gi=True, verbose=False)
    fine = np.asarray(vg.unpack_bits_x(
        np.asarray(eng.world.bits).reshape(64, 64, 2)))
    heights = 63 - np.argmax(fine[:, ::-1, :], axis=1)
    cy = min(float(heights[32, 32]) + 6.0, 60.0)
    eng.character.position = np.array([32.0, cy, 32.0], np.float32)
    eng.character.pitch = -math.pi - 0.5
    eng.character.yaw = 0.8
    return eng


def compare(eng, label):
    world = eng.world
    ecfg = eng.ecfg
    ch = eng.character
    cam = camera_arrays(ch.camera, vp=ch.unjittered_view_projection,
                        prev_vp=ch.prev_unjittered_view_projection)
    outs = {}
    for d in (2, 4):
        ec = dataclasses.replace(ecfg, render=dataclasses.replace(
            ecfg.render, prepass_divisor=d))
        outs[d] = pipeline.render_frame(
            world.bits, world.sdf, world.gi, world.atlas, cam, ec,
            include_gi=False, sky_y=world.sky_y, table=world.trace_table)
    hits2 = np.asarray(outs[2].depth) < 1.0
    hits4 = np.asarray(outs[4].depth) < 1.0
    flips = hits2 != hits4
    a = np.asarray(outs[2].color)
    b = np.asarray(outs[4].color)
    mse = float(np.mean((a - b) ** 2))
    psnr = 99.0 if mse < 1e-12 else 10.0 * math.log10(1.0 / mse)
    print(f"[{label}] pos={np.asarray(ch.position)} pitch={ch.pitch:.3f} "
          f"yaw={ch.yaw:.3f}")
    print(f"[{label}] flips={flips.mean():.4f} ({flips.sum()}/{flips.size})"
          f" h2->m4={np.sum(hits2 & ~hits4)} m2->h4={np.sum(~hits2 & hits4)}"
          f" psnr={psnr:.1f}")
    if flips.sum():
        ys, xs = np.nonzero(flips)
        print(f"[{label}] flip rows {ys.min()}..{ys.max()}, "
              f"cols {xs.min()}..{xs.max()}")
        # start distances at the flipped pixels for both tiers
        # recompute the start maps the two tiers fed the primary
        for d in (2, 4):
            ec = dataclasses.replace(ecfg, render=dataclasses.replace(
                ecfg.render, prepass_divisor=d))
            rcfg = ec.render
            trace_fn = pipeline.make_trace_fn(world.bits, world.sdf,
                                              ec.world, rcfg,
                                              table=world.trace_table,
                                              sky_y=world.sky_y)
            hneed = rcfg.height // d + 2
            t = max(rcfg.trace_tile_rows, 1)
            hrows = -(-hneed // t) * t
            hd, _ = pipeline.half_res_prepass(
                world.bits, world.sdf, ec.world, rcfg, ec.lighting, cam,
                hy0=jnp.int32(-1), hrows=hrows, trace_fn=trace_fn,
                sky_y=world.sky_y)
            hd = hd[:hneed]
            sd = np.asarray(pipeline._min_dist_upsample_slab(
                hd, rcfg.height, d=d))
            if d == 2:
                s2 = sd
            else:
                s4 = sd
        i = np.argsort(-np.abs(s4 - s2)[ys, xs])[:12]
        for k in i:
            y, x = ys[k], xs[k]
            print(f"  ({y},{x}): start2={s2[y, x]:.2f} start4={s4[y, x]:.2f}"
                  f" h2={hits2[y, x]} h4={hits4[y, x]}"
                  f" depth2={np.asarray(outs[2].depth)[y, x]:.4f}")
    return flips.mean()


eng = build_engine()
compare(eng, "pose0-fresh")

# replay the module-order mutations before the failing test
eng2 = build_engine()
eng2.step()                      # frame_invariants
eng2.step(); eng2.step()         # static_camera_zero_motion
eng2.step(InputState(move_z=1.0))  # moving_camera
eng2.step(InputState(mouse_dx=30.0))
eng2.step(InputState(mouse_dx=30.0))  # sky_motion
eng2.step(InputState(move_z=1.0))  # water test (line 114)
eng2.step()                      # render_deterministic + others
eng2.step()
eng2.step(InputState())
compare(eng2, "pose-stepped")
