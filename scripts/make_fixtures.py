"""Generate the versioned reference-semantics image fixtures.

VERDICT r2 #6: the repo's image gates all compare against same-author
scalar models; these fixtures freeze actual rendered frames under
REFERENCE-EXACT semantics (hard shadows, per-pixel cone march, half-res
prepass, reference tracer cadence, the reference's real texturepack) at
fixed camera poses, as committed PNG artifacts a third party can diff.
``tests/test_fixtures.py`` re-renders the poses and gates PSNR against
these files every run.

Usage (CPU, deterministic):
  JAX_PLATFORMS=cpu python scripts/make_fixtures.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures")

# (name, pos-offset-from-center, yaw, pitch) - poses chosen to cover
# terrain close-up, horizon, water (if present), and a sky-heavy view
POSES = [
    ("terrain_down", (0.0, 14.0, 0.0), 0.8, -0.95),
    ("horizon", (0.0, 10.0, 0.0), 2.2, -0.35),
    ("grazing", (18.0, 6.0, -12.0), -1.1, -0.25),
    ("sky_heavy", (0.0, 20.0, 8.0), -2.6, 0.15),
]

CUBE = 8          # 256^3 world: CPU-buildable in tests
WIDTH, HEIGHT = 256, 160


def build(include_gi=True):
    import dataclasses

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod

    # REFERENCE-EXACT semantics: every RenderConfig/LightingConfig default
    # (hard shadows, dist_bias 8, probe interval 8, half-res prepass) plus
    # the per-pixel cone march (gi_res_divisor=1 - the reference cone-
    # marches every pixel, StateRender.cu:100-127)
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(CUBE),
        render=dataclasses.replace(RenderConfig(), width=WIDTH,
                                   height=HEIGHT, gi_res_divisor=1))
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=include_gi)
    return ecfg, world


def render_pose(ecfg, world, off, yaw, pitch):
    import jax.numpy as jnp

    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera, dir_from_sphere

    cfg = ecfg.world
    cx = cfg.size_x / 2.0 + off[0]
    cz = cfg.size_z / 2.0 + off[2]
    # terrain height at center via the bits volume
    vol = np.asarray(world.bits).reshape(cfg.size_z, cfg.size_y,
                                         cfg.size_x // 32)
    xi, zi = int(cx), int(cz)
    word = vol[zi, :, xi // 32]
    solid = (word >> (xi % 32)) & 1
    top = int(cfg.size_y - 1 - np.argmax(solid[::-1])) if solid.any() else 30
    pos = np.array([cx, min(top + off[1], cfg.size_y - 2.0), cz],
                   np.float32)
    fwd = dir_from_sphere(math.pi + pitch, yaw).astype(np.float32)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    up /= np.linalg.norm(up)
    cam = eng_mod.camera_arrays(Camera(pos=pos, forward=fwd, right=right,
                                       up=up))
    out = pipeline.render_frame(world.bits, world.sdf, world.gi,
                                world.atlas, cam, ecfg, include_gi=True,
                                sky_y=world.sky_y, table=world.trace_table)
    img = np.asarray(jnp.clip(out.color, 0, 1) * 255).astype(np.uint8)
    return img


def main():
    from PIL import Image

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    ecfg, world = build()
    meta = {"cube": CUBE, "width": WIDTH, "height": HEIGHT,
            "semantics": "reference-exact (hard shadows, gi_res_divisor=1,"
                         " half-res prepass, reference tracer cadence)",
            "poses": []}
    for name, off, yaw, pitch in POSES:
        img = render_pose(ecfg, world, off, yaw, pitch)
        path = os.path.join(FIXTURE_DIR, f"{name}.png")
        Image.fromarray(img).save(path)
        meta["poses"].append({"name": name, "off": list(off), "yaw": yaw,
                              "pitch": pitch})
        print(f"wrote {path} (mean {img.mean():.1f})", flush=True)
    with open(os.path.join(FIXTURE_DIR, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print("fixtures done", flush=True)


if __name__ == "__main__":
    main()
