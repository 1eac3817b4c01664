"""Generate the 1024^3 "hero" reference-semantics fixture (VERDICT r3 #8).

One committed 1280x800 frame at the headline world scale under
REFERENCE-EXACT semantics (hard shadows, half-res prepass, reference
tracer cadence, GI off - a traced full GI init at 8.4M cells is not
CPU-feasible for the test re-render; GI-on image behavior is pinned by
the cube-8 fixtures).  ``tests/test_fixtures.py::test_hero_fixture_slab``
re-renders a row slab of this pose every run and additionally gates the
BENCH perf tier (d8 prepass + decoupled shadows + fast cadence) against
the reference-exact slab at this scale.

Usage (CPU for bit-stable parity with the test; minutes):
  JAX_PLATFORMS=cpu python scripts/make_fixture_hero.py
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures")

CUBE = 10
WIDTH, HEIGHT = 1280, 800
# the bench camera shape (terrain-top center spawn, pan angle), facing
# DOWN-SUN (sun_dir ~ (0.85, 0.42, -0.34)): the view must contain lit,
# textured terrain for the gate to have teeth - the first attempt at
# ang=0.35 faced away from the sun and froze a nearly black slope
POSE = {"off_y": 12.0, "ang": 2.75}


def build():
    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod

    ecfg = EngineConfig(
        world=WorldConfig().with_cube(CUBE),
        render=dataclasses.replace(RenderConfig(), width=WIDTH,
                                   height=HEIGHT))
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=False)
    return ecfg, world


def hero_camera(ecfg, world):
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.scene.camera import Camera

    cfg = ecfg.world
    cx, cz = cfg.size_x // 2, cfg.size_z // 2
    vol = np.asarray(world.bits).reshape(cfg.size_z, cfg.size_y,
                                         cfg.size_x // 32)
    word = vol[cz, :, cx // 32]
    solid = (word >> (cx % 32)) & 1
    top = int(cfg.size_y - 1 - np.argmax(solid[::-1])) if solid.any() else 30
    cam_y = min(top + POSE["off_y"], cfg.size_y - 2.0)
    ang = POSE["ang"]
    fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    up /= np.linalg.norm(up)
    return eng_mod.camera_arrays(Camera(
        pos=np.array([cx, cam_y, cz], np.float32), forward=fwd,
        right=right.astype(np.float32), up=up.astype(np.float32)))


def render_rows(ecfg, world, y0: int, rows: int):
    """Reference-exact render of rows [y0, y0+rows)."""
    import jax.numpy as jnp

    from rvgrt_tpu.render import pipeline

    cam = hero_camera(ecfg, world)
    out = pipeline.render_slab(world.bits, world.sdf, world.gi,
                               world.atlas, cam, ecfg,
                               y0=jnp.int32(y0), slab_h=rows,
                               include_gi=False, sky_y=world.sky_y,
                               table=world.trace_table)
    return np.asarray(jnp.clip(out.color, 0, 1) * 255).astype(np.uint8)


def main():
    from PIL import Image

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    ecfg, world = build()
    img = render_rows(ecfg, world, 0, HEIGHT)
    path = os.path.join(FIXTURE_DIR, "hero_1024.png")
    Image.fromarray(img).save(path)
    with open(os.path.join(FIXTURE_DIR, "hero_meta.json"), "w") as f:
        json.dump({"cube": CUBE, "width": WIDTH, "height": HEIGHT,
                   "pose": POSE,
                   "semantics": "reference-exact (hard shadows, half-res "
                                "prepass, reference tracer cadence, GI "
                                "off)"}, f, indent=2)
    print(f"wrote {path} (mean {img.mean():.1f})", flush=True)


if __name__ == "__main__":
    main()
