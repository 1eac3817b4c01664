"""Aux subsystems: checkpoint/resume, GI update, metrics, frame sink."""

import dataclasses
import os
import time

import numpy as np
import jax.numpy as jnp
import pytest

from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
from rvgrt_tpu.driver import checkpoint
from rvgrt_tpu.driver.engine import Engine, World, build_world
from rvgrt_tpu.gi import update as gi_update
from rvgrt_tpu.utils.profiling import MetricsLog
from rvgrt_tpu.world import gi_grid


@pytest.fixture(scope="module")
def small_ecfg():
    return EngineConfig(
        world=WorldConfig().with_cube(5),
        render=dataclasses.replace(RenderConfig(), width=32, height=16),
        gi_rays_per_frame=128,
    )


@pytest.fixture(scope="module")
def small_world(small_ecfg):
    return build_world(small_ecfg, verbose=False, init_gi=True)


def test_checkpoint_roundtrip(tmp_path, small_ecfg, small_world):
    p = str(tmp_path / "world.ckpt.npz")
    checkpoint.save_world(p, small_world, small_ecfg, frame_count=7,
                          gi_offset=128)
    w2, fc, off = checkpoint.load_world(p, small_ecfg)
    assert fc == 7 and off == 128
    np.testing.assert_array_equal(np.asarray(small_world.bits),
                                  np.asarray(w2.bits))
    np.testing.assert_array_equal(np.asarray(small_world.sdf),
                                  np.asarray(w2.sdf))
    np.testing.assert_array_equal(np.asarray(small_world.gi),
                                  np.asarray(w2.gi))


def test_checkpoint_rejects_mismatched_config(tmp_path, small_ecfg,
                                              small_world):
    p = str(tmp_path / "w.npz")
    checkpoint.save_world(p, small_world, small_ecfg)
    bad = EngineConfig(world=WorldConfig().with_cube(6))
    with pytest.raises(AssertionError):
        checkpoint.load_world(p, bad)


@pytest.mark.full
def test_world_regeneration_deterministic(small_ecfg, small_world):
    # determinism IS the primary checkpoint (State.cpp:44-54 analogue)
    w2 = build_world(small_ecfg, verbose=False, init_gi=False)
    np.testing.assert_array_equal(np.asarray(small_world.bits),
                                  np.asarray(w2.bits))
    np.testing.assert_array_equal(np.asarray(small_world.sdf),
                                  np.asarray(w2.sdf))


@pytest.mark.full
def test_gi_update_window_and_determinism(small_ecfg, small_world):
    w = small_world
    gi0 = w.gi
    gi1 = gi_update.update_gi(gi0, w.bits, w.sdf, w.atlas, small_ecfg,
                              jnp.uint32(0), jnp.int32(0))
    gi1b = gi_update.update_gi(gi0, w.bits, w.sdf, w.atlas, small_ecfg,
                               jnp.uint32(0), jnp.int32(0))
    # deterministic given (gi, frame, offset)
    np.testing.assert_array_equal(np.asarray(gi1), np.asarray(gi1b))
    # only the round-robin window may change
    n = min(small_ecfg.gi_rays_per_frame, small_ecfg.world.gi_num_cells)
    a0 = np.asarray(gi0)
    a1 = np.asarray(gi1)
    np.testing.assert_array_equal(a0[n:], a1[n:])


def test_init_gi_chunked_matches_unchunked(small_ecfg, small_world):
    """The bounded-slice GI init (2048^3 OOM fix) is a pure partition of
    the full-grid init: identical packed radiance."""
    w = small_world
    full = gi_update.init_gi(w.bits, w.sdf, small_ecfg, sky_y=w.sky_y,
                             table=w.trace_table)
    cells = small_ecfg.world.gi_num_cells
    chunk = max(cells // 4, 1)
    chunked = gi_update.init_gi_chunked(w.bits, w.sdf, small_ecfg,
                                        sky_y=w.sky_y, table=w.trace_table,
                                        chunk=chunk)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


@pytest.mark.full
def test_init_gi_chunked_handles_non_multiple_tail(small_ecfg, small_world):
    """A chunk that does NOT divide gi_num_cells must still produce the
    exact full-grid init (the tail slice is padded + re-anchored, not
    asserted away)."""
    w = small_world
    full = gi_update.init_gi(w.bits, w.sdf, small_ecfg, sky_y=w.sky_y,
                             table=w.trace_table)
    cells = small_ecfg.world.gi_num_cells
    chunk = cells // 3 + 1  # leaves a ragged tail
    assert cells % chunk != 0
    chunked = gi_update.init_gi_chunked(w.bits, w.sdf, small_ecfg,
                                        sky_y=w.sky_y, table=w.trace_table,
                                        chunk=chunk)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


@pytest.mark.full
def test_gi_update_stats_overflow_zero(small_ecfg, small_world):
    """update_gi(return_stats=True) reports the straggler-cap overflow
    count; at the production margin it must be 0 (and the grid must match
    the stats-less call exactly)."""
    w = small_world
    ecfg = dataclasses.replace(small_ecfg, gi_straggler_budget=12)
    frame = jnp.uint32(3)
    off = jnp.int32(0)
    g1 = gi_update.update_gi(w.gi, w.bits, w.sdf, w.atlas, ecfg, frame,
                             off, sky_y=w.sky_y, table=w.trace_table)
    g2, stats = gi_update.update_gi(w.gi, w.bits, w.sdf, w.atlas, ecfg,
                                    frame, off, sky_y=w.sky_y,
                                    table=w.trace_table, return_stats=True)
    assert int(stats["straggler_overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_gi_offset_advances_and_wraps(small_ecfg):
    n = min(small_ecfg.gi_rays_per_frame, small_ecfg.world.gi_num_cells)
    off = 0
    seen = set()
    for _ in range(small_ecfg.world.gi_num_cells // n + 2):
        seen.add(off)
        off = gi_update.advance_offset(off, small_ecfg)
    assert 0 in seen and len(seen) >= 2


def test_random_sphere_dirs_unit_and_deterministic():
    seeds = jnp.arange(1000, dtype=jnp.uint32)
    dx, dy, dz = gi_update.random_sphere_dirs(seeds)
    n = np.asarray(dx * dx + dy * dy + dz * dz)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    dx2, _, _ = gi_update.random_sphere_dirs(seeds)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx2))
    # directions cover all octants
    assert (np.asarray(dx) > 0).any() and (np.asarray(dx) < 0).any()
    assert (np.asarray(dy) > 0).any() and (np.asarray(dy) < 0).any()


def test_metrics_log_roundtrip(tmp_path):
    m = MetricsLog(str(tmp_path / "metrics.jsonl"))
    m.log(event="frame", ms=12.5)
    m.log(event="frame", ms=13.5)
    rows = m.read()
    assert len(rows) == 2 and rows[0]["ms"] == 12.5


def test_framesink_roundtrip(tmp_path):
    from rvgrt_tpu.driver.framesink import FrameSink

    rng = np.random.default_rng(0)
    with FrameSink(str(tmp_path)) as fs:
        for i in range(4):
            fs.push(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8), i)
        fs.flush()
        assert fs.written == 4
    from PIL import Image

    files = sorted(os.listdir(tmp_path))
    assert len(files) == 4
    img = np.asarray(Image.open(tmp_path / files[0]))
    assert img.shape == (24, 32, 3)


def test_viewer_serves_frames_and_inputs():
    """Live viewer round-trip with a stub engine: page, frame, stream,
    stats, and input POST reach the render loop."""
    import json
    import urllib.request

    import numpy as np

    from rvgrt_tpu.driver.viewer import ViewerServer

    class StubOut:
        def __init__(self, v):
            self.color = np.full((24, 32, 3), v, np.float32)

    class StubEngine:
        def __init__(self):
            import dataclasses

            from rvgrt_tpu.config import EngineConfig, RenderConfig

            self.ecfg = EngineConfig(render=dataclasses.replace(
                RenderConfig(), width=32, height=24))
            self.seen = []

        def step(self, inputs, dt):
            self.seen.append(inputs)
            return StubOut(0.5)

    eng = StubEngine()
    srv = ViewerServer(eng, port=0, max_fps=120).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"rvgrt_tpu viewer" in page
        jpg = urllib.request.urlopen(base + "/frame.jpg", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
        req = urllib.request.Request(
            base + "/input",
            data=json.dumps({"move_z": 1, "mouse_dx": 3.5}).encode(),
            method="POST")
        assert urllib.request.urlopen(req, timeout=10).status == 204
        stats = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=10).read())
        assert stats["frames"] >= 1
        # the posted input reaches a subsequent engine step
        deadline = time.time() + 5
        while time.time() < deadline:
            if any(i.move_z == 1.0 for i in eng.seen):
                break
            time.sleep(0.02)
        assert any(i.move_z == 1.0 for i in eng.seen)
        # mouse deltas are consumed once, not repeated
        assert sum(i.mouse_dx for i in eng.seen) <= 3.5 + 1e-6
    finally:
        srv.stop()


@pytest.mark.full
def test_gi_converges_to_stable_ema():
    """BASELINE config-4 measure: the progressive GI fixed-point iteration
    must contract - per-sweep mean radiance change decreases and late
    sweeps are ~stable."""
    from rvgrt_tpu.driver.engine import build_world
    from rvgrt_tpu.world import voxel_grid as vg

    ecfg = EngineConfig(world=WorldConfig().with_cube(5),
                        gi_rays_per_frame=WorldConfig().with_cube(5)
                        .gi_num_cells)  # full sweep per frame
    world = build_world(ecfg, verbose=False, init_gi=True)
    gi = world.gi
    deltas = []
    for sweep in range(10):
        new = gi_update.update_gi(gi, world.bits, world.sdf, world.atlas,
                                  ecfg, jnp.uint32(sweep), jnp.int32(0),
                                  sky_y=world.sky_y,
                                  table=world.trace_table)
        deltas.append(float(gi_update.gi_delta(gi, new)))
        gi = new
    # contraction: the late-sweep average change is well below the early one
    assert np.mean(deltas[6:]) <= np.mean(deltas[:3]) + 1e-6, deltas
    assert deltas[-1] < 0.02, deltas
