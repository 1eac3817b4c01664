"""Temporal start distances: conservative trace starts from the previous
frame's prepass distances (``pipeline.temporal_start_hint``).

The world is static (only the camera moves, ``Character.cpp:56-126``), so
last frame's visibility bounds this frame's hit distances.  These tests
gate the contract the production tier relies on:

* the direction -> previous-pixel projection is the identity for an
  unchanged camera (the ray grid is the camera BASIS frustum, NOT the VP
  matrix's - StateRender.cu:44-45);
* hinted renders match unhinted ones (hits/normals/colors) under pure
  rotation and under rotation + translation;
* all-sky windows + ``sky_start`` retire miss rays instantly under a
  static camera position without changing any output.
"""

import dataclasses
import math

import numpy as np
import jax.numpy as jnp
import pytest

from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
from rvgrt_tpu.driver import engine as eng_mod
from rvgrt_tpu.render import pipeline
from rvgrt_tpu.scene.camera import Camera


@pytest.fixture(scope="module")
def world_and_cfg():
    ecfg = EngineConfig(
        world=WorldConfig().with_cube(6),
        render=dataclasses.replace(RenderConfig(), width=64, height=48),
    )
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=False)
    return world, ecfg


def _cam(pos, ang, jitter=(0.0, 0.0)):
    fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                   np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    up /= np.linalg.norm(up)
    return eng_mod.camera_arrays(
        Camera(pos=np.asarray(pos, np.float32), forward=fwd,
               right=right.astype(np.float32), up=up.astype(np.float32)),
        jitter=jitter)


def _render(world, ecfg, cam, hints=None):
    hh, hf = hints if hints is not None else (None, None)
    return pipeline.render_frame(
        world.bits, world.sdf, world.gi, world.atlas, cam, ecfg,
        include_gi=False, sky_y=world.sky_y, table=world.trace_table,
        hint_half=hh, hint_full=hf)


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else 10.0 * math.log10(1.0 / mse)


def _hints(out_prev, cam, prev_cam, rcfg, **kw):
    return pipeline.temporal_hints_from_prepass(
        out_prev.half_dist, cam, prev_cam, rcfg, **kw)


@pytest.mark.full
def test_self_projection_identity(world_and_cfg):
    """For an unchanged camera the hint warp must read each pixel's own
    previous value: hint == windowed_min(prev_t) - bias everywhere the
    previous frame hit."""
    world, ecfg = world_and_cfg
    rcfg = ecfg.render
    cam = _cam([32.0, 44.0, 32.0], 0.7)
    out = _render(world, ecfg, cam)
    hint_half, hint_full = _hints(out, cam, cam, rcfg, window=0)
    prev_t = np.asarray(out.half_dist) + rcfg.dist_bias
    hit_mask = prev_t < rcfg.miss_distance - 0.5
    expect = np.maximum(prev_t - rcfg.dist_bias, 0.0)
    got = np.asarray(hint_half)
    assert np.allclose(got[hit_mask], expect[hit_mask], atol=1e-3)
    # miss lanes with no sky_start carry no hint
    assert (got[~hit_mask] == 0.0).all()
    assert hint_full.shape == (rcfg.height, rcfg.width)


@pytest.mark.parametrize("translate", [False, True])
@pytest.mark.full
def test_hinted_render_matches(world_and_cfg, translate):
    """Hinted frame == unhinted frame (hits exactly, color to high PSNR)
    under rotation and under rotation + translation."""
    world, ecfg = world_and_cfg
    rcfg = ecfg.render
    p0 = np.array([32.0, 44.0, 32.0], np.float32)
    p1 = p0 + (np.array([0.6, -0.2, 0.4], np.float32) if translate else 0.0)
    cam0 = _cam(p0, 0.7)
    cam1 = _cam(p1, 0.7 + 0.12)
    out0 = _render(world, ecfg, cam0)
    ref1 = _render(world, ecfg, cam1)
    hints = _hints(out0, cam1, cam0, rcfg,
                   sky_start=4.0 * ecfg.world.size_x)
    got1 = _render(world, ecfg, cam1, hints=hints)

    ref_hit = np.asarray(ref1.depth) < 1.0
    got_hit = np.asarray(got1.depth) < 1.0
    n = ref_hit.size
    assert (ref_hit != got_hit).sum() <= max(1, n // 1000)
    psnr = _psnr(ref1.color, got1.color)
    assert psnr >= 50.0, f"hinted frame diverged: {psnr:.1f} dB"
    # prepass buffers stay within the conservative contract too
    d_ref = np.asarray(ref1.half_dist)
    d_got = np.asarray(got1.half_dist)
    assert (np.abs(d_ref - d_got) > 0.51).mean() <= 2e-3


@pytest.mark.full
def test_hints_are_conservative(world_and_cfg):
    """Every hinted start must not overshoot the true hit distance."""
    world, ecfg = world_and_cfg
    rcfg = ecfg.render
    p0 = np.array([32.0, 44.0, 32.0], np.float32)
    p1 = p0 + np.array([0.5, 0.0, 0.3], np.float32)
    cam0 = _cam(p0, 0.7)
    cam1 = _cam(p1, 0.82)
    out0 = _render(world, ecfg, cam0)
    _, hint_full = _hints(out0, cam1, cam0, rcfg)
    ref1 = _render(world, ecfg, cam1)
    # reconstruct the true primary t from the unhinted prepass-free render:
    # half_dist is the half-res truth; compare the full-res hint against
    # the 2x2-min upsample of it (itself conservative for the primary)
    true_half = np.asarray(ref1.half_dist) + rcfg.dist_bias
    true_full = np.asarray(pipeline.min_dist_upsample(
        jnp.asarray(true_half)))[:rcfg.height, :rcfg.width]
    hint = np.asarray(hint_full)
    hit = true_full < rcfg.miss_distance - 0.5
    # allow the fp16 start quantization + warp rounding one voxel of slack
    viol = (hint[hit] > true_full[hit] + 1.0).mean()
    assert viol <= 1e-3, f"non-conservative hints: {viol:.4%}"
