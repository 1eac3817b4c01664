"""Cross-slice ('slice','chip') mesh rendering vs the single-device
pipeline, on the 8-virtual-CPU mesh as 2 slices x 4 chips.

``parallel/multislice.py`` is the DCN tier for the 2048^3 streaming
config (SURVEY.md §5.8): row bands across slices (DCN traffic = image
assembly only), and within a slice either replicated-world pixel slabs
or the z-slab volume ring over ICI.  Everything must reproduce the
single-device frame (pixel banding exchanges nothing; the volume ring is
exact by construction — tests/test_volume.py).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
from rvgrt_tpu.driver.engine import camera_arrays
from rvgrt_tpu.gi import update as gi_update
from rvgrt_tpu.parallel import multislice, volume
from rvgrt_tpu.render import pipeline
from rvgrt_tpu.scene.camera import Camera
from rvgrt_tpu.world import atlas as atlas_mod, gi_grid, sdf as sdf_mod
from rvgrt_tpu.world import voxel_grid as vg


@pytest.fixture(scope="module")
def world64():
    cfg = WorldConfig().with_cube(6)
    bits = vg.generate(cfg)
    coarse = vg.coarse_occupancy(bits, cfg)
    sdf = sdf_mod.build_sdf(coarse, cfg)
    atlas = atlas_mod.procedural_atlas()
    return cfg, bits, sdf, atlas


@pytest.fixture(scope="module")
def mesh2x4():
    return multislice.make_mesh2d(2, 4)


def _camera(cfg):
    pos = np.array([cfg.size_x - 1.0, cfg.size_y * 0.7, cfg.size_z * 0.77],
                   np.float32)
    fwd = np.array([-0.85, -0.5, 0.2], np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    up /= np.linalg.norm(up)
    return camera_arrays(Camera(pos=pos, forward=fwd,
                                right=right.astype(np.float32),
                                up=up.astype(np.float32)), time_s=0.0)


def _rep(mesh, *arrays):
    s = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, s) for a in arrays)


def test_make_mesh2d_shape():
    mesh = multislice.make_mesh2d(2, 4)
    assert mesh.shape == {"slice": 2, "chip": 4}
    assert mesh.axis_names == ("slice", "chip")
    # all 8 distinct devices placed exactly once
    assert len({d.id for d in mesh.devices.flat}) == 8


def _gate_frame(single, shard):
    sa = np.asarray(single.color)
    sb = np.asarray(shard.color)
    assert sb.shape == sa.shape
    assert np.isfinite(sb).all()
    mse = float(np.mean((sa - sb) ** 2))
    psnr = 99.0 if mse == 0 else 10.0 * math.log10(1.0 / mse)
    frac_off = (np.abs(sa - sb).max(axis=-1) > 0.02).mean()
    assert psnr > 40.0, (psnr, frac_off)
    assert frac_off < 0.01, (psnr, frac_off)
    for name in ("motion", "depth", "half_dist", "half_shadow"):
        va = np.asarray(getattr(single, name))
        vb = np.asarray(getattr(shard, name))
        assert vb.shape == va.shape
        assert np.isfinite(vb).all(), name
        ok = np.isclose(va, vb, atol=2e-2)
        assert ok.mean() > 0.99, (name, ok.mean())


@pytest.mark.full
def test_render_frame_multislice_matches_single_device(world64, mesh2x4):
    cfg, bits, sdf, atlas = world64
    ecfg = EngineConfig(world=cfg,
                        render=dataclasses.replace(RenderConfig(),
                                                   width=32, height=16))
    gi = gi_grid.zeros(cfg)
    cam = _camera(cfg)

    single = pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                   include_gi=True)

    b, s, g, a = _rep(mesh2x4, bits, sdf, gi, atlas)
    shard = multislice.render_frame_multislice(b, s, g, a, cam, ecfg,
                                               mesh2x4, include_gi=True)
    _gate_frame(single, shard)


@pytest.mark.slow
@pytest.mark.full
def test_render_frame_multislice_volume_matches_single_device(world64,
                                                              mesh2x4):
    cfg, bits, sdf, atlas = world64
    ecfg = EngineConfig(world=cfg,
                        render=dataclasses.replace(RenderConfig(),
                                                   width=32, height=16))
    gi = gi_grid.zeros(cfg)
    cam = _camera(cfg)

    single = pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                   include_gi=True)

    tables = volume.build_shard_tables(bits, sdf, cfg, mesh2x4,
                                       axis="chip")
    s, g, a = _rep(mesh2x4, sdf, gi, atlas)
    sky_y = vg.sky_limit(bits, cfg)
    (sky_y,) = _rep(mesh2x4, sky_y)
    shard = multislice.render_frame_multislice_volume(
        tables, s, g, a, cam, ecfg, mesh2x4, include_gi=True, sky_y=sky_y)
    _gate_frame(single, shard)


def test_temporal_upscale_multislice_matches_single_device():
    """Display rows banded over ('slice','chip') == full-frame accumulator
    (2 slices x 4 chips on the 8-virtual-CPU mesh)."""
    from rvgrt_tpu.parallel import multislice
    from rvgrt_tpu.upscale import temporal

    rng = np.random.default_rng(11)
    h, w = 32, 40
    mesh = multislice.make_mesh2d(2, 4)

    state = temporal.TemporalState(
        history=jnp.asarray(rng.random((3 * h, 3 * w, 3)), jnp.float32),
        conf=jnp.asarray(rng.random((3 * h, 3 * w)) * 8, jnp.float32))
    packed = temporal.pack_state(state)
    packed_ms = packed
    for i in range(2):
        color = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        motion = jnp.asarray(rng.normal(0, 0.02, (h, w, 2)), jnp.float32)
        depth = jnp.ones((h, w), jnp.float32)
        jit = jnp.asarray([(0.4 - i) / w, (0.3 * i - 0.2) / h], jnp.float32)

        out_full, state = temporal.temporal_upscale(color, motion, depth,
                                                    jit, state)
        out_ms, packed_ms = multislice.temporal_upscale_multislice(
            color, motion, jit, packed_ms, mesh)

        a = np.asarray(out_full)
        b = np.asarray(out_ms)
        assert b.shape == a.shape
        assert np.abs(a - b).max() < 1e-5, np.abs(a - b).max()
        assert (np.asarray(packed_ms)
                == np.asarray(temporal.pack_state(state))).all()


@pytest.mark.full
def test_update_gi_multislice_matches_single_device(world64, mesh2x4):
    cfg, bits, sdf, atlas = world64
    ecfg = EngineConfig(world=cfg, gi_rays_per_frame=1024)
    gi0 = gi_update.init_gi(bits, sdf, ecfg)

    frame = jnp.uint32(3)
    offset = jnp.int32(2048)
    single = gi_update.update_gi(gi0, bits, sdf, atlas, ecfg, frame, offset)

    g, b, s, a = _rep(mesh2x4, gi0, bits, sdf, atlas)
    shard = multislice.update_gi_multislice(g, b, s, a, ecfg, frame,
                                            offset, mesh2x4)

    sa = np.asarray(single)
    sb = np.asarray(shard)
    assert sb.shape == sa.shape
    # per-cell RNG seeding (idx + frame) => the 8-way window split must be
    # bit-exact on the packed RGBA8 grid
    mismatch = (sa != sb).mean()
    assert mismatch == 0.0, mismatch
    assert (sa != np.asarray(gi0)).any()
