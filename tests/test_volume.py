"""Volume-sharded tracer (z-slab world shards + ray-handoff ring) vs the
single-device wavefront tracer, on the 8-virtual-CPU-device mesh.

A handed-off ray restarts its sphere phase at the slab face, so stepping
arithmetic differs slightly from the single-device path; hit/miss flags and
hit geometry must still agree everywhere except boundary-grazing rays
(documented deviation, parallel/volume.py header).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvgrt_tpu.config import RenderConfig, WorldConfig
from rvgrt_tpu.parallel import volume
from rvgrt_tpu.trace import wavefront
from rvgrt_tpu.world import sdf as sdf_mod
from rvgrt_tpu.world import voxel_grid as vg
from jax.sharding import Mesh


@pytest.fixture(scope="module")
def world64():
    cfg = WorldConfig().with_cube(6)  # 64^3, 8 z-slabs of 8
    bits = vg.generate(cfg)
    coarse = vg.coarse_occupancy(bits, cfg)
    sdf = sdf_mod.build_sdf(coarse, cfg)
    return cfg, bits, sdf


def _rays(n, seed, size):
    rng = np.random.default_rng(seed)
    o = rng.uniform(2.0, size - 2.0, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True).astype(np.float32)
    return o, d


@pytest.mark.full
def test_volume_trace_matches_single_device(world64):
    cfg, bits, sdf = world64
    rcfg = RenderConfig()
    mesh = Mesh(jax.devices()[:8], ("z",))
    tables = volume.build_shard_tables(bits, sdf, cfg, mesh)

    n = 512
    o, d = _rays(n, 3, cfg.size_x)
    t0 = np.zeros(n, np.float32)
    args = [jnp.asarray(a) for a in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t0)]

    vres = trace_volume = volume.trace_volume_sharded(
        tables, cfg, rcfg, mesh, *args)
    sres = wavefront.trace(bits, sdf, cfg, rcfg, *args)

    v_hit = np.asarray(vres.hit)
    s_hit = np.asarray(sres.hit)
    agree = v_hit == s_hit
    # boundary-grazing rays may resolve differently; require near-total
    # agreement
    assert agree.mean() >= 0.99, (agree.mean(), np.where(~agree)[0][:10])

    both = v_hit & s_hit & agree
    for name in ("px", "py", "pz", "nx", "ny", "nz", "uv_u", "uv_v", "t"):
        v = np.asarray(getattr(vres, name))[both]
        s_ = np.asarray(getattr(sres, name))[both]
        match = np.isclose(v, s_, atol=2e-2)
        assert match.mean() >= 0.995, (name, match.mean(),
                                       v[~match][:5], s_[~match][:5])

    # misses agree on payload too
    miss = ~v_hit & ~s_hit
    assert np.all(np.asarray(vres.px)[miss] == wavefront.MISS_POS)


def test_volume_trace_crosses_many_slabs(world64):
    """Rays fired straight down +z from z=2 must cross most slabs and
    still terminate (hit or miss) - exercises repeated handoffs."""
    cfg, bits, sdf = world64
    rcfg = RenderConfig()
    mesh = Mesh(jax.devices()[:8], ("z",))
    tables = volume.build_shard_tables(bits, sdf, cfg, mesh)

    n = 128
    rng = np.random.default_rng(7)
    ox = rng.uniform(4, cfg.size_x - 4, n).astype(np.float32)
    oy = rng.uniform(33, 60, n).astype(np.float32)
    oz = np.full(n, 2.0, np.float32)
    dz = np.full(n, 0.9806, np.float32)
    dy = np.full(n, -0.196, np.float32)  # slight downward slope
    dx = np.zeros(n, np.float32)
    args = [jnp.asarray(a) for a in
            (ox, oy, oz, dx, dy, dz, np.zeros(n, np.float32))]

    vres = volume.trace_volume_sharded(tables, cfg, rcfg, mesh, *args)
    sres = wavefront.trace(bits, sdf, cfg, rcfg, *args)
    v_hit = np.asarray(vres.hit)
    s_hit = np.asarray(sres.hit)
    assert (v_hit == s_hit).mean() >= 0.98
    # these rays plunge into terrain: most must hit
    assert s_hit.mean() > 0.5
    both = v_hit & s_hit
    dpos = np.abs(np.asarray(vres.pz)[both] - np.asarray(sres.pz)[both])
    assert np.quantile(dpos, 0.99) < 2e-2, dpos.max()


@pytest.mark.slow
@pytest.mark.full
def test_volume_sharded_full_frame_matches_single_device(world64):
    """The whole per-frame pipeline against the z-slab-sharded world must
    reproduce the single-device frame (handed-off rays restart stepping at
    slab faces -> a small boundary-grazing pixel budget)."""
    import dataclasses
    import math

    from rvgrt_tpu.config import EngineConfig, RenderConfig
    from rvgrt_tpu.driver.engine import camera_arrays
    from rvgrt_tpu.parallel import sharding
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.scene.camera import Camera
    from rvgrt_tpu.world import atlas as atlas_mod, gi_grid

    cfg, bits, sdf = world64
    ecfg = EngineConfig(world=cfg,
                        render=dataclasses.replace(RenderConfig(),
                                                   width=64, height=32))
    atlas = atlas_mod.procedural_atlas()
    gi = gi_grid.zeros(cfg)

    pos = np.array([63.0, 45.0, 49.0], np.float32)
    fwd = np.array([-0.85, -0.5, 0.2], np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, wup); right /= np.linalg.norm(right)
    up = np.cross(fwd, right); up /= np.linalg.norm(up)
    cam = camera_arrays(Camera(pos=pos, forward=fwd,
                               right=right.astype(np.float32),
                               up=up.astype(np.float32)), time_s=0.0)

    single = pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                   include_gi=False)

    mesh = sharding.make_mesh(8, axis="z")
    tables = volume.build_shard_tables(bits, sdf, cfg, mesh)
    sdf_rep, gi_rep, atlas_rep = sharding.replicate(mesh, sdf, gi, atlas)
    vol = volume.render_frame_volume(tables, sdf_rep, gi_rep, atlas_rep,
                                     cam, ecfg, mesh, include_gi=False)

    a = np.asarray(single.color)
    b = np.asarray(vol.color)
    assert np.isfinite(b).all()
    diff = np.abs(a - b).max(axis=-1)
    frac_off = (diff > 0.02).mean()
    mse = float(np.mean((a - b) ** 2))
    psnr = 99.0 if mse == 0 else 10.0 * math.log10(1.0 / mse)
    assert psnr > 30.0, (psnr, frac_off)
    assert frac_off < 0.03, (psnr, frac_off)
    # depth/motion come from the same hit geometry
    assert np.isfinite(np.asarray(vol.depth)).all()


@pytest.mark.full
def test_volume_trace_bounded_handoff_matches_unbounded(world64):
    """handoff_cap with overflow-retry must reproduce the unbounded ring
    exactly: packets are bounded per round, overflow rays stay local and
    retry, the auto rounds margin absorbs the retries.  hcap=64 with 512
    rays on 8 slabs forces real overflow (many rays cross the camera-slab
    faces in round 0)."""
    cfg, bits, sdf = world64
    rcfg = RenderConfig()
    mesh = Mesh(jax.devices()[:8], ("z",))
    tables = volume.build_shard_tables(bits, sdf, cfg, mesh)

    n = 512
    o, d = _rays(n, 5, cfg.size_x)
    t0 = np.zeros(n, np.float32)
    args = [jnp.asarray(a) for a in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t0)]

    full = volume.trace_volume_sharded(tables, cfg, rcfg, mesh, *args)
    bounded = volume.trace_volume_sharded(tables, cfg, rcfg, mesh, *args,
                                          handoff_cap=64)
    for name in ("hit", "px", "py", "pz", "nx", "ny", "nz",
                 "uv_u", "uv_v", "t"):
        np.testing.assert_array_equal(np.asarray(getattr(full, name)),
                                      np.asarray(getattr(bounded, name)),
                                      err_msg=name)
    # retries add rounds, never iterations: an overflow stayer re-exits
    # from its out-of-slab start without marching
    np.testing.assert_array_equal(np.asarray(full.its),
                                  np.asarray(bounded.its))
