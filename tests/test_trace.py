"""Wavefront tracer vs scalar golden model, on a real generated world.

Exact-match on hit/miss flags, hit voxel-level positions, normals, UVs and
iteration counts (modulo float32 FMA reassociation - a tiny mismatch budget
is allowed and every mismatch must be boundary-grazing).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rvgrt_tpu.config import RenderConfig, WorldConfig
from rvgrt_tpu.trace import wavefront
from rvgrt_tpu.world import sdf as sdf_mod
from rvgrt_tpu.world import voxel_grid as vg
from tests.golden import scalar_trace


@pytest.fixture(scope="module")
def small_world():
    cfg = WorldConfig().with_cube(6)  # 64^3
    bits = vg.generate(cfg)
    coarse = vg.coarse_occupancy(bits, cfg)
    sdf = sdf_mod.build_sdf(coarse, cfg)
    solid = np.asarray(vg.unpack_bits_x(
        np.asarray(bits).reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)))
    sdf_np = np.asarray(sdf).reshape(cfg.sdf_size_z, cfg.sdf_size_y,
                                     cfg.sdf_size_x)
    world = scalar_trace.ScalarWorld(solid, sdf_np, cfg.sdf_coarseness)
    return cfg, bits, sdf, world


def _random_rays(n, seed, world_size):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(2.0, world_size - 2.0, (n, 3)).astype(np.float32)
    # keep origins above the solid floor mostly
    origins[:, 1] = rng.uniform(32.0, world_size - 2.0, n).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True).astype(np.float32)
    return origins, dirs


def test_wavefront_matches_scalar(small_world):
    cfg, bits, sdf, world = small_world
    rcfg = RenderConfig()
    n = 256
    origins, dirs = _random_rays(n, 7, cfg.size_x)

    res = wavefront.trace(
        bits, sdf, cfg, rcfg,
        origins[:, 0], origins[:, 1], origins[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
        jnp.zeros(n, jnp.float32))

    got_hit = np.asarray(res.hit)
    got_pos = np.stack([np.asarray(res.px), np.asarray(res.py),
                        np.asarray(res.pz)], axis=1)
    got_n = np.stack([np.asarray(res.nx), np.asarray(res.ny),
                      np.asarray(res.nz)], axis=1)
    got_uv = np.stack([np.asarray(res.uv_u), np.asarray(res.uv_v)], axis=1)
    got_its = np.asarray(res.its)

    mismatches = 0
    for i in range(n):
        want = scalar_trace.trace(world, origins[i], dirs[i], 0.0)
        if bool(got_hit[i]) != want.hit:
            mismatches += 1
            continue
        if want.hit:
            if not np.allclose(got_pos[i], want.pos, atol=2e-3):
                mismatches += 1
                continue
            if not np.array_equal(got_n[i], want.normal):
                mismatches += 1
                continue
            if not np.allclose(got_uv[i], want.uv, atol=2e-3):
                mismatches += 1
                continue
            if got_its[i] != want.its:
                mismatches += 1
                continue
    # Allow <1% boundary-grazing disagreements from FMA contraction.
    assert mismatches <= n // 100, f"{mismatches}/{n} rays disagree"


@pytest.fixture(scope="module")
def flat_floor_world():
    """Synthetic world: solid below y=8, empty above - analytic expectations."""
    cfg = WorldConfig().with_cube(6)
    solid = np.zeros((cfg.size_z, cfg.size_y, cfg.size_x), bool)
    solid[:, :8, :] = True
    bits = vg.pack_bits_x(jnp.asarray(solid)).reshape(-1)
    sdf = sdf_mod.build_sdf(vg.coarse_occupancy(bits, cfg), cfg)
    return cfg, bits, sdf


def test_rays_up_miss(flat_floor_world):
    cfg, bits, sdf = flat_floor_world
    rcfg = RenderConfig()
    n = 32
    rng = np.random.default_rng(3)
    ox = rng.uniform(5, cfg.size_x - 5, n).astype(np.float32)
    oz = rng.uniform(5, cfg.size_z - 5, n).astype(np.float32)
    oy = np.full(n, 20.0, np.float32)
    res = wavefront.trace(bits, sdf, cfg, rcfg, ox, oy, oz,
                          np.zeros(n, np.float32), np.ones(n, np.float32),
                          np.zeros(n, np.float32), np.zeros(n, np.float32))
    assert not np.asarray(res.hit).any()
    # miss sentinel position preserved (trace returns pos=(-500,..) on miss)
    assert np.all(np.asarray(res.px) == -500.0)


def test_rays_down_hit_floor(flat_floor_world):
    cfg, bits, sdf = flat_floor_world
    rcfg = RenderConfig()
    n = 32
    rng = np.random.default_rng(4)
    ox = rng.uniform(5, cfg.size_x - 5, n).astype(np.float32)
    oz = rng.uniform(5, cfg.size_z - 5, n).astype(np.float32)
    oy = np.full(n, 40.0, np.float32)
    res = wavefront.trace(bits, sdf, cfg, rcfg, ox, oy, oz,
                          np.zeros(n, np.float32), -np.ones(n, np.float32),
                          np.zeros(n, np.float32), np.zeros(n, np.float32))
    hit = np.asarray(res.hit)
    assert hit.all()
    # straight-down rays hit the up-facing floor at exactly y=8
    assert np.all(np.asarray(res.ny)[hit] == 1.0)
    np.testing.assert_allclose(np.asarray(res.py)[hit], 8.0, atol=1e-3)


def test_start_distance_offsets_march(small_world):
    """t_start mirrors the reference's `half distance` parameter: marching
    from origin+t*dir must land on the same surface as t=0 when unobstructed."""
    cfg, bits, sdf, _ = small_world
    rcfg = RenderConfig()
    o = np.float32([32.0, 60.0, 32.0])
    d = np.float32([0.0, -1.0, 0.0])
    r0 = wavefront.trace(bits, sdf, cfg, rcfg, o[0], o[1], o[2],
                         d[0], d[1], d[2], np.float32(0.0))
    r1 = wavefront.trace(bits, sdf, cfg, rcfg, o[0], o[1], o[2],
                         d[0], d[1], d[2], np.float32(4.0))
    assert bool(r0.hit) and bool(r1.hit)
    np.testing.assert_allclose(float(r0.py), float(r1.py), atol=1e-3)


def test_oob_start_and_sky_retirement(small_world):
    """Init-retired lanes must be indistinguishable from looped ones:
    an OOB march start (reference: sphere returns (-100)^3, DDA's loop-top
    its++ then bounds-miss) gives miss with its == 2; sky_y-retired upward
    rays miss with its == 1 and identical hit flags vs a no-sky_y trace."""
    cfg, bits, sdf, world = small_world
    rcfg = RenderConfig()

    # t_start pushes the position above the world -> OOB start
    o = np.float32([32.0, 60.0, 32.0])
    d = np.float32([0.0, 1.0, 0.0])
    r = wavefront.trace(bits, sdf, cfg, rcfg, o[0], o[1], o[2],
                        d[0], d[1], d[2], np.float32(16.0))
    assert not bool(r.hit)
    assert int(r.its) == 2
    want = scalar_trace.trace(world, o, d, 16.0)
    assert not want.hit and want.its == 2

    # sky_y: upward rays above the world's highest solid voxel
    n = 64
    rng = np.random.default_rng(11)
    ox = rng.uniform(2, cfg.size_x - 2, n).astype(np.float32)
    oz = rng.uniform(2, cfg.size_z - 2, n).astype(np.float32)
    oy = rng.uniform(2, cfg.size_y - 2, n).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True).astype(np.float32)
    sky_y = jnp.asarray(vg.sky_limit(bits, cfg))
    r_sky = wavefront.trace(bits, sdf, cfg, rcfg, ox, oy, oz,
                            dirs[:, 0], dirs[:, 1], dirs[:, 2],
                            np.zeros(n, np.float32), sky_y=sky_y)
    r_ref = wavefront.trace(bits, sdf, cfg, rcfg, ox, oy, oz,
                            dirs[:, 0], dirs[:, 1], dirs[:, 2],
                            np.zeros(n, np.float32))
    np.testing.assert_array_equal(np.asarray(r_sky.hit),
                                  np.asarray(r_ref.hit))
    retired = (dirs[:, 1] >= 0) & (oy >= float(sky_y))
    assert np.all(np.asarray(r_sky.its)[retired] == 1)
    # hit payloads identical where both hit
    hit = np.asarray(r_ref.hit)
    np.testing.assert_allclose(np.asarray(r_sky.py)[hit],
                               np.asarray(r_ref.py)[hit], atol=1e-5)


def test_far_extended_sdf_same_hits():
    """Tracing against the far-mip-extended SDF (sdf.extend_sdf_far) must
    find the same surfaces as the plain SDF - the extension is a pure
    work-saver (bigger conservative steps), never a behavior change.
    Uses the sparse 256^3 floor+pillars world (test_world.sparse_world_256)
    whose open space saturates the base 64-cap, so long jumps toward thin
    pillars exercise the tunneling risk directly."""
    from tests.test_world import sparse_world_256

    cfg, bits, _ = sparse_world_256()
    rcfg = RenderConfig()
    coarse = vg.coarse_occupancy(bits, cfg)
    base = sdf_mod.build_sdf(coarse, cfg)
    ext = sdf_mod.extend_sdf_far(base, coarse, cfg)
    assert (np.asarray(ext) > np.asarray(base)).any()

    n = 512
    origins, dirs = _random_rays(n, 23, cfg.size_x)
    t0 = jnp.zeros(n, jnp.float32)
    r_base = wavefront.trace(bits, base, cfg, rcfg,
                             origins[:, 0], origins[:, 1], origins[:, 2],
                             dirs[:, 0], dirs[:, 1], dirs[:, 2], t0)
    r_ext = wavefront.trace(bits, ext, cfg, rcfg,
                            origins[:, 0], origins[:, 1], origins[:, 2],
                            dirs[:, 0], dirs[:, 1], dirs[:, 2], t0)
    np.testing.assert_array_equal(np.asarray(r_base.hit),
                                  np.asarray(r_ext.hit))
    hit = np.asarray(r_base.hit)
    for a, b in ((r_base.px, r_ext.px), (r_base.py, r_ext.py),
                 (r_base.pz, r_ext.pz)):
        np.testing.assert_allclose(np.asarray(a)[hit], np.asarray(b)[hit],
                                   atol=2e-3)
    for a, b in ((r_base.nx, r_ext.nx), (r_base.ny, r_ext.ny),
                 (r_base.nz, r_ext.nz)):
        np.testing.assert_array_equal(np.asarray(a)[hit],
                                      np.asarray(b)[hit])
    # the extension must never cost iterations on average - it exists to
    # shed them
    assert np.asarray(r_ext.its).mean() <= np.asarray(r_base.its).mean()
