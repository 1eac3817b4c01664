"""World layer tests: bit packing, is_solid gathers, coarse occupancy, SDF.

The SDF is checked against a scalar emulation of the reference's 3-pass
pipeline (``CoarseArray.cu:37-152``) *including* its intermediate uint8
truncation - which underestimates the true Euclidean distance for some cells
(safe for sphere tracing; preserved deliberately).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rvgrt_tpu.config import WorldConfig
from rvgrt_tpu.core import terrain
from rvgrt_tpu.world import sdf as sdf_mod
from rvgrt_tpu.world import voxel_grid as vg


@pytest.fixture(scope="module")
def world64():
    cfg = WorldConfig().with_cube(6)
    bits = vg.generate(cfg)
    fine = np.asarray(vg.unpack_bits_x(
        np.asarray(bits).reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)))
    return cfg, bits, fine


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    sol = rng.random((4, 8, 64)) > 0.5
    words = vg.pack_bits_x(jnp.asarray(sol))
    assert words.dtype == jnp.uint32
    np.testing.assert_array_equal(np.asarray(vg.unpack_bits_x(words)), sol)


def test_generate_matches_density(world64):
    cfg, _, fine = world64
    rng = np.random.default_rng(1)
    xs = rng.integers(0, cfg.size_x, 128)
    ys = rng.integers(0, cfg.size_y, 128)
    zs = rng.integers(0, cfg.size_z, 128)
    dens = np.asarray(terrain.evaluate_density(
        xs.astype(np.float32), ys.astype(np.float32), zs.astype(np.float32)))
    np.testing.assert_array_equal(fine[zs, ys, xs],
                                  dens > cfg.solid_threshold)


def test_is_solid_gather(world64):
    cfg, bits, fine = world64
    rng = np.random.default_rng(2)
    xs = rng.integers(0, cfg.size_x, 256)
    ys = rng.integers(0, cfg.size_y, 256)
    zs = rng.integers(0, cfg.size_z, 256)
    got = np.asarray(vg.is_solid(bits, cfg, xs, ys, zs))
    np.testing.assert_array_equal(got, fine[zs, ys, xs])


def test_coarse_occupancy(world64):
    cfg, bits, fine = world64
    got = np.asarray(vg.coarse_occupancy(bits, cfg))
    c = cfg.sdf_coarseness
    want = fine.reshape(cfg.size_z // c, c, cfg.size_y // c, c,
                        cfg.size_x // c, c).any(axis=(1, 3, 5))
    np.testing.assert_array_equal(got, want)


def _scalar_sdf_pipeline(solid: np.ndarray, cap: int) -> np.ndarray:
    """Scalar emulation of the reference's three passes with uint8 truncation
    between them (the golden model for build_sdf)."""
    sz, sy, sx = solid.shape
    # pass X: nearest solid along x, capped
    dist_x = np.full(solid.shape, cap, np.int32)
    for z in range(sz):
        for y in range(sy):
            xs = np.where(solid[z, y])[0]
            if len(xs) == 0:
                continue
            d = np.abs(np.arange(sx)[:, None] - xs[None, :]).min(axis=1)
            dist_x[z, y] = np.minimum(d, cap)

    def minconv(prev, axis):
        sq = prev.astype(np.int64) ** 2
        best = sq.copy()
        for off in range(1, min(cap, prev.shape[axis] - 1) + 1):
            off2 = off * off
            lo = np.full_like(sq, 2 * cap * cap + 1)
            hi = np.full_like(sq, 2 * cap * cap + 1)
            sl_lo = [slice(None)] * 3
            sl_lo[axis] = slice(off, None)
            sl_dst_lo = [slice(None)] * 3
            sl_dst_lo[axis] = slice(0, prev.shape[axis] - off)
            lo[tuple(sl_dst_lo)] = sq[tuple(sl_lo)]
            sl_hi = [slice(None)] * 3
            sl_hi[axis] = slice(0, prev.shape[axis] - off)
            sl_dst_hi = [slice(None)] * 3
            sl_dst_hi[axis] = slice(off, None)
            hi[tuple(sl_dst_hi)] = sq[tuple(sl_hi)]
            best = np.minimum(best, np.minimum(lo, hi) + off2)
        return np.minimum(np.floor(np.sqrt(best)).astype(np.int32), cap)

    dist_xy = minconv(dist_x, axis=1)
    return minconv(dist_xy, axis=0).astype(np.uint8)


def test_sdf_matches_scalar_pipeline(world64):
    cfg, bits, fine = world64
    coarse = np.asarray(vg.coarse_occupancy(bits, cfg))
    got = np.asarray(sdf_mod.build_sdf(jnp.asarray(coarse), cfg)).reshape(
        coarse.shape)
    want = _scalar_sdf_pipeline(coarse, cfg.sdf_max_dist)
    np.testing.assert_array_equal(got, want)


def test_sdf_zero_on_solid_and_safe_lower_bound(world64):
    """SDF must never overestimate: d(cell) <= true distance to the nearest
    solid coarse cell (the sphere-trace safety property)."""
    cfg, bits, _ = world64
    coarse = np.asarray(vg.coarse_occupancy(bits, cfg))
    sdf = np.asarray(sdf_mod.build_sdf(jnp.asarray(coarse), cfg)).reshape(
        coarse.shape)
    assert (sdf[coarse] == 0).all()
    solid_pts = np.argwhere(coarse)
    rng = np.random.default_rng(5)
    for _ in range(50):
        z, y, x = [int(rng.integers(0, s)) for s in coarse.shape]
        true_d = np.sqrt(((solid_pts - [z, y, x]) ** 2).sum(axis=1).min())
        assert sdf[z, y, x] <= min(cfg.sdf_max_dist, true_d) + 1e-6


def sparse_world_256():
    """Synthetic 256^3 world: thin floor + scattered pillars.  Open space
    reaches ~250 voxels of clearance, so the base SDF saturates its 64-cap
    and the far mip actually wins the max (terrain worlds under 512^3 never
    get 128+ voxels from geometry)."""
    cfg = WorldConfig().with_cube(8)
    solid = np.zeros((cfg.size_z, cfg.size_y, cfg.size_x), bool)
    solid[:, :4, :] = True
    rng = np.random.default_rng(17)
    for _ in range(12):
        x = int(rng.integers(8, cfg.size_x - 12))
        z = int(rng.integers(8, cfg.size_z - 12))
        h = int(rng.integers(20, cfg.size_y - 8))
        solid[z:z + 4, 4:h, x:x + 4] = True
    bits = vg.pack_bits_x(jnp.asarray(solid)).reshape(-1)
    return cfg, bits, solid


def test_far_extended_sdf_is_conservative():
    """Every synthesized far value d' must keep the tracer's largest
    derived displacement (probe jump: d'*coarseness + 1) within the exact
    clearance of every point of the coarse cell - the no-tunneling
    property extend_sdf_far's docstring derives."""
    cfg, bits, fine = sparse_world_256()
    coarse = np.asarray(vg.coarse_occupancy(bits, cfg))
    base = np.asarray(sdf_mod.build_sdf(jnp.asarray(coarse), cfg)).reshape(
        coarse.shape)
    ext = np.asarray(sdf_mod.extend_sdf_far(
        jnp.asarray(base.reshape(-1)), jnp.asarray(coarse), cfg)).reshape(
        coarse.shape)
    assert (ext >= base).all()
    inflated = np.argwhere(ext > base)
    assert len(inflated) > 0  # the fixture must exercise the far band
    assert int(ext.max()) > cfg.sdf_max_dist
    solid_pts = np.argwhere(fine).astype(np.float64)  # (N, 3) z,y,x voxels
    c = float(cfg.sdf_coarseness)
    rng = np.random.default_rng(11)
    sel = inflated[rng.permutation(len(inflated))[:200]]
    for z, y, x in sel:
        # min distance between the coarse-cell box and any solid voxel box
        cell_lo = np.array([z, y, x], np.float64) * c
        gap_lo = solid_pts - (cell_lo + c)       # solid box low - cell high
        gap_hi = cell_lo - (solid_pts + 1.0)     # cell low - solid box high
        gap = np.maximum(np.maximum(gap_lo, gap_hi), 0.0)
        clearance = np.sqrt((gap * gap).sum(axis=1).min())
        d = int(ext[z, y, x])
        assert d * c + 1 <= clearance + 1e-9, (
            f"cell {(z, y, x)} d'={d} jump {d * c + 1} > "
            f"clearance {clearance:.2f}")


def test_sample_sdf_at_voxel_clamps(world64):
    cfg, bits, _ = world64
    coarse = vg.coarse_occupancy(bits, cfg)
    sdf = sdf_mod.build_sdf(coarse, cfg)
    sdf_np = np.asarray(sdf).reshape(cfg.sdf_size_z, cfg.sdf_size_y,
                                     cfg.sdf_size_x)
    # out-of-range voxel coords clamp into the grid like getDistance
    got = np.asarray(sdf_mod.sample_sdf_at_voxel(
        sdf, cfg, np.int32([-5, 9999]), np.int32([3, 3]), np.int32([3, 3])))
    want = [sdf_np[1, 1, 0], sdf_np[1, 1, cfg.sdf_size_x - 1]]
    np.testing.assert_array_equal(got, want)


def test_build_occlusion_matches_blocked_reduction():
    """The strided-slice reduction (TPU-layout-safe) must equal the naive
    (gz, r, gy, r, gx, r) blocked reduction for every mode."""
    from rvgrt_tpu.config import WorldConfig
    from rvgrt_tpu.world import gi_grid

    cfg = WorldConfig().with_cube(5)  # 32^3 -> sdf 16^3, gi 8^3, r = 2
    rng = np.random.default_rng(7)
    sdf = jnp.asarray(rng.integers(0, 65, cfg.sdf_num_cells, np.uint8))
    r = cfg.gi_coarseness // cfg.sdf_coarseness
    blk = np.asarray(sdf).reshape(cfg.gi_size_z, r, cfg.gi_size_y, r,
                                  cfg.gi_size_x, r)
    want = {
        "min": blk.min(axis=(1, 3, 5)),
        "max": blk.max(axis=(1, 3, 5)),
        "mean": (blk.astype(np.uint16).sum(axis=(1, 3, 5))
                 // (r * r * r)).astype(np.uint8),
    }
    for mode, w in want.items():
        got = np.asarray(gi_grid.build_occlusion(sdf, cfg, mode=mode))
        np.testing.assert_array_equal(got >> 24, w.reshape(-1), err_msg=mode)


@pytest.mark.full
def test_gi_init_strided_matches_full():
    """Strided GI init (gi/update.init_gi_strided): exact at the traced
    lattice sites, near-identical globally (sunlit-ness is smooth), and a
    valid starting point for the progressive sweep (VERDICT r2 #8)."""
    from rvgrt_tpu.config import EngineConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.gi import update as gi_update

    ecfg = EngineConfig(world=WorldConfig().with_cube(6))
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=False)
    full = gi_update.init_gi_chunked(world.bits, world.sdf, ecfg,
                                     sky_y=world.sky_y,
                                     table=world.trace_table)
    strided = gi_update.init_gi_strided(world.bits, world.sdf, ecfg,
                                        sky_y=world.sky_y,
                                        table=world.trace_table,
                                        stride=(2, 2))
    cfg = ecfg.world
    f = np.asarray(full).reshape(cfg.gi_size_z, cfg.gi_size_y,
                                 cfg.gi_size_x)
    s = np.asarray(strided).reshape(cfg.gi_size_z, cfg.gi_size_y,
                                    cfg.gi_size_x)
    # exact at the traced lattice sites
    np.testing.assert_array_equal(f[1::2, :, 1::2], s[1::2, :, 1::2])
    # globally near-identical: replication only errs at shadow boundaries
    same = (f == s).mean()
    assert same >= 0.80, f"strided init too different: {same:.2%} identical"
    # stride (1,1) is the chunked reference path verbatim
    s1 = gi_update.init_gi_strided(world.bits, world.sdf, ecfg,
                                   sky_y=world.sky_y,
                                   table=world.trace_table, stride=(1, 1))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(s1))


def test_gi_init_heightfield_matches_traced():
    """Ray-free heightfield GI init (gi/update.init_gi_heightfield,
    EngineConfig.gi_init_mode="heightfield"): agrees with the traced init
    (InitialGlobalIlluminate semantics) except at sun-facing cave mouths /
    overhangs, which horizon mapping cannot see (ADVICE r3 medium - the
    docstring's claimed gate now exists)."""
    from rvgrt_tpu.config import EngineConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.gi import update as gi_update

    ecfg = EngineConfig(world=WorldConfig().with_cube(6))
    world = eng_mod.build_world(ecfg, verbose=False, init_gi=False)
    traced = gi_update.init_gi_chunked(world.bits, world.sdf, ecfg,
                                       sky_y=world.sky_y,
                                       table=world.trace_table)
    hf = gi_update.init_gi_heightfield(world.bits, ecfg)
    cfg = ecfg.world
    t = np.asarray(traced)
    h = np.asarray(hf)
    assert h.shape == t.shape and h.dtype == t.dtype
    # identical wherever both agree on sun visibility; differences are
    # confined to overhang/cave geometry - a small fraction of cells
    same = (t == h).mean()
    assert same >= 0.85, f"heightfield init too different: {same:.2%}"
    # the lit cells' packed color is the exact sun color quantization
    # (alpha byte is 255 on EVERY cell - mask it off for lit-ness)
    rgb = h & np.uint32(0x00FFFFFF)
    rgb_t = t & np.uint32(0x00FFFFFF)
    lit = rgb != 0
    assert lit.any() and (~lit).any()
    vals = np.unique(rgb[lit])
    assert len(vals) == 1, vals
    tvals = np.unique(rgb_t[rgb_t != 0])
    assert set(vals) <= set(tvals), (vals, tvals)
