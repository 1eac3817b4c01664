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


@pytest.mark.full
def test_straggler_two_phase_matches_single_phase(small_world):
    """Two-phase straggler respite (RenderConfig.straggler_budget) must
    reproduce single-phase results: hit flags and normals exactly,
    positions/UVs to fp tolerance (phase 2 re-derives tMax from the
    resume point).  Swept over small budgets so lanes expire at every
    traversal phase - including right after stepping into a not-yet-
    tested cell (the case the 0.25-voxel resume backup exists for)."""
    import dataclasses

    cfg, bits, sdf, _ = small_world
    base = RenderConfig()

    # camera-style 128x128 grid (>= the 4*4096-lane engage threshold)
    # from an open-air valley spot looking around: ~85% hits with its up
    # to ~37 - a mix of quick converges, long marches and grazers
    h = w = 128
    o = np.float32([47.5, 36.0, 32.5])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = -0.6 + 1.4 * (xs / w)
    dy = 0.55 - 1.3 * (ys / h)
    dz = -0.6 + 1.4 * (ys / h)
    n_ = np.sqrt(dx * dx + dy * dy + dz * dz + 1e-8)
    dx, dy, dz = dx / n_, dy / n_, dz / n_
    t0 = jnp.zeros((h, w), jnp.float32)

    ref = wavefront.trace(bits, sdf, cfg, base, o[0], o[1], o[2],
                          dx, dy, dz, t0)
    ref_hit = np.asarray(ref.hit)
    assert ref_hit.any() and not ref_hit.all()

    for budget in (4, 8, 16):
        # cap_frac=1.0: every unfinished lane must resume (tiny budgets
        # leave far more than the production 25% cap unfinished)
        rcfg = dataclasses.replace(base, straggler_budget=budget,
                                   straggler_cap_frac=1.0)
        got = wavefront.trace(bits, sdf, cfg, rcfg, o[0], o[1], o[2],
                              dx, dy, dz, t0)
        np.testing.assert_array_equal(np.asarray(got.hit), ref_hit,
                                      err_msg=f"budget={budget}")
        assert np.all(np.asarray(got.exit_dir) == 0)
        # normals: exact, except a tiny budget of voxel-corner fp
        # near-ties (tMax re-derived from the resume point can flip the
        # face pick when two axes cross at indistinguishable t).  Each
        # such lane must still be a real face (nonzero normal) at the
        # same position - never the degenerate normal=0 first-cell hit.
        nm = np.zeros_like(ref_hit)
        for a, b in ((got.nx, ref.nx), (got.ny, ref.ny), (got.nz, ref.nz)):
            nm |= np.asarray(a) != np.asarray(b)
        nm &= ref_hit
        assert nm.sum() <= 3, f"budget={budget}: {nm.sum()} normal flips"
        nnz = (np.abs(np.asarray(got.nx)) + np.abs(np.asarray(got.ny))
               + np.abs(np.asarray(got.nz)))
        assert np.all(nnz[nm] == 1.0), f"budget={budget}: degenerate normal"
        for a, b in ((got.px, ref.px), (got.py, ref.py), (got.pz, ref.pz)):
            np.testing.assert_allclose(np.asarray(a)[ref_hit],
                                       np.asarray(b)[ref_hit], atol=2e-3,
                                       err_msg=f"budget={budget}")
        # UVs: modular distance (frac-of-face coords wrap 0.9999 <-> 0.0
        # when the hit lands exactly on a voxel edge - same physical
        # point, fp decides the side)
        for a, b in ((got.uv_u, ref.uv_u), (got.uv_v, ref.uv_v)):
            d = np.abs(np.asarray(a)[ref_hit & ~nm]
                       - np.asarray(b)[ref_hit & ~nm])
            d = np.minimum(d, 1.0 - d)
            assert d.max() < 2e-3, f"budget={budget}: uv diff {d.max()}"
        # misses keep the sentinel payload
        np.testing.assert_array_equal(np.asarray(got.px)[~ref_hit], -500.0)
        # its is a work metric: resume re-entry (major-loop entry, sphere
        # re-convergence, 1-2 re-tested cells behind the backup point)
        # drifts it by a few counts on resumed lanes only
        its_err = np.abs(np.asarray(got.its).astype(np.int64)
                         - np.asarray(ref.its).astype(np.int64))
        assert its_err.max() <= 6 and its_err.mean() <= 1.0

    # forced-tiny cap: over-cap stragglers degrade to miss, never crash
    # (documented bound).  straggler_cap_frac ~ 0 floors the buffer at
    # 4096 lanes; with budget=4 far more than 4096 lanes are unfinished.
    rcfg = dataclasses.replace(base, straggler_budget=4,
                               straggler_cap_frac=1e-6)
    got = wavefront.trace(bits, sdf, cfg, rcfg, o[0], o[1], o[2],
                          dx, dy, dz, t0)
    hit = np.asarray(got.hit)
    # every reported hit is a real single-phase hit with the same normal
    assert np.all(ref_hit[hit])
    for a, b in ((got.nx, ref.nx), (got.ny, ref.ny), (got.nz, ref.nz)):
        np.testing.assert_array_equal(np.asarray(a)[hit],
                                      np.asarray(b)[hit])
    # ...and the loss is observable: every silently-degraded ray raises
    # the telemetry flag, and flagged rays read as misses
    deg = np.asarray(got.degraded)
    assert deg.sum() > 0, "forced-tiny cap must overflow"
    assert not np.any(hit & deg)
    np.testing.assert_array_equal(np.asarray(got.px)[deg], -500.0)


def test_slim_carry_matches_incremental(small_world):
    """RenderConfig.slim_carry recomputes tMax from (cell, DDA-entry pos)
    instead of carrying it: algebraically the same value, so hit flags,
    normals and its must match exactly on generic rays; positions/UVs to
    float-rounding tolerance (the recomputed value can differ by ulps)."""
    import dataclasses

    cfg, bits, sdf, _ = small_world
    base = RenderConfig()
    h = w = 128
    o = np.float32([47.5, 36.0, 32.5])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = -0.6 + 1.4 * (xs / w)
    dy = 0.55 - 1.3 * (ys / h)
    dz = -0.6 + 1.4 * (ys / h)
    n_ = np.sqrt(dx * dx + dy * dy + dz * dz + 1e-8)
    dx, dy, dz = dx / n_, dy / n_, dz / n_
    t0 = jnp.zeros((h, w), jnp.float32)

    ref = wavefront.trace(bits, sdf, cfg, base, o[0], o[1], o[2],
                          dx, dy, dz, t0)
    rc = dataclasses.replace(base, slim_carry=True)
    got = wavefront.trace(bits, sdf, cfg, rc, o[0], o[1], o[2],
                          dx, dy, dz, t0)
    ref_hit = np.asarray(ref.hit)
    got_hit = np.asarray(got.hit)
    # ulp-level tMax differences legitimately flip the step order at
    # voxel-corner near-ties (and change the step count by +-1 on
    # corner-grazing paths); the contract is a tiny mismatch budget, with
    # every agreeing lane numerically tight
    hit_diff = (got_hit != ref_hit)
    assert hit_diff.sum() <= 3, f"{hit_diff.sum()} hit flips / 16K"
    both = ref_hit & got_hit
    nm = np.zeros_like(ref_hit)
    for a, b in ((got.nx, ref.nx), (got.ny, ref.ny), (got.nz, ref.nz)):
        nm |= np.asarray(a) != np.asarray(b)
    assert (nm & both).sum() <= 5
    its_d = np.abs(np.asarray(got.its).astype(np.int64)
                   - np.asarray(ref.its).astype(np.int64))
    assert its_d.max() <= 4 and its_d.mean() <= 0.01
    ok = both & ~nm
    for a, b in ((got.px, ref.px), (got.py, ref.py), (got.pz, ref.pz),
                 (got.t, ref.t)):
        np.testing.assert_allclose(np.asarray(a)[ok],
                                   np.asarray(b)[ok], atol=1e-3)
    # axis-aligned rays exercise the zero-direction guard (a dir component
    # of exactly 0 must never be stepped by the recomputed tMax)
    o2 = np.float32([32.25, 50.0, 32.75])
    d2 = np.zeros((4, 128, 3), np.float32)
    d2[0, :, 1] = -1.0
    d2[1, :, 0] = 1.0
    d2[2, :, 2] = -1.0
    d2[3, :, 0] = -0.7071
    d2[3, :, 1] = -0.7071
    r2 = wavefront.trace(bits, sdf, cfg, RenderConfig(), o2[0], o2[1],
                         o2[2], d2[..., 0], d2[..., 1], d2[..., 2],
                         jnp.zeros((4, 128), jnp.float32))
    g2 = wavefront.trace(bits, sdf, cfg, rc, o2[0], o2[1], o2[2],
                         d2[..., 0], d2[..., 1], d2[..., 2],
                         jnp.zeros((4, 128), jnp.float32))
    np.testing.assert_array_equal(np.asarray(g2.hit), np.asarray(r2.hit))
    for a, b in ((g2.px, r2.px), (g2.py, r2.py), (g2.pz, r2.pz)):
        hh = np.asarray(r2.hit)
        np.testing.assert_allclose(np.asarray(a)[hh], np.asarray(b)[hh],
                                   atol=1e-4)


def test_straggler_overflow_flag_zero_at_margin_cap(small_world):
    """At a cap that holds every straggler (frac=1.0, the production
    contract's margin case) the degraded flag is identically zero."""
    import dataclasses

    cfg, bits, sdf, _ = small_world
    h = w = 128
    o = np.float32([47.5, 36.0, 32.5])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = -0.6 + 1.4 * (xs / w)
    dy = 0.55 - 1.3 * (ys / h)
    dz = -0.6 + 1.4 * (ys / h)
    n_ = np.sqrt(dx * dx + dy * dy + dz * dz + 1e-8)
    rcfg = dataclasses.replace(RenderConfig(), straggler_budget=8,
                               straggler_cap_frac=1.0)
    got = wavefront.trace(bits, sdf, cfg, rcfg, o[0], o[1], o[2],
                          dx / n_, dy / n_, dz / n_,
                          jnp.zeros((h, w), jnp.float32))
    assert np.asarray(got.degraded).sum() == 0


def test_fused_superstep_matches_xla(small_world):
    """ops/superstep_kernel.py (Pallas, interpret on CPU) == the XLA
    superstep body, bit-exact on every TraceResult field, with and
    without the sky early-out.  The kernel calls the SAME
    _superstep_pregather/_superstep_update jnp functions, so this gate
    guards the ref plumbing (VMEM I/O order, sky SMEM scalar, reshape)
    rather than re-derived math."""
    import dataclasses

    cfg, bits, sdf, world = small_world
    table = wavefront.make_trace_table(bits, sdf, cfg)
    rc_x = RenderConfig(straggler_budget=0)
    rc_f = dataclasses.replace(rc_x, fused_superstep=True)
    n = 512
    origins, dirs = _random_rays(n, 11, cfg.size_x)
    args = (origins[:, 0], origins[:, 1], origins[:, 2],
            dirs[:, 0], dirs[:, 1], dirs[:, 2], jnp.zeros(n, jnp.float32))
    for sky in (None, jnp.float32(cfg.size_y)):
        rx = wavefront.trace(None, None, cfg, rc_x, *args, table=table,
                             sky_y=sky)
        rf = wavefront.trace(None, None, cfg, rc_f, *args, table=table,
                             sky_y=sky)
        for k in rx._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(rx, k)), np.asarray(getattr(rf, k)),
                err_msg=f"field {k} (sky={sky is not None})")
