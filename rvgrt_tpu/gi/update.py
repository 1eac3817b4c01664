"""Progressive GI radiance-cache update.

The reference's "training loop" (SURVEY.md §3.5): every frame, a round-robin
slice of 64^3 GI cells each casts one sun-shadow ray and one random bounce
ray through the shared tracer, and EMA-blends the new sample into the cell
at rate 0.04 (``GlobalIlluminate``, ``CoarseArray.cu:273-355``;
``InitialGlobalIlluminate``, lines 211-245).  The bounce ray reads the *same*
grid at the hit cell - a self-referential fixed-point iteration that
converges to multi-bounce GI (one bounce deeper per sweep).

TPU-isms vs the reference:
* the slice of cells is a contiguous window -> the scatter is one
  ``dynamic_update_slice``, no atomics, no read/write races (the reference
  tolerates an unsynchronized same-buffer race as Monte-Carlo noise -
  SURVEY.md §5.2; our update reads the pre-frame grid snapshot);
* the RNG is the same xorshift32 stream per cell (seeded
  ``idx + frame * 198491317``, line 252) but vectorized, with the
  rejection-sampled sphere direction unrolled to a fixed 8 attempts
  (acceptance ~52%/try => < 0.6% fall through to the last candidate,
  normalized regardless);
* quantization (trunc to uint8, clamp at 1.0) matches lines 339-354.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.render import shading
from rvgrt_tpu.trace import wavefront
from rvgrt_tpu.world import atlas as atlas_mod
from rvgrt_tpu.world import gi_grid, voxel_grid

_F32 = jnp.float32
_U32 = jnp.uint32


def _xorshift(state):
    state = state ^ (state << 13)
    state = state ^ (state >> 17)
    state = state ^ (state << 5)
    return state


def _rand01(state):
    """xorshift32 -> float in [0,1] (CoarseArray.cu:255-262)."""
    state = _xorshift(state)
    return state, state.astype(_F32) * _F32(1.0 / 4294967295.0)


def random_sphere_dirs(seed, attempts: int = 8):
    """Rejection-sampled uniform sphere directions (CoarseArray.cu:263-271),
    fixed-attempt vectorized: keep the first candidate with |p|^2 < 1."""
    state = seed
    px = jnp.zeros(seed.shape, _F32)
    py = jnp.zeros(seed.shape, _F32)
    pz = jnp.zeros(seed.shape, _F32)
    done = jnp.zeros(seed.shape, jnp.bool_)
    for _ in range(attempts):
        state, rx = _rand01(state)
        state, ry = _rand01(state)
        state, rz = _rand01(state)
        cx = rx * 2.0 - 1.0
        cy = ry * 2.0 - 1.0
        cz = rz * 2.0 - 1.0
        ok = (cx * cx + cy * cy + cz * cz) < 1.0
        take = ok & ~done
        px = jnp.where(take, cx, px)
        py = jnp.where(take, cy, py)
        pz = jnp.where(take, cz, pz)
        done = done | ok
    # fall-through lanes: use the last candidate (normalized below)
    px = jnp.where(done, px, cx)
    py = jnp.where(done, py, cy)
    pz = jnp.where(done, pz, cz)
    inv = 1.0 / jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-12))
    return px * inv, py * inv, pz * inv


def init_gi(bits, sdf, ecfg: EngineConfig, sky_y=None,
            table=None, offset: int = 0, count: int | None = None) -> jax.Array:
    """One sun-shadow ray per cell: sunlit cells start at sun color
    (InitialGlobalIlluminate, CoarseArray.cu:211-245).  ``offset``/``count``
    (static) select a cell slice - init_gi_chunked runs the full grid in
    bounded pieces (134M cells at the 2048^3 world need ~14 GB of SoA ray
    buffers in one program, which faults the 16 GB chip)."""
    cfg, lcfg = ecfg.world, ecfg.lighting
    rcfg = ecfg.render
    if ecfg.gi_straggler_budget > 0:
        rcfg = dataclasses.replace(rcfg,
                                   straggler_budget=ecfg.gi_straggler_budget)
    count = cfg.gi_num_cells if count is None else count
    idx = offset + jnp.arange(count, dtype=jnp.int32)
    # 2-D ray batch so the tracer's tile retirement applies
    idx = idx.reshape(-1, min(count, 4096))
    wx, wy, wz = gi_grid.cell_world_centers(cfg, idx)
    sun = lcfg.sun_dir
    res = wavefront.trace(bits, sdf, cfg, rcfg, wx, wy, wz,
                          jnp.full_like(wx, sun[0]),
                          jnp.full_like(wx, sun[1]),
                          jnp.full_like(wx, sun[2]),
                          jnp.full_like(wx, 0.0001), sky_y=sky_y,
                          table=table)
    lit = ~res.hit
    r = jnp.where(lit, _F32(lcfg.sun_color[0]), 0.0)
    g = jnp.where(lit, _F32(lcfg.sun_color[1]), 0.0)
    b = jnp.where(lit, _F32(lcfg.sun_color[2]), 0.0)
    return gi_grid.pack_rgba8(r, g, b).reshape(-1)


def init_gi_chunked(bits, sdf, ecfg: EngineConfig, sky_y=None, table=None,
                    chunk: int = 1 << 24) -> jax.Array:
    """Full-grid GI init in bounded slices (one jit, called per slice)."""
    import functools as _ft

    cells = ecfg.world.gi_num_cells
    if cells <= chunk:
        return jax.jit(init_gi, static_argnames=("ecfg",))(
            bits, sdf, ecfg, sky_y=sky_y, table=table)
    inner = jax.jit(_ft.partial(init_gi, ecfg=ecfg, count=chunk))
    full = cells - cells % chunk
    parts = [inner(bits, sdf, sky_y=sky_y, table=table,
                   offset=jnp.int32(off))  # traced: one compile, N calls
             for off in range(0, full, chunk)]
    rem = cells - full
    if rem:
        # tail slice at its own (one-off) jit size, padded up to the ray
        # batch width so the 2-D tile reshape in init_gi stays valid; the
        # padded window is anchored at cells - pad (>= 0 since cells >
        # chunk >= pad), so the leading pad - rem cells recompute values
        # already produced by the full chunks and are sliced off
        pad = min(-(-rem // 4096) * 4096, chunk)
        tail = jax.jit(_ft.partial(init_gi, ecfg=ecfg, count=pad))(
            bits, sdf, sky_y=sky_y, table=table,
            offset=jnp.int32(cells - pad))
        parts.append(tail[pad - rem:])
    return jnp.concatenate(parts)


def _init_cells(bits, sdf, ecfg: EngineConfig, idx, sky_y=None,
                table=None) -> jax.Array:
    """Init words for an arbitrary (2-D) batch of GI cell indices: one
    sun-shadow ray per cell (InitialGlobalIlluminate semantics)."""
    cfg, lcfg = ecfg.world, ecfg.lighting
    rcfg = ecfg.render
    if ecfg.gi_straggler_budget > 0:
        rcfg = dataclasses.replace(rcfg,
                                   straggler_budget=ecfg.gi_straggler_budget)
    wx, wy, wz = gi_grid.cell_world_centers(cfg, idx)
    sun = lcfg.sun_dir
    res = wavefront.trace(bits, sdf, cfg, rcfg, wx, wy, wz,
                          jnp.full_like(wx, sun[0]),
                          jnp.full_like(wx, sun[1]),
                          jnp.full_like(wx, sun[2]),
                          jnp.full_like(wx, 0.0001), sky_y=sky_y,
                          table=table)
    lit = ~res.hit
    r = jnp.where(lit, _F32(lcfg.sun_color[0]), 0.0)
    g = jnp.where(lit, _F32(lcfg.sun_color[1]), 0.0)
    b = jnp.where(lit, _F32(lcfg.sun_color[2]), 0.0)
    return gi_grid.pack_rgba8(r, g, b)


def init_gi_strided(bits, sdf, ecfg: EngineConfig, sky_y=None, table=None,
                    stride=(2, 2), chunk: int = 1 << 24) -> jax.Array:
    """GI init from a strided sun-visibility lattice: trace one ray per
    (stride_x x stride_z) cell block and replicate to neighbors.

    Sunlit-ness is spatially smooth away from shadow boundaries, the GI
    grid is already 4x coarser than the world, and the progressive sweep
    (``update_gi``) re-traces every cell within ``gi_sweep_frames``
    anyway - so a strided init costs 1/(sx*sz) of the reference's
    one-ray-per-cell ``InitialGlobalIlluminate`` (CoarseArray.cu:211-245)
    at an image-gated startup quality cost (tests/test_world.py).  This is
    the VERDICT-r2 #8 startup-latency lever: GI init was ~60% of the warm
    1024^3 world build."""
    cfg = ecfg.world
    sx, sz = stride
    if sx <= 1 and sz <= 1:
        return init_gi_chunked(bits, sdf, ecfg, sky_y=sky_y, table=table,
                               chunk=chunk)
    nx, ny, nz = cfg.gi_size_x, cfg.gi_size_y, cfg.gi_size_z
    nxc = -(-nx // sx)
    nzc = -(-nz // sz)
    gx = jnp.minimum(sx // 2 + sx * jnp.arange(nxc, dtype=jnp.int32),
                     nx - 1)
    gz = jnp.minimum(sz // 2 + sz * jnp.arange(nzc, dtype=jnp.int32),
                     nz - 1)
    gy = jnp.arange(ny, dtype=jnp.int32)
    idx = gi_grid.cell_index(cfg, gx[None, None, :], gy[None, :, None],
                             gz[:, None, None]).reshape(-1)
    total = int(idx.shape[0])
    import functools as _ft

    inner = jax.jit(_ft.partial(_init_cells, ecfg=ecfg))
    parts = []
    step = min(chunk, -(-total // 4096) * 4096)
    pad = -(-total // 4096) * 4096 - total
    if pad:
        idx = jnp.concatenate([idx, idx[-1] + jnp.zeros(pad, jnp.int32)])
    for off in range(0, total + pad, step):
        sl = idx[off:off + step].reshape(-1, 4096)
        parts.append(inner(bits, sdf, idx=sl, sky_y=sky_y,
                           table=table).reshape(-1))
    words = jnp.concatenate(parts)[:total].reshape(nzc, ny, nxc)
    # nearest replication back to the full lattice
    words = jnp.repeat(words, sz, axis=0)[:nz]
    words = jnp.repeat(words, sx, axis=2)[:, :, :nx]
    return words.reshape(-1)


def _shift_zero(a: jnp.ndarray, oz: int, ox: int) -> jnp.ndarray:
    """out[z, x] = a[z + oz, x + ox], zero beyond the borders (outside the
    world there are no occluders)."""
    if oz == 0 and ox == 0:
        return a
    pz_lo, pz_hi = max(-oz, 0), max(oz, 0)
    px_lo, px_hi = max(-ox, 0), max(ox, 0)
    p = jnp.pad(a, ((pz_lo, pz_hi), (px_lo, px_hi)))
    return p[oz + pz_lo:oz + pz_lo + a.shape[0],
             ox + px_lo:ox + px_lo + a.shape[1]]


def sun_shadow_height(height: jnp.ndarray, ecfg: EngineConfig
                      ) -> jnp.ndarray:
    """(size_z, size_x) f32 shadow height: a point at (x, y, z) has
    heightfield sun visibility iff ``y >= S[z, x]``.

    S(p) = max over t >= 0 of (H(p + t*u) - t*rise), where u is the sun
    direction's horizontal unit vector and rise its slope - classic
    horizon mapping, computed with 4 linear near-field steps + log-
    doubling for the far field (offsets rounded to voxels per step; the
    rounding is an init-prior approximation, not a render-path one).
    """
    cfg, lcfg = ecfg.world, ecfg.lighting
    s = lcfg.sun_dir
    hn = math.sqrt(s[0] * s[0] + s[2] * s[2])
    assert s[1] > 0 and hn > 0, s
    ux, uz = s[0] / hn, s[2] / hn
    rise = s[1] / hn
    S = height.astype(_F32)
    H = S
    for t in (1, 2, 3):
        S = jnp.maximum(S, _shift_zero(H, round(t * uz), round(t * ux))
                        - _F32(t * rise))
    d = 4.0
    while d * rise < cfg.size_y:
        S = jnp.maximum(S, _shift_zero(S, round(d * uz), round(d * ux))
                        - _F32(d * rise))
        d *= 2.0
    return S


def init_gi_heightfield(bits, ecfg: EngineConfig,
                        height: jnp.ndarray | None = None) -> jax.Array:
    """Ray-free GI init from the terrain's sun-shadow heightfield.

    The reference's ``InitialGlobalIlluminate`` (CoarseArray.cu:211-245)
    traces one sun-shadow ray per GI cell - 2 rays/cell x 134M cells at
    the 4096x512x4096 world, the dominant world-build phase (VERDICT r2
    #8: GI init was ~60% of the warm 1024^3 build).  For everything
    above ground, that ray answers a heightfield visibility query, which
    horizon mapping answers for ALL cells in O(log height) shifted-max
    passes over the 2-D height map - no rays at all.  Differences vs the
    traced init are confined to sun-aligned cave openings/overhangs
    (mismatch fraction gated in tests/test_world.py); the progressive
    sweep (``update_gi``) re-traces every cell within
    ``gi_sweep_frames`` frames anyway, so the init is a prior, not a
    steady state."""
    from rvgrt_tpu.world import voxel_grid

    cfg, lcfg = ecfg.world, ecfg.lighting
    if height is None:
        height = voxel_grid.column_height(bits, cfg)
    S = sun_shadow_height(height, ecfg)
    c = cfg.gi_coarseness
    # GI cell column centers sit at (g + 0.5) * c -> nearest column c//2
    S_g = S[c // 2::c, c // 2::c]                      # (gz, gx)
    wy = (jnp.arange(cfg.gi_size_y, dtype=_F32) + 0.5) * _F32(c)
    lit = wy[None, :, None] >= S_g[:, None, :]         # (gz, gy, gx)
    r = jnp.where(lit, _F32(lcfg.sun_color[0]), 0.0)
    g = jnp.where(lit, _F32(lcfg.sun_color[1]), 0.0)
    b = jnp.where(lit, _F32(lcfg.sun_color[2]), 0.0)
    return gi_grid.pack_rgba8(r, g, b).reshape(-1)


def update_gi(gi: jax.Array, bits, sdf, atlas, ecfg: EngineConfig,
              frame: jax.Array, offset: jax.Array, sky_y=None,
              table=None, return_stats: bool = False) -> jax.Array:
    """One progressive sweep slice: update ``gi_rays_per_frame`` cells
    starting at ``offset`` (GlobalIlluminate, CoarseArray.cu:273-355).

    ``return_stats``: also return ``{"straggler_overflow": i32 scalar}`` -
    the count of rays this window that blew the two-phase straggler cap
    and silently degraded to miss (expected 0 at production caps; the
    bench surfaces this per frame)."""
    cfg, lcfg, rcfg = ecfg.world, ecfg.lighting, ecfg.render
    if ecfg.gi_straggler_budget > 0:
        # two-phase straggler respite for the GI traces (config.py
        # gi_straggler_budget): 2.1x on the bounce-ray-dominated window
        rcfg = dataclasses.replace(rcfg,
                                   straggler_budget=ecfg.gi_straggler_budget)
    n = ecfg.gi_window
    if table is None:
        table = wavefront.make_trace_table(bits, sdf, cfg)
    idx = offset.astype(jnp.int32) + jnp.arange(n, dtype=jnp.int32)
    # 2-D ray batch so the tracer's tile retirement applies
    idx = idx.reshape(-1, min(n, 4096))
    wx, wy, wz = gi_grid.cell_world_centers(cfg, idx)

    # cells inside solid voxels are skipped (kept unchanged, line 296-300);
    # park their rays out of bounds so they init-retire instead of tracing
    # to a discarded result (roughly half the window is buried in terrain
    # worlds - measured 880 -> ~500 ms per 64^3-cell update at 512^3)
    inside = voxel_grid.is_solid(
        bits, cfg,
        jnp.floor(wx).astype(jnp.int32),
        jnp.floor(wy).astype(jnp.int32),
        jnp.floor(wz).astype(jnp.int32))
    wx = jnp.where(inside, _F32(-10.0), wx)
    wy = jnp.where(inside, _F32(-10.0), wy)
    wz = jnp.where(inside, _F32(-10.0), wz)

    sun = lcfg.sun_dir
    shadow = wavefront.trace(bits, sdf, cfg, rcfg, wx, wy, wz,
                             jnp.full_like(wx, sun[0]),
                             jnp.full_like(wx, sun[1]),
                             jnp.full_like(wx, sun[2]),
                             jnp.full_like(wx, 0.001), table=table,
                             sky_y=sky_y)
    new_r = jnp.where(~shadow.hit, _F32(lcfg.sun_color[0]), 0.0)
    new_g = jnp.where(~shadow.hit, _F32(lcfg.sun_color[1]), 0.0)
    new_b = jnp.where(~shadow.hit, _F32(lcfg.sun_color[2]), 0.0)

    # one random bounce ray; seed = idx + frame * 198491317 (line 252)
    seed = (idx.astype(_U32)
            + frame.astype(_U32) * _U32(198491317))
    bdx, bdy, bdz = random_sphere_dirs(seed)
    bounce = wavefront.trace(bits, sdf, cfg, rcfg, wx, wy, wz,
                             bdx, bdy, bdz, jnp.full_like(wx, 0.001),
                             table=table, sky_y=sky_y)

    # hit: previous-radiance at hit cell x surface albedo (color bleeding)
    br, bg, bb, _, ok = gi_grid.sample_at_world(gi, cfg, bounce.px,
                                                bounce.py, bounce.pz)
    alb = atlas_mod.sample_texture(atlas, bounce.uv_u, bounce.uv_v,
                                   bounce.px, bounce.py, bounce.pz)
    hit_contrib = (br * alb[0], bg * alb[1], bb * alb[2])
    sky_col = shading.sample_sky((bdx, bdy, bdz), lcfg)
    use_hit = bounce.hit & ok
    add_r = jnp.where(use_hit, hit_contrib[0],
                      jnp.where(bounce.hit, 0.0, sky_col[0]))
    add_g = jnp.where(use_hit, hit_contrib[1],
                      jnp.where(bounce.hit, 0.0, sky_col[1]))
    add_b = jnp.where(use_hit, hit_contrib[2],
                      jnp.where(bounce.hit, 0.0, sky_col[2]))
    new_r = new_r + add_r
    new_g = new_g + add_g
    new_b = new_b + add_b

    # EMA blend into the previous quantized value (lines 339-354)
    prev_words = jax.lax.dynamic_slice(
        gi, (offset.astype(jnp.int32),), (n,)).reshape(idx.shape)
    pr, pg, pb, _ = gi_grid.unpack_rgba8(prev_words)
    lr = _F32(lcfg.gi_learning_rate)
    fr = pr + (new_r - pr) * lr
    fg = pg + (new_g - pg) * lr
    fb = pb + (new_b - pb) * lr
    packed = gi_grid.pack_rgba8(fr, fg, fb)
    packed = jnp.where(inside, prev_words, packed)
    new_gi = jax.lax.dynamic_update_slice(gi, packed.reshape(-1),
                                          (offset.astype(jnp.int32),))
    if return_stats:
        overflow = (jnp.sum(shadow.degraded.astype(jnp.int32))
                    + jnp.sum(bounce.degraded.astype(jnp.int32)))
        return new_gi, {"straggler_overflow": overflow}
    return new_gi


def gi_delta(prev: jax.Array, new: jax.Array) -> jax.Array:
    """Mean absolute per-channel radiance change between two GI grids, in
    [0, 1] units - the convergence metric for BASELINE config 4 ("frames
    to stable EMA").  The progressive EMA update is a contraction toward
    the (slowly moving) fixed point, so this decays ~(1 - lr) per full
    sweep once lighting is static."""
    pr, pg, pb, _ = gi_grid.unpack_rgba8(prev)
    nr, ng, nb, _ = gi_grid.unpack_rgba8(new)
    return (jnp.abs(nr - pr) + jnp.abs(ng - pg) + jnp.abs(nb - pb)).mean() \
        / 3.0


def advance_offset(offset: int, ecfg: EngineConfig) -> int:
    """Round-robin window walk, wrapping at the grid size
    (CoarseArray.cu:392-394)."""
    n = ecfg.gi_window
    if offset + n >= ecfg.world.gi_num_cells:
        return 0
    return offset + n
