"""Bit-packed voxel occupancy grid in HBM.

Replaces the reference's ``CArray`` (``include/CArray.cuh``, ``src/CArray.cu``):
a device buffer of uint32 words, 1 bit per voxel, x-fastest — word ``w``
holds voxels ``x = 32*w .. 32*w+31`` at fixed (y, z), and the linear bit index
is ``x | y << shift_x | z << (shift_x + shift_y)`` (``toIndex``,
``cumath.cuh:33-45``).  ``generate`` is the ``fillKernel`` equivalent
(``CArray.cu:8-30``): evaluate the terrain density at every voxel and pack
``density > 0.7`` bits — dispatched as fixed-size shape-generic chunks so the
unpacked boolean volume never materializes in HBM and ONE small executable
serves every world size (the build is compile-bound, PERF.md round-5).

Word indices stay int32: the word count is ``num_voxels / 32`` ≤ 2^28 even for
the reference's 2^33-voxel world.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import TerrainConfig, WorldConfig
from rvgrt_tpu.core import terrain

_U32 = jnp.uint32
_I32 = jnp.int32

# Bit weights for packing 32 bools into a uint32 (bit b = voxel x%32 == b).
_BIT_WEIGHTS = tuple(1 << b for b in range(32))


def pack_bits_x(solid: jax.Array) -> jax.Array:
    """Pack a (..., X) bool array into (..., X//32) uint32 words, x-fastest."""
    *lead, x = solid.shape
    assert x % 32 == 0
    grouped = solid.reshape(*lead, x // 32, 32).astype(_U32)
    weights = jnp.asarray(_BIT_WEIGHTS, _U32)
    return (grouped * weights).sum(axis=-1, dtype=_U32)


def unpack_bits_x(words: jax.Array) -> jax.Array:
    """Inverse of pack_bits_x: (..., W) uint32 -> (..., W*32) bool."""
    *lead, w = words.shape
    shifts = jnp.arange(32, dtype=_U32)
    bits = (words[..., None] >> shifts) & _U32(1)
    return bits.reshape(*lead, w * 32).astype(jnp.bool_)


# Words per generate chunk: 2^19 words = 16.7M voxels -> ~25 ms of device
# compute and <= ~70 MB f32 temps per elementwise op in the fused chain.
GENERATE_CHUNK_WORDS = 1 << 19


def _generate_chunk(w0, wpx_mask, wpx_shift, sy_mask, sy_shift, thr,
                    tcfg: TerrainConfig, chunk_words: int) -> jax.Array:
    """One fixed-size chunk of the world's occupancy words.

    All world-shape dependence (the word->(x,y,z) decode masks/shifts and
    the solid threshold) comes in as DEVICE scalars, so the jitted
    program is identical for every world size with the same chunk size:
    one small executable serves 1024^3, 2048^3 and the reference's
    4096x512x4096 world, compiles once per process and always hits the
    persistent cache (round-5 probe: per-shape slab compiles cost 56 s at
    slab_z=8 / 319 s at slab_z=32 for 2048^3, vs ~10-13 s of actual
    device compute - the build was compile-bound, PERF.md).
    """
    wi = w0 + jnp.arange(chunk_words, dtype=_I32)
    # word -> (x0, y, z): x-fastest words (toIndex, cumath.cuh:33-45)
    x0 = (wi & wpx_mask) << 5
    rest = wi >> wpx_shift
    y = rest & sy_mask
    z = rest >> sy_shift
    xs = (x0[:, None] + jnp.arange(32, dtype=_I32)).astype(jnp.float32)
    ys = y.astype(jnp.float32)[:, None]
    zs = z.astype(jnp.float32)[:, None]
    density = terrain.evaluate_density(xs, ys, zs, tcfg)  # (chunk, 32)
    return pack_bits_x(density > thr)[:, 0]  # (chunk_words,)


def generate(cfg: WorldConfig, tcfg: TerrainConfig = TerrainConfig(),
             slab_z: int = 8) -> jax.Array:
    """Procedurally generate the world -> flat (num_words,) uint32.

    Pure function of (cfg, tcfg): deterministic regeneration is the
    checkpoint format, as in the reference (State.cpp:44-54).

    Dispatches a Python loop of fixed-size shape-generic chunks (see
    ``_generate_chunk``); eager-only by design - under an outer jit the
    loop would unroll.  ``slab_z`` is accepted for backward compatibility
    and ignored (the old per-shape slab path is ``generate_slabs``).
    """
    del slab_z
    cfg.validate()
    n = cfg.num_words
    chunk = min(GENERATE_CHUNK_WORDS, n)
    assert n % chunk == 0  # both are powers of two

    fn = jax.jit(_generate_chunk, static_argnames=("tcfg", "chunk_words"))
    wpx = cfg.size_x // 32
    args = (jnp.int32(wpx - 1),
            jnp.int32(cfg.shift_x - 5),
            jnp.int32(cfg.size_y - 1),
            jnp.int32(cfg.shift_y),
            jnp.float32(cfg.solid_threshold))
    parts = [fn(jnp.int32(w0), *args, tcfg=tcfg, chunk_words=chunk)
             for w0 in range(0, n, chunk)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def generate_slabs(cfg: WorldConfig, tcfg: TerrainConfig = TerrainConfig(),
                   slab_z: int = 8) -> jax.Array:
    """The pre-round-5 z-slab ``lax.map`` generate (per-shape executable);
    kept for A/B measurement (scripts/probe_r30_worldbuild.py)."""
    cfg.validate()
    sx, sy, sz = cfg.size_x, cfg.size_y, cfg.size_z
    slab_z = min(slab_z, sz)
    assert sz % slab_z == 0

    xs = jnp.arange(sx, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(sy, dtype=jnp.float32)[None, :, None]
    thr = jnp.float32(cfg.solid_threshold)

    def slab(z0):
        zs = (z0 + jnp.arange(slab_z, dtype=_I32)).astype(jnp.float32)
        zs = zs[:, None, None]
        density = terrain.evaluate_density(xs, ys, zs, tcfg)
        return pack_bits_x(density > thr)  # (slab_z, sy, sx//32)

    z_starts = jnp.arange(0, sz, slab_z, dtype=_I32)
    words = jax.lax.map(slab, z_starts)  # (n_slabs, slab_z, sy, sx//32)
    return words.reshape(-1)


def word_index(cfg: WorldConfig, x, y, z):
    """Word + bit position of voxel (x, y, z); int32-safe for all configs."""
    wi = ((x >> 5)
          | (y << (cfg.shift_x - 5))
          | (z << (cfg.shift_x + cfg.shift_y - 5))).astype(_I32)
    return wi, (x & 31).astype(_U32)


def is_solid(bits: jax.Array, cfg: WorldConfig, x, y, z):
    """Gather occupancy bits at int voxel coords; broadcasts over arrays.

    Equivalent of ``IsSolid`` (``raytracing_functions.cuh:23-26``).  Like
    ``toIndex``, coordinates wrap modulo the world size (callers bounds-check
    first, as the reference tracer does).
    """
    x = jnp.asarray(x, _I32) & (cfg.size_x - 1)
    y = jnp.asarray(y, _I32) & (cfg.size_y - 1)
    z = jnp.asarray(z, _I32) & (cfg.size_z - 1)
    wi, bit = word_index(cfg, x, y, z)
    # constant-bound clamp right before the gather -> fast TPU gather path
    # (XLA inserts AssumeGatherIndicesInBound); see world/sdf.py
    wi = jnp.clip(wi, 0, cfg.num_words - 1)
    words = jnp.take(bits, wi, mode="clip")
    return ((words >> bit) & _U32(1)).astype(jnp.bool_)


# Brick shape for the tracer's DDA gather table: each uint32 word holds a
# 4x2x4 (x,y,z) neighborhood instead of the storage layout's 32x1x1 x-run.
# A DDA step moves to an adjacent cell, so one brick word serves ~3-4
# consecutive steps (VPU bit tests) before a new gather is needed - and
# random gathers are the entire tracer cost on TPU (PERF.md).
BRICK_X, BRICK_Y, BRICK_Z = 4, 2, 4


def to_brick_words(bits: jax.Array, cfg: WorldConfig) -> jax.Array:
    """Repack canonical x-run occupancy words into 4x2x4 brick words.

    Brick word index = (x>>2) | (y>>1) << (sx-2) | (z>>2) << (sx-2+sy-1);
    bit within word = (x&3) | (y&1)<<2 | (z&3)<<3.  Same total size as the
    canonical packing (num_voxels / 32 uint32 words).  Built once per world.

    Pure word-level nibble shuffles: each canonical 32-bit word holds 8
    aligned 4-voxel x-quads, and a brick word is the OR of its 8 (by, bz)
    quads shifted to ``4*by + 8*bz`` - so the repack is 8 strided slices
    x 8 nibble extracts, no 32-way bit expansion (the old per-bit
    formulation ran 722 s at the 4096x512x4096 world; this shape is
    ~dense-op-count x volume).  z-chunked to bound temps.
    """
    xw = cfg.size_x // 32
    vol = bits.reshape(cfg.size_z, cfg.size_y, xw)

    def chunk_fn(v):
        # v: (cz, sy, xw) with cz % BRICK_Z == 0
        czb = v.shape[0] // BRICK_Z
        yb = cfg.size_y // BRICK_Y
        acc = jnp.zeros((czb, yb, xw * 8), _U32)
        for bz in range(BRICK_Z):
            for by in range(BRICK_Y):
                sub = v[bz::BRICK_Z, by::BRICK_Y]        # (czb, yb, xw)
                sh = _U32(4 * by + 8 * bz)
                for xg in range(8):
                    quad = (sub >> _U32(4 * xg)) & _U32(0xF)
                    acc = acc.at[:, :, xg::8].add(quad << sh)
        return acc

    # bound chunk temps to ~256 MB of u32
    chunks = max(1, (vol.size * 4) >> 28)
    while chunks > 1 and (cfg.size_z % chunks
                          or (cfg.size_z // chunks) % BRICK_Z):
        chunks -= 1
    if chunks <= 1:
        return chunk_fn(vol).reshape(-1)
    out = jax.lax.map(chunk_fn,
                      vol.reshape((chunks, cfg.size_z // chunks)
                                  + vol.shape[1:]))
    return out.reshape(-1)


def to_brick_words_dense(bits: jax.Array, cfg: WorldConfig) -> jax.Array:
    """``to_brick_words`` without strided-slice updates (which lower to
    scatters on TPU): brick word ``i`` along x takes its 4-voxel quad
    ``i & 7`` from canonical word ``i >> 3``, so per (by, bz) the
    contribution is the canonical sub-plane repeated 8x along x, shifted
    right by ``4*(i & 7)`` and masked - dense elementwise ops only.
    Bit-exact vs ``to_brick_words`` (gated in tests/test_world.py)."""
    xw = cfg.size_x // 32
    vol = bits.reshape(cfg.size_z, cfg.size_y, xw)
    nib_shift = (_U32(4) * (jnp.arange(xw * 8, dtype=_U32) & _U32(7)))

    def chunk_fn(v):
        czb = v.shape[0] // BRICK_Z
        yb = cfg.size_y // BRICK_Y
        acc = jnp.zeros((czb, yb, xw * 8), _U32)
        for bz in range(BRICK_Z):
            for by in range(BRICK_Y):
                sub = v[bz::BRICK_Z, by::BRICK_Y]        # (czb, yb, xw)
                rep = jnp.repeat(sub, 8, axis=-1)        # (czb, yb, xw*8)
                quad = (rep >> nib_shift) & _U32(0xF)
                acc = acc + (quad << _U32(4 * by + 8 * bz))
        return acc

    chunks = max(1, (vol.size * 4) >> 28)
    while chunks > 1 and (cfg.size_z % chunks
                          or (cfg.size_z // chunks) % BRICK_Z):
        chunks -= 1
    if chunks <= 1:
        return chunk_fn(vol).reshape(-1)
    out = jax.lax.map(chunk_fn,
                      vol.reshape((chunks, cfg.size_z // chunks)
                                  + vol.shape[1:]))
    return out.reshape(-1)


def sky_limit(bits: jax.Array, cfg: WorldConfig) -> jax.Array:
    """1 + the highest solid voxel's y (f32 scalar), for the tracer's
    sky early-exit (``wavefront.trace(sky_y=...)``): an upward ray at or
    above this height can never hit anything."""
    y_any = (bits.reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)
             != 0).any(axis=(0, 2))
    top = jnp.where(y_any.any(),
                    cfg.size_y - jnp.argmax(y_any[::-1]).astype(_I32),
                    _I32(0))
    return top.astype(jnp.float32)


def column_height(bits: jax.Array, cfg: WorldConfig) -> jax.Array:
    """(size_z, size_x) i32: 1 + the highest solid voxel's y per column
    (0 = empty column) - the per-column refinement of ``sky_limit``.

    Feeds the heightfield sun-shadow GI init (``gi.update.
    init_gi_heightfield``).  Assembled with 32 strided column writes
    instead of a (z, x/32, 32) -> (z, x) reshape, whose size-32 minor dim
    tile-pads 4x on TPU (PERF.md layout notes).  Runs in z-chunks
    (``lax.map``): each per-bit pass materializes an i32 temp the size of
    the word volume - 1 GB x many live temps at the reference's
    4096x512x4096 world (measured 24 GB HBM OOM unchunked)."""
    words = bits.reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)
    ylev = jnp.arange(cfg.size_y, dtype=_I32)[None, :, None] + 1

    def chunk_fn(w):
        out = jnp.zeros((w.shape[0], cfg.size_x), _I32)
        for b in range(32):
            anyb = ((w >> jnp.uint32(b)) & jnp.uint32(1)).astype(_I32)
            out = out.at[:, b::32].set(jnp.max(anyb * ylev, axis=1))
        return out

    # bound the per-bit i32 temp to ~128 MB
    chunks = max(1, (words.size * 4) >> 27)
    if chunks <= 1 or cfg.size_z % chunks:
        return chunk_fn(words)
    out = jax.lax.map(chunk_fn,
                      words.reshape((chunks, cfg.size_z // chunks)
                                    + words.shape[1:]))
    return out.reshape(cfg.size_z, cfg.size_x)


def coarse_occupancy(bits: jax.Array, cfg: WorldConfig,
                     coarseness: int | None = None) -> jax.Array:
    """(SZ, SY, SX) bool: coarse cell solid iff any fine voxel inside is
    (``isCoarseBlockSolid``, ``CoarseArray.cu:11-32``).

    Works on packed words without unpacking the full fine volume: OR-reduce
    words over the coarse block in y/z, then fold 32-voxel words down to
    per-coarse-cell booleans along x.
    """
    c = cfg.sdf_coarseness if coarseness is None else coarseness
    sx, sy, sz = cfg.size_x, cfg.size_y, cfg.size_z
    words = bits.reshape(sz, sy, sx // 32)

    def reduce_chunk(wc):
        # OR words over the cxc (y,z) footprint via strided slices - NOT an
        # interior (..., c, ..., c, ...) reshape, whose size-c minor dims
        # pad to the (8, 128) TPU tile and inflate memory up to 64x
        acc = None
        for dz in range(c):
            for dy in range(c):
                part = wc[dz::c, dy::c, :]
                acc = part if acc is None else acc | part
        return _fold_x(acc, sx, c)

    # chunk over z to bound _fold_x's (..., 32/c)-minor u32 temp, which
    # pads its last dim to 128 lanes: ~128 * 4 bytes per coarse cell row
    # entry.  Cap chunks at ~256 MB of padded temp.
    padded_plane = (sy // c) * (sx // 32) * 128 * 4
    chunk_out = max(1, (256 << 20) // max(padded_plane, 1))
    chunk_z = c
    while chunk_z * 2 <= chunk_out * c and sz % (chunk_z * 2) == 0 \
            and chunk_z * 2 < sz:
        chunk_z *= 2
    if chunk_z >= sz:
        return reduce_chunk(words)
    out = jax.lax.map(reduce_chunk,
                      words.reshape(sz // chunk_z, chunk_z, sy, sx // 32))
    return out.reshape(sz // c, sy // c, sx // c)


def _fold_x(w: jax.Array, sx: int, c: int) -> jax.Array:
    """Fold (..., sx//32) uint32 OR-ed words into (..., sx//c) bools."""
    # Each word covers 32/c coarse cells along x: split the word into c-bit
    # groups and test non-zero.
    cells_per_word = 32 // c
    mask = _U32((1 << c) - 1)
    shifts = (jnp.arange(cells_per_word, dtype=_U32) * _U32(c))
    groups = (w[..., None] >> shifts) & mask  # (..., sx//32, cells_per_word)
    solid = groups != _U32(0)
    return solid.reshape(*w.shape[:-1], sx // c)
