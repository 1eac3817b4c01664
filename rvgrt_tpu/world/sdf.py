"""Coarse signed-distance field: separable distance transform, TPU-style.

Produces the same uint8 field as the reference's three CUDA passes
(``CoarseArray.cu:37-152``): for each coarse cell, the Euclidean distance (in
coarse cells) to the nearest solid coarse cell, computed axis-by-axis and
clamped to ``SDF_MAX_DIST`` (64), with each pass truncating to uint8 like the
reference's ``(unsigned char)fminf(...)`` casts.

The reference scans up to +-64 neighbours per cell with data-dependent early
exit - a divergence pattern that is poison on a vector machine.  Here:

* pass X is two *associative scans* (``lax.cummax`` of solid-index forward /
  backward), exact 1D nearest-solid distance in O(N);
* passes Y and Z are bounded min-plus convolutions: ``min over |off| <= 64 of
  prev[i+off]^2 + off^2``, evaluated as a ``fori_loop`` over offsets with
  static-size dynamic slices of a padded volume - fully vectorized over the
  whole grid, no divergence.

The early exits in the reference are pure optimizations; results match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import WorldConfig

_I32 = jnp.int32
_BIG = 1 << 20  # "infinity" index sentinel, safely squarable in int32


def _axis_distance_1d(solid: jax.Array, axis: int, cap: int,
                      chunks: int | None = None) -> jax.Array:
    """Distance (in cells) along ``axis`` to the nearest solid cell, capped;
    returned as uint8 (the reference truncates every pass to uint8).

    Exact equivalent of the reference's bidirectional X scan
    (``computeDistX``, ``CoarseArray.cu:37-75``) via cummax/cummin of the
    last/next solid index.  For big volumes the scan runs in leading-axis
    chunks (``lax.map``): the i32 scan temps are ~4x the volume, which blows
    HBM at 1024^3 coarse cells (the 2048^3 world) if materialized at once.
    """
    n = solid.shape[axis]
    shape = [1] * solid.ndim
    shape[axis] = n
    idx = jnp.arange(n, dtype=_I32).reshape(shape)

    def scan(sol):
        last_solid = jax.lax.cummax(jnp.where(sol, idx, _I32(-_BIG)),
                                    axis=axis)
        next_solid = jax.lax.cummin(jnp.where(sol, idx, _I32(_BIG)),
                                    axis=axis, reverse=True)
        dist = jnp.minimum(idx - last_solid, next_solid - idx)
        return jnp.minimum(dist, _I32(cap)).astype(jnp.uint8)

    if chunks is None:
        # bound the i32 temps to ~256 MB regardless of volume size
        chunks = max(1, solid.size * 4 // (256 * 1024 * 1024))
    lead = solid.shape[0]
    if axis == 0 or chunks <= 1 or lead % chunks:
        return scan(solid)
    out = jax.lax.map(scan,
                      solid.reshape((chunks, lead // chunks)
                                    + solid.shape[1:]))
    return out.reshape(solid.shape)


def _minconv_pass(prev_dist: jax.Array, axis: int, cap: int) -> jax.Array:
    """min over off in [-cap, cap] of prev[i+off]^2 + off^2 -> floor(sqrt),
    capped.  Equivalent of ``computeDistY``/``computeDistZ``
    (``CoarseArray.cu:79-152``); out-of-bounds neighbours are skipped via
    +inf padding, and the result truncates to integer cells like the
    reference's uint8 cast.
    """
    sq = prev_dist.astype(_I32)
    sq = sq * sq

    pad_widths = [(0, 0)] * sq.ndim
    pad_widths[axis] = (cap, cap)
    inf = _I32(2 * cap * cap + 1)  # larger than any reachable candidate
    padded = jnp.pad(sq, pad_widths, constant_values=inf)

    n = sq.shape[axis]

    def body(off, best):
        # neighbours at +-off: static-size slices of the padded volume.
        off2 = off * off
        lo = jax.lax.dynamic_slice_in_dim(padded, cap - off, n, axis=axis)
        hi = jax.lax.dynamic_slice_in_dim(padded, cap + off, n, axis=axis)
        cand = jnp.minimum(lo, hi) + off2
        return jnp.minimum(best, cand)

    best = jax.lax.fori_loop(1, cap + 1, body, sq)
    # floor(sqrt(n)) with integer correction: hardware sqrt may be an
    # approximation (e.g. x * rsqrt(x) fast paths), so fix up +-1 exactly.
    dist = jnp.sqrt(best.astype(jnp.float32)).astype(_I32)
    dist = jnp.where(dist * dist > best, dist - 1, dist)
    dist = jnp.where((dist + 1) * (dist + 1) <= best, dist + 1, dist)
    return jnp.minimum(dist, _I32(cap)).astype(jnp.uint8)


def build_sdf(coarse_solid: jax.Array, cfg: WorldConfig,
              use_pallas: bool | None = None) -> jax.Array:
    """(SZ, SY, SX) bool coarse occupancy -> (SZ*SY*SX,) flat uint8 SDF.

    Pipeline mirror of ``CoarseArray::GenerateSDF`` (``CoarseArray.cu:
    173-208``): X scan -> XY min-conv -> XYZ min-conv, uint8 truncation
    between passes.  On TPU the min-conv passes run as a Pallas VMEM kernel
    (ops/sdf_kernels.py) - identical results, far cheaper compile and one
    HBM round-trip per pass; the jnp fallback serves CPU tests.
    """
    cap = cfg.sdf_max_dist
    if use_pallas is None:
        # needs a TPU backend and >= one full 128-lane row per block.
        # Default OFF even on TPU (RVGRT_SDF_PALLAS=1 opts in): the
        # Mosaic kernel costs ~23 s of compile per pass per process (and
        # even a persistent-cache HIT loads ~10 s through the tunnel) vs
        # 1.2 s for the jnp twin, while both RUN in well under a second
        # at 1024^3 - the kernel pays off only for long-lived processes
        # that rebuild worlds repeatedly (compile census, PERF.md r4).
        import os
        on_tpu = (jax.default_backend() not in ("cpu",)
                  and cfg.sdf_size_x >= 128)
        # big grids NEED the kernel regardless: the jnp pass materializes
        # i32 temps ~16x the u8 volume - 16+ GB at the reference world's
        # 2048x256x2048 coarse grid (measured HBM OOM: 24.01G of 15.75G),
        # while the Pallas pass streams blocks through VMEM
        big = cfg.sdf_num_cells > (1 << 28)
        use_pallas = on_tpu and (
            big or os.environ.get("RVGRT_SDF_PALLAS", "0") == "1")
    # axis order in the array is (z, y, x)
    dist_x = _axis_distance_1d(coarse_solid, axis=2, cap=cap)
    if use_pallas:
        from rvgrt_tpu.ops.sdf_kernels import minconv_pass_pallas
        dist_xy = minconv_pass_pallas(dist_x, axis=1, cap=cap)
        dist_xyz = minconv_pass_pallas(dist_xy, axis=0, cap=cap)
    else:
        dist_xy = _minconv_pass(dist_x, axis=1, cap=cap)
        dist_xyz = _minconv_pass(dist_xy, axis=0, cap=cap)
    return dist_xyz.astype(jnp.uint8).reshape(-1)


def extend_sdf_far(sdf: jax.Array, coarse_solid: jax.Array,
                   cfg: WorldConfig) -> jax.Array:
    """Inflate far-field SDF values from a coarser mip (TPU addition).

    The reference caps its SDF at ``SDF_MAX_DIST`` = 64 coarse cells
    (``CoarseArray.cuh:14``), so the tracer's empty-space jumps top out at
    128 fine voxels even when the nearest geometry is a thousand voxels
    away - the #1 lane-step cost for sky/sun/far rays at 1024^3+.  The
    uint8 storage runs to 255: this computes a second distance transform
    over ``sdf_far_level``-voxel blocks (cheap: that grid is
    (level/coarseness)^3 smaller than the SDF), converts each far value
    into the largest table value that stays conservative under BOTH tracer
    uses of an SDF sample, and maxes it into the base field.  Far values
    then saturate the byte at 255 (510-voxel jumps at coarseness 2).

    Conservativeness: a mip value v at level F means the containing
    F-block's center is >= F*v fine voxels from the nearest solid F-block
    center; worst-case corner offsets (sqrt(3)/2 * F on each side) leave
    every point p of the block with clearance(p) >= F*(v - sqrt(3)).  The
    largest displacement the tracer derives from a table value d is
    d*coarseness + 1 (the every-8th-step probe jump, which re-centers on
    the cell center first: wavefront.py jump_len; the sphere step d is
    half that).  So d' = floor((F*(v - 1.75) - 1) / coarseness) never
    oversteps.  Rendered images are identical to the base SDF by
    construction; only ``its``/superstep counts shrink (both properties
    are gated in tests/test_world.py + tests/test_trace.py).
    """
    F = cfg.sdf_far_level
    c = cfg.sdf_coarseness
    if not F or F <= c:
        return sdf
    f = F // c
    # OR-reduce f^3 blocks via strided slices, axis by axis - NOT an
    # interior (..., f, ..., f) reshape: size-f minor dims pad to the
    # (8, 128) TPU tile, a 32x blowup that OOMs at the 2048^3 world
    # (pred[256,4,256,4,256,4] = 34 GB requested on a 16 GB chip)
    occ = coarse_solid
    for axis in (0, 1, 2):
        acc = None
        for k in range(f):
            sl = [slice(None)] * 3
            sl[axis] = slice(k, None, f)
            part = occ[tuple(sl)]
            acc = part if acc is None else (acc | part)
        occ = acc
    # values saturating d' at 255 need v <= (255*c + 1)/F + 2.75; a tight
    # cap keeps the min-conv window small
    cap = min(255, (255 * c + 1) // F + 3)
    dist_x = _axis_distance_1d(occ, axis=2, cap=cap)
    dist_xy = _minconv_pass(dist_x, axis=1, cap=cap)
    v = _minconv_pass(dist_xy, axis=0, cap=cap).astype(_I32)
    # integer form of floor((F*(v - 1.75) - 1) / c)
    dp = jnp.clip((F * (4 * v - 7) - 4) // (4 * c), 0, 255)
    dp = jnp.repeat(jnp.repeat(dp.astype(jnp.uint8), f, 0), f, 1)
    # the x (minor-axis) expansion via transpose so the repeat runs on a
    # MAJOR axis: repeating the minor dim broadcasts through a
    # tile-padded (..., n, f) intermediate (u8[1024,1024,256,4] = 34 GB
    # requested at the 2048^3 world)
    dp = jnp.repeat(dp.transpose(2, 0, 1), f, axis=0).transpose(1, 2, 0)
    return jnp.maximum(sdf, dp.reshape(-1))


def sample_sdf_at_voxel(sdf: jax.Array, cfg: WorldConfig, vx, vy, vz):
    """Gather SDF (coarse cells) at *fine* integer voxel coords.

    Equivalent of ``getDistance`` (``raytracing_functions.cuh:35-67``):
    coarse index = voxel // coarseness, clamped into the grid.  Returns
    int32 distances.
    """
    c = cfg.sdf_coarseness
    cx = jnp.clip(jnp.asarray(vx, _I32) // c, 0, cfg.sdf_size_x - 1)
    cy = jnp.clip(jnp.asarray(vy, _I32) // c, 0, cfg.sdf_size_y - 1)
    cz = jnp.clip(jnp.asarray(vz, _I32) // c, 0, cfg.sdf_size_z - 1)
    cidx = (cz * (cfg.sdf_size_x * cfg.sdf_size_y)
            + cy * cfg.sdf_size_x + cx)
    # Final clamp with constant bounds right before the gather: lets XLA
    # prove indices in-bounds (AssumeGatherIndicesInBound) and use the fast
    # TPU gather - ~100x faster than the bounds-checked fallback.
    cidx = jnp.clip(cidx, 0, cfg.sdf_num_cells - 1)
    return jnp.take(sdf, cidx, mode="clip").astype(_I32)
