"""GI radiance grid: RGBA8 cells packed one-per-uint32 word.

The reference stores the progressively path-traced radiance cache as a
``uchar4`` grid at 4x world coarseness (``CoarseArray.cuh:16-21``).  Here each
cell is a single uint32 (R | G<<8 | B<<16 | A<<24) so a radiance lookup is ONE
gather word from HBM, unpacked with shifts on the VPU - the TPU-shaped
version of the uchar4 load.

Quantization semantics match the reference exactly: colors live in [0,1],
stored as ``trunc(min(c,1) * 255)`` (C float->uchar cast truncates,
``CoarseArray.cu:351-354``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import WorldConfig

_U32 = jnp.uint32
_F32 = jnp.float32


def pack_rgba8(r, g, b, a=None):
    """float [0,1] channels -> uint32 RGBA words (truncating quantize)."""
    def q(c):
        return (jnp.minimum(c, _F32(1.0)) * _F32(255.0)).astype(_U32)
    if a is None:
        aa = jnp.full_like(jnp.asarray(r, _F32), 1.0)
    else:
        aa = a
    return q(r) | (q(g) << 8) | (q(b) << 16) | (q(aa) << 24)


def unpack_rgba8(words):
    """uint32 RGBA words -> (r, g, b, a) float32 in [0,1]."""
    inv = _F32(1.0 / 255.0)
    r = (words & _U32(0xFF)).astype(_F32) * inv
    g = ((words >> 8) & _U32(0xFF)).astype(_F32) * inv
    b = ((words >> 16) & _U32(0xFF)).astype(_F32) * inv
    a = ((words >> 24) & _U32(0xFF)).astype(_F32) * inv
    return r, g, b, a


def cell_index(cfg: WorldConfig, gx, gy, gz):
    """Linear GI-cell index (z-major, x fastest) like the reference's
    ``gz*GX*GY + gy*GX + gx`` (``raytracing_functions.cu:254``)."""
    return (jnp.asarray(gz, jnp.int32) * (cfg.gi_size_x * cfg.gi_size_y)
            + jnp.asarray(gy, jnp.int32) * cfg.gi_size_x
            + jnp.asarray(gx, jnp.int32))


def sample_at_world(gi: jax.Array, cfg: WorldConfig, wx, wy, wz):
    """Gather radiance at world-space float positions.

    ``gx = floor(pos.x) / COARSENESSGI`` with bounds check
    (``raytracing_functions.cu:247-252``); out-of-bounds returns
    (0,0,0,0) contribution via a validity mask.
    Returns (r, g, b, a, in_bounds).
    """
    c = cfg.gi_coarseness
    gx = (jnp.floor(jnp.asarray(wx, _F32)).astype(jnp.int32)) // c
    gy = (jnp.floor(jnp.asarray(wy, _F32)).astype(jnp.int32)) // c
    gz = (jnp.floor(jnp.asarray(wz, _F32)).astype(jnp.int32)) // c
    ok = ((gx >= 0) & (gx < cfg.gi_size_x)
          & (gy >= 0) & (gy < cfg.gi_size_y)
          & (gz >= 0) & (gz < cfg.gi_size_z))
    idx = cell_index(cfg, jnp.clip(gx, 0, cfg.gi_size_x - 1),
                     jnp.clip(gy, 0, cfg.gi_size_y - 1),
                     jnp.clip(gz, 0, cfg.gi_size_z - 1))
    # constant-bound clamp right before the gather -> fast TPU gather path
    idx = jnp.clip(idx, 0, cfg.gi_num_cells - 1)
    words = jnp.take(gi, idx, mode="clip")
    r, g, b, a = unpack_rgba8(words)
    return r, g, b, a, ok


def build_occlusion(sdf: jax.Array, cfg: WorldConfig,
                    mode: str = "mean") -> jax.Array:
    """Cone-occlusion mip at GI resolution, pre-shifted into the alpha byte.

    Reduces the coarse-SDF cells covered by each GI cell (the reference
    point-samples the SDF at the cone position,
    ``raytracing_functions.cu:237-241``; the fused table quantizes that
    position to GI cells).  ``mode``: "mean" (best PSNR match to the point
    sample), "min" (conservative occlusion), "max".  Stored in SDF-cell
    units so ``occ * sdf_coarseness`` is fine-voxel scene distance.  Built
    once per world; OR'd with the radiance grid into the fused cone table.
    """
    r = cfg.gi_coarseness // cfg.sdf_coarseness
    vol = sdf.reshape(cfg.sdf_size_z, cfg.sdf_size_y, cfg.sdf_size_x)
    if r > 1:
        # reduce via r^3 strided slices, NOT a (..., r, ..., r, ..., r)
        # reshape: TPU tiles the two minor dims to (8, 128), so an interior
        # r=2 dim pads 64x and the 1024^3 build materializes a 34 GB temp
        acc = None
        for dz in range(r):
            for dy in range(r):
                for dx in range(r):
                    part = vol[dz::r, dy::r, dx::r]
                    if mode == "min":
                        acc = part if acc is None else jnp.minimum(acc, part)
                    elif mode == "max":
                        acc = part if acc is None else jnp.maximum(acc, part)
                    else:  # mean; sums fit uint16 (255 * r^3 <= 65535, r<=6)
                        p = part.astype(jnp.uint16)
                        acc = p if acc is None else acc + p
        if mode == "mean":
            acc = (acc // (r * r * r)).astype(sdf.dtype)
        vol = acc
    return vol.reshape(-1).astype(_U32) << 24


def make_cone_table(gi: jax.Array, occ: jax.Array) -> jax.Array:
    """Fused per-frame cone-march table: radiance RGB | occlusion byte.

    One uint32 gather per cone step yields both the radiance sample and the
    occlusion distance (the reference pays two loads per step,
    ``raytracing_functions.cu:237-248``).  The radiance alpha byte it
    replaces is constant 255 in every stored cell (``pack_rgba8`` default),
    so no information is lost.
    """
    return (gi & _U32(0x00FFFFFF)) | occ


def sample_cone_table(tbl: jax.Array, cfg: WorldConfig, wx, wy, wz):
    """Gather (r, g, b, scene_dist_fine, in_bounds) from the fused table."""
    c = cfg.gi_coarseness
    gx = (jnp.floor(jnp.asarray(wx, _F32)).astype(jnp.int32)) // c
    gy = (jnp.floor(jnp.asarray(wy, _F32)).astype(jnp.int32)) // c
    gz = (jnp.floor(jnp.asarray(wz, _F32)).astype(jnp.int32)) // c
    ok = ((gx >= 0) & (gx < cfg.gi_size_x)
          & (gy >= 0) & (gy < cfg.gi_size_y)
          & (gz >= 0) & (gz < cfg.gi_size_z))
    idx = cell_index(cfg, jnp.clip(gx, 0, cfg.gi_size_x - 1),
                     jnp.clip(gy, 0, cfg.gi_size_y - 1),
                     jnp.clip(gz, 0, cfg.gi_size_z - 1))
    idx = jnp.clip(idx, 0, cfg.gi_num_cells - 1)
    words = jnp.take(tbl, idx, mode="clip")
    inv = _F32(1.0 / 255.0)
    r = (words & _U32(0xFF)).astype(_F32) * inv
    g = ((words >> 8) & _U32(0xFF)).astype(_F32) * inv
    b = ((words >> 16) & _U32(0xFF)).astype(_F32) * inv
    dist = ((words >> 24) & _U32(0xFF)).astype(_F32) * _F32(cfg.sdf_coarseness)
    return r, g, b, dist, ok


def cell_world_centers(cfg: WorldConfig, idx):
    """World position of GI cell centers: (c + 0.5) * COARSENESSGI
    (``CoarseArray.cu:291-293``)."""
    gx = idx % cfg.gi_size_x
    gy = (idx // cfg.gi_size_x) % cfg.gi_size_y
    gz = idx // (cfg.gi_size_x * cfg.gi_size_y)
    s = _F32(cfg.gi_coarseness)
    return ((gx.astype(_F32) + 0.5) * s,
            (gy.astype(_F32) + 0.5) * s,
            (gz.astype(_F32) + 0.5) * s)


def zeros(cfg: WorldConfig) -> jax.Array:
    return jnp.zeros((cfg.gi_num_cells,), _U32)
