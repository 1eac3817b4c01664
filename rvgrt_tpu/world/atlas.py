"""Texture atlas: 256x256 RGBA of 16x16-pixel tiles + procedural block IDs.

Replaces the reference's ``Texturepack`` (embedded PNG -> CUDA texture object,
``Texturepack.cu:20-120``) and the per-voxel procedural block-ID selection in
``sampleTexture`` (``raytracing_functions.cu:28-62``): two blended simplex3D
fields thresholded into 8 Minecraft-ish tiles, point-sampled with the
reference's (v, u) coordinate swap.

We do not ship the reference's PNG asset; ``procedural_atlas()`` synthesizes a
deterministic look-alike atlas (per-tile base colors + hash noise) with the
same tile layout, and ``load_png`` accepts a user-supplied texture pack.  On
TPU the atlas is a (256*256,) packed-uint32 array so a texel fetch is one
gather + shift-unpack, like the GI grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rvgrt_tpu.core import noise
from rvgrt_tpu.world.gi_grid import pack_rgba8, unpack_rgba8

_F32 = jnp.float32
_I32 = jnp.int32

ATLAS_SIZE = 256
TILE = 16

# Tile coordinates (u, v) in units of 1/16, matching sampleTexture's IDs
# (raytracing_functions.cu:30-37).
TILE_STONE = (0, 1)
TILE_DIRT = (0, 2)
TILE_COBBLE = (1, 0)
TILE_IRON = (2, 1)
TILE_DIAMOND = (3, 2)
TILE_STONE2 = (0, 0)
TILE_SANDSTONE = (11, 0)
TILE_COAL = (2, 2)

# Base colors for the procedural look-alike tiles (RGB in [0,1]).
_TILE_COLORS = {
    TILE_STONE: (0.48, 0.48, 0.48),
    TILE_DIRT: (0.55, 0.39, 0.27),
    TILE_COBBLE: (0.42, 0.42, 0.44),
    TILE_IRON: (0.56, 0.50, 0.44),
    TILE_DIAMOND: (0.45, 0.70, 0.72),
    TILE_STONE2: (0.52, 0.52, 0.50),
    TILE_SANDSTONE: (0.76, 0.70, 0.50),
    TILE_COAL: (0.33, 0.33, 0.33),
}


def _hash2_np(xi, yi):
    """numpy twin of ``noise.hash2`` (bit-identical uint32 wraparound).

    The atlas is a host-side build artifact; running the jnp hash eagerly
    dispatches every tiny op through the device tunnel (measured 400 s of
    the 1024^3 world build) - numpy does the same math in microseconds.
    """
    key = xi.astype(np.uint32) * np.uint32(73856093)
    key ^= yi.astype(np.uint32) * np.uint32(19349663)
    key = (key ^ np.uint32(61)) ^ (key >> np.uint32(16))
    key = key * np.uint32(9)
    key ^= key >> np.uint32(4)
    key = key * np.uint32(0x27D4EB2D)
    key ^= key >> np.uint32(15)
    return key


def procedural_atlas() -> jax.Array:
    """Deterministic 256x256 atlas -> flat (256*256,) uint32 RGBA words."""
    img = np.full((ATLAS_SIZE, ATLAS_SIZE, 3), 0.5, np.float32)
    yy, xx = np.meshgrid(np.arange(TILE), np.arange(TILE), indexing="ij")
    for (tu, tv), base in _TILE_COLORS.items():
        # hash-noise texture per tile, deterministic
        h = _hash2_np(xx + tu * 131, yy + tv * 173)
        n = (h.astype(np.float64) / 2**32).astype(np.float32)  # [0,1)
        shade = 0.78 + 0.44 * n  # +-22% brightness speckle
        tile = np.stack([base[0] * shade, base[1] * shade, base[2] * shade],
                        axis=-1)
        # NOTE: atlas rows are the *u* axis here (see sample_atlas): texel
        # (u_px, v_px) lives at img[u_px, v_px].
        u0, v0 = tu * TILE, tv * TILE
        img[u0:u0 + TILE, v0:v0 + TILE] = np.clip(tile, 0.0, 1.0)
    flat = img.reshape(-1, 3)
    return pack_rgba8(jnp.asarray(flat[:, 0]), jnp.asarray(flat[:, 1]),
                      jnp.asarray(flat[:, 2]))


# The reference's actual texture pack (embedded into the CUDA binary by
# embed.py:1-24; sampled at raytracing_functions.cu:55-61).  When the
# reference checkout is present we load the real asset so rendered frames
# match its appearance; the procedural look-alike is the fallback.
REFERENCE_PNG = "/root/reference/resources/texturepack.png"


def default_atlas() -> jax.Array:
    """The reference texturepack.png when available, else the procedural
    look-alike (both deterministic)."""
    import os

    if os.path.exists(REFERENCE_PNG):
        try:
            return load_png(REFERENCE_PNG)
        except Exception:
            pass
    return procedural_atlas()


def load_png(path: str) -> jax.Array:
    """Load a 256x256 RGBA texture pack from disk (host-side, PIL)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    assert img.shape[:2] == (ATLAS_SIZE, ATLAS_SIZE), img.shape
    # Stored transposed so that sample_atlas's (u, v) indexing matches the
    # reference's swapped tex2D(texObj, uv.y, uv.x) lookup.
    img = np.transpose(img, (1, 0, 2)).reshape(-1, 3)
    return pack_rgba8(jnp.asarray(img[:, 0]), jnp.asarray(img[:, 1]),
                      jnp.asarray(img[:, 2]))


def select_tile(px, py, pz):
    """Procedural block ID from two blended simplex3D fields
    (``raytracing_functions.cu:41-54``).  Returns (tile_u, tile_v) floats in
    units of 1/16 of the atlas.
    """
    freq = _F32(0.05)
    fx = jnp.floor(jnp.asarray(px, _F32))
    fy = jnp.floor(jnp.asarray(py, _F32))
    fz = jnp.floor(jnp.asarray(pz, _F32))
    e1 = noise.simplex3d(fx * freq, fy * freq, fz * freq)
    e2 = noise.simplex3d(jnp.floor(px + _F32(121.3)) * freq * _F32(0.3),
                         jnp.floor(py + _F32(1321.3)) * freq * _F32(0.3),
                         jnp.floor(pz + _F32(721.5)) * freq * _F32(0.3))
    ev = e1 * _F32(0.4) + e2 * _F32(0.6)

    # Threshold ladder (first match wins), default stone.
    tiles = [
        (-1.3, TILE_STONE), (-1.2, TILE_DIAMOND), (-0.7, TILE_IRON),
        (0.0, TILE_STONE), (0.1, TILE_COAL), (0.4, TILE_COBBLE),
        (0.8, TILE_DIRT), (1.2, TILE_STONE2),
    ]
    tu = jnp.full_like(ev, TILE_STONE[0], dtype=_F32)
    tv = jnp.full_like(ev, TILE_STONE[1], dtype=_F32)
    # Build from the last threshold down so the first (smallest) match wins.
    for thresh, (u, v) in reversed(tiles):
        sel = ev < _F32(thresh)
        tu = jnp.where(sel, _F32(u), tu)
        tv = jnp.where(sel, _F32(v), tv)
    return tu / _F32(16.0), tv / _F32(16.0)


def sample_atlas(atlas: jax.Array, u, v):
    """Point-sample the atlas at normalized (u, v) with wrap addressing.

    The reference samples ``tex2D<float4>(texObj, uv.y, uv.x)`` - coordinates
    swapped - with point filtering and wrap mode (``Texturepack.cu``,
    ``raytracing_functions.cu:59``).  Our atlas array is stored transposed,
    so indexing rows by u and columns by v reproduces the swap.
    """
    up = (jnp.asarray(u, _F32) * ATLAS_SIZE).astype(_I32) & (ATLAS_SIZE - 1)
    vp = (jnp.asarray(v, _F32) * ATLAS_SIZE).astype(_I32) & (ATLAS_SIZE - 1)
    # constant-bound clamp right before the gather -> fast TPU gather path
    idx = jnp.clip(up * ATLAS_SIZE + vp, 0, ATLAS_SIZE * ATLAS_SIZE - 1)
    words = jnp.take(atlas, idx, mode="clip")
    r, g, b, _ = unpack_rgba8(words)
    return r, g, b


def sample_texture(atlas: jax.Array, uv_u, uv_v, px, py, pz):
    """Full sampleTexture: block-ID select + face-UV -> atlas texel
    (``raytracing_functions.cu:28-62``).  ``uv_u/uv_v`` are the in-face UVs
    from the tracer's hit payload."""
    tu, tv = select_tile(px, py, pz)
    u = jnp.asarray(uv_u, _F32) * _F32(1.0 / 16.0) + tu
    v = jnp.asarray(uv_v, _F32) * _F32(1.0 / 16.0) + tv
    return sample_atlas(atlas, u, v)
