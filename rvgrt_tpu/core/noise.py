"""Vectorized simplex noise / fBm, bit-compatible with the reference.

The reference's device noise library (``include/TerrainGeneration.cuh``):
spatial hash = 3 large primes XOR-folded + Thomas Wang mix (lines 25-62),
gradients computed from the hash instead of a table (lines 65-79, 161-175),
optimized simplex2D/3D (lines 81-142, 178-254) and fbm2D/3D (lines 259-280).

These functions define the world, so they must be *bit-stable*: everything is
float32 / uint32, integer multiplication wraps mod 2^32 (well-defined in XLA),
and operation order matches the scalar code exactly.  All functions broadcast
over arbitrary-shaped jnp arrays - on TPU they compile to pure VPU code with
no gathers (the gradient "table" is arithmetic on hash bits).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_F32 = jnp.float32

# Simplex skew constants.
_F2 = (3.0 ** 0.5 - 1.0) * 0.5
_G2 = (3.0 - 3.0 ** 0.5) * 0.5
_F3 = 1.0 / 3.0
_G3 = 1.0 / 6.0


def _u32(x):
    return x.astype(_U32) if hasattr(x, "astype") else jnp.asarray(x, _U32)


def _wang_mix(key):
    """Thomas Wang 32-bit integer finalizer (TerrainGeneration.cuh:37-42)."""
    key = (key ^ _U32(61)) ^ (key >> 16)
    key = key * _U32(9)
    key = key ^ (key >> 4)
    key = key * _U32(0x27D4EB2D)
    key = key ^ (key >> 15)
    return key


def hash3(xi, yi, zi):
    """Spatial hash of 3 int32 lattice coords -> uint32."""
    key = _u32(xi) * _U32(73856093)
    key = key ^ (_u32(yi) * _U32(19349663))
    key = key ^ (_u32(zi) * _U32(83492791))
    return _wang_mix(key)


def hash2(xi, yi):
    key = _u32(xi) * _U32(73856093)
    key = key ^ (_u32(yi) * _U32(19349663))
    return _wang_mix(key)


def _grad2(h):
    """12-gradient-free 2D gradient from hash (TerrainGeneration.cuh:65-79)."""
    h = h & _U32(7)
    gx = jnp.where((h & _U32(1)) != 0, _F32(1.0), _F32(-1.0))
    gy = jnp.where((h & _U32(2)) != 0, _F32(1.0), _F32(-1.0))
    small = h < _U32(4)
    gx = jnp.where(small, gx, _F32(0.0))
    gy = jnp.where(small, _F32(0.0), gy)
    return gx, gy


def _grad3(h):
    """16-case 3D gradient from hash bits (TerrainGeneration.cuh:161-175)."""
    h = h & _U32(15)
    gx = jnp.where((h & _U32(1)) != 0, _F32(1.0), _F32(-1.0))
    gy = jnp.where((h & _U32(2)) != 0, _F32(1.0), _F32(-1.0))
    gz = jnp.where((h & _U32(4)) != 0, _F32(1.0), _F32(-1.0))
    gz = jnp.where(h < _U32(8), _F32(0.0), gz)
    gx = jnp.where((h >= _U32(8)) & (h < _U32(12)), _F32(0.0), gx)
    gy = jnp.where(h >= _U32(12), _F32(0.0), gy)
    return gx, gy, gz


def _falloff(t, gdot):
    """n = max(0, t)^4-ish contribution: t = r2 - d2; squared twice."""
    t = jnp.maximum(_F32(0.0), t)
    t = t * t
    return t * t * gdot


def simplex2d(px, py):
    """2D simplex noise, approx [-1, 1] (TerrainGeneration.cuh:81-142)."""
    px = jnp.asarray(px, _F32)
    py = jnp.asarray(py, _F32)

    s = (px + py) * _F32(_F2)
    i = jnp.floor(px + s).astype(jnp.int32)
    j = jnp.floor(py + s).astype(jnp.int32)

    t = (i + j).astype(_F32) * _F32(_G2)
    x0 = px - i.astype(_F32) + t
    y0 = py - j.astype(_F32) + t

    gtr = x0 > y0  # pick second simplex vertex
    i1 = jnp.where(gtr, 1, 0).astype(jnp.int32)
    j1 = jnp.where(gtr, 0, 1).astype(jnp.int32)

    x1 = x0 - i1.astype(_F32) + _F32(_G2)
    y1 = y0 - j1.astype(_F32) + _F32(_G2)
    x2 = x0 - _F32(1.0) + _F32(2.0 * _G2)
    y2 = y0 - _F32(1.0) + _F32(2.0 * _G2)

    g0x, g0y = _grad2(hash2(i, j))
    g1x, g1y = _grad2(hash2(i + i1, j + j1))
    g2x, g2y = _grad2(hash2(i + 1, j + 1))

    n0 = _falloff(_F32(0.5) - x0 * x0 - y0 * y0, g0x * x0 + g0y * y0)
    n1 = _falloff(_F32(0.5) - x1 * x1 - y1 * y1, g1x * x1 + g1y * y1)
    n2 = _falloff(_F32(0.5) - x2 * x2 - y2 * y2, g2x * x2 + g2y * y2)

    return _F32(70.0) * (n0 + n1 + n2)


def simplex3d(px, py, pz):
    """3D simplex noise with branchless corner selection
    (TerrainGeneration.cuh:178-254)."""
    px = jnp.asarray(px, _F32)
    py = jnp.asarray(py, _F32)
    pz = jnp.asarray(pz, _F32)

    s = (px + py + pz) * _F32(_F3)
    i = jnp.floor(px + s).astype(jnp.int32)
    j = jnp.floor(py + s).astype(jnp.int32)
    k = jnp.floor(pz + s).astype(jnp.int32)

    t = (i + j + k).astype(_F32) * _F32(_G3)
    x0 = px - (i.astype(_F32) - t)
    y0 = py - (j.astype(_F32) - t)
    z0 = pz - (k.astype(_F32) - t)

    c_xy = (x0 >= y0).astype(jnp.int32)
    c_xz = (x0 >= z0).astype(jnp.int32)
    c_yz = (y0 >= z0).astype(jnp.int32)

    i1 = c_xy & c_xz
    j1 = (1 - c_xy) & c_yz
    k1 = (1 - c_xz) & (1 - c_yz)

    i2 = 1 - ((1 - c_xy) & (1 - c_xz))  # 1 - x0_is_smallest
    j2 = 1 - (c_xy & (1 - c_yz))        # 1 - y0_is_smallest
    k2 = 1 - (c_xz & c_yz)              # 1 - z0_is_smallest

    x1 = x0 - i1.astype(_F32) + _F32(_G3)
    y1 = y0 - j1.astype(_F32) + _F32(_G3)
    z1 = z0 - k1.astype(_F32) + _F32(_G3)

    x2 = x0 - i2.astype(_F32) + _F32(2.0 * _G3)
    y2 = y0 - j2.astype(_F32) + _F32(2.0 * _G3)
    z2 = z0 - k2.astype(_F32) + _F32(2.0 * _G3)

    x3 = x0 - _F32(1.0) + _F32(3.0 * _G3)
    y3 = y0 - _F32(1.0) + _F32(3.0 * _G3)
    z3 = z0 - _F32(1.0) + _F32(3.0 * _G3)

    g0x, g0y, g0z = _grad3(hash3(i, j, k))
    g1x, g1y, g1z = _grad3(hash3(i + i1, j + j1, k + k1))
    g2x, g2y, g2z = _grad3(hash3(i + i2, j + j2, k + k2))
    g3x, g3y, g3z = _grad3(hash3(i + 1, j + 1, k + 1))

    n0 = _falloff(_F32(0.5) - x0 * x0 - y0 * y0 - z0 * z0,
                  g0x * x0 + g0y * y0 + g0z * z0)
    n1 = _falloff(_F32(0.5) - x1 * x1 - y1 * y1 - z1 * z1,
                  g1x * x1 + g1y * y1 + g1z * z1)
    n2 = _falloff(_F32(0.5) - x2 * x2 - y2 * y2 - z2 * z2,
                  g2x * x2 + g2y * y2 + g2z * z2)
    n3 = _falloff(_F32(0.5) - x3 * x3 - y3 * y3 - z3 * z3,
                  g3x * x3 + g3y * y3 + g3z * z3)

    return _F32(96.0) * (n0 + n1 + n2 + n3)


def fbm3d(x, y, z, octaves: int, frequency: float, lacunarity: float,
          persistence: float):
    """Fractional Brownian motion over simplex3d (TerrainGeneration.cuh:259-268).

    ``octaves`` is static (Python int): the loop unrolls under jit, each
    octave's frequency/amplitude computed in float32 like the scalar code.
    """
    total = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y),
                                           jnp.shape(z)), _F32)
    amplitude = _F32(1.0)
    freq = _F32(frequency)
    lac = _F32(lacunarity)
    pers = _F32(persistence)
    for _ in range(octaves):
        total = total + simplex3d(x * freq, y * freq, z * freq) * amplitude
        freq = freq * lac
        amplitude = amplitude * pers
    return total


def fbm2d(x, z, octaves: int, frequency: float, lacunarity: float,
          persistence: float):
    """2D fBm (TerrainGeneration.cuh:271-280)."""
    total = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(z)), _F32)
    amplitude = _F32(1.0)
    freq = _F32(frequency)
    lac = _F32(lacunarity)
    pers = _F32(persistence)
    for _ in range(octaves):
        total = total + simplex2d(x * freq, z * freq) * amplitude
        freq = freq * lac
        amplitude = amplitude * pers
    return total
