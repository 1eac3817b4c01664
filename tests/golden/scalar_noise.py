"""Independent scalar (pure-Python, float32-emulated) noise implementation.

This is the obviously-correct golden model the vectorized jnp noise is tested
against.  It follows the *published algorithm* (skew -> corner pick -> radial
falloff -> hash gradients) in plain Python, emulating float32 with
``np.float32`` at each step and uint32 with masking.

Mirrors /root/reference/include/TerrainGeneration.cuh semantics (hash
constants at :25-62, gradients :65-79/:161-175, simplex :81-142/:178-254,
fbm :259-280, Evaluate :284-356).
"""

from __future__ import annotations

import math

import numpy as np

F = np.float32
M32 = 0xFFFFFFFF


def hash3(xi: int, yi: int, zi: int) -> int:
    key = (xi & M32) * 73856093 & M32
    key ^= (yi & M32) * 19349663 & M32
    key ^= (zi & M32) * 83492791 & M32
    key &= M32
    key = ((key ^ 61) ^ (key >> 16)) & M32
    key = key * 9 & M32
    key = key ^ (key >> 4)
    key = key * 0x27D4EB2D & M32
    key = key ^ (key >> 15)
    return key & M32


def hash2(xi: int, yi: int) -> int:
    key = (xi & M32) * 73856093 & M32
    key ^= (yi & M32) * 19349663 & M32
    key &= M32
    key = ((key ^ 61) ^ (key >> 16)) & M32
    key = key * 9 & M32
    key = key ^ (key >> 4)
    key = key * 0x27D4EB2D & M32
    key = key ^ (key >> 15)
    return key & M32


def grad2(h: int):
    h &= 7
    x = 1.0 if (h & 1) else -1.0
    y = 1.0 if (h & 2) else -1.0
    if h < 4:
        y = 0.0
    else:
        x = 0.0
    return F(x), F(y)


def grad3(h: int):
    h &= 15
    x = 1.0 if (h & 1) else -1.0
    y = 1.0 if (h & 2) else -1.0
    z = 1.0 if (h & 4) else -1.0
    if h < 8:
        z = 0.0
    elif h < 12:
        x = 0.0
    else:
        y = 0.0
    return F(x), F(y), F(z)


def simplex2d(px: float, py: float) -> float:
    px, py = F(px), F(py)
    F2 = F((math.sqrt(3.0) - 1.0) * 0.5)
    G2 = F((3.0 - math.sqrt(3.0)) * 0.5)

    s = F((px + py) * F2)
    i = int(math.floor(F(px + s)))
    j = int(math.floor(F(py + s)))

    t = F(F(i + j) * G2)
    x0 = F(px - F(i) + t)
    y0 = F(py - F(j) + t)

    if x0 > y0:
        i1, j1 = 1, 0
    else:
        i1, j1 = 0, 1

    x1 = F(x0 - F(i1) + G2)
    y1 = F(y0 - F(j1) + G2)
    x2 = F(x0 - F(1.0) + F(2.0) * G2)
    y2 = F(y0 - F(1.0) + F(2.0) * G2)

    total = F(0.0)
    for (xx, yy, hi, hj) in ((x0, y0, i, j), (x1, y1, i + i1, j + j1),
                             (x2, y2, i + 1, j + 1)):
        gx, gy = grad2(hash2(hi, hj))
        t_ = F(F(0.5) - xx * xx - yy * yy)
        t_ = max(F(0.0), t_)
        t_ = F(t_ * t_)
        total = F(total + F(t_ * t_) * F(gx * xx + gy * yy))
    return float(F(F(70.0) * total))


def simplex3d(px: float, py: float, pz: float) -> float:
    px, py, pz = F(px), F(py), F(pz)
    F3 = F(1.0 / 3.0)
    G3 = F(1.0 / 6.0)

    s = F((px + py + pz) * F3)
    i = int(math.floor(F(px + s)))
    j = int(math.floor(F(py + s)))
    k = int(math.floor(F(pz + s)))

    t = F(F(i + j + k) * G3)
    x0 = F(px - F(F(i) - t))
    y0 = F(py - F(F(j) - t))
    z0 = F(pz - F(F(k) - t))

    c_xy = int(x0 >= y0)
    c_xz = int(x0 >= z0)
    c_yz = int(y0 >= z0)

    i1 = c_xy & c_xz
    j1 = (1 - c_xy) & c_yz
    k1 = (1 - c_xz) & (1 - c_yz)

    i2 = 1 - ((1 - c_xy) & (1 - c_xz))
    j2 = 1 - (c_xy & (1 - c_yz))
    k2 = 1 - (c_xz & c_yz)

    x1 = F(x0 - F(i1) + G3)
    y1 = F(y0 - F(j1) + G3)
    z1 = F(z0 - F(k1) + G3)
    x2 = F(x0 - F(i2) + F(2.0) * G3)
    y2 = F(y0 - F(j2) + F(2.0) * G3)
    z2 = F(z0 - F(k2) + F(2.0) * G3)
    x3 = F(x0 - F(1.0) + F(3.0) * G3)
    y3 = F(y0 - F(1.0) + F(3.0) * G3)
    z3 = F(z0 - F(1.0) + F(3.0) * G3)

    corners = (
        (x0, y0, z0, i, j, k),
        (x1, y1, z1, i + i1, j + j1, k + k1),
        (x2, y2, z2, i + i2, j + j2, k + k2),
        (x3, y3, z3, i + 1, j + 1, k + 1),
    )
    total = F(0.0)
    for (xx, yy, zz, hi, hj, hk) in corners:
        gx, gy, gz = grad3(hash3(hi, hj, hk))
        t_ = F(F(0.5) - xx * xx - yy * yy - zz * zz)
        t_ = max(F(0.0), t_)
        t_ = F(t_ * t_)
        total = F(total + F(t_ * t_) * F(gx * xx + gy * yy + gz * zz))
    return float(F(F(96.0) * total))


def fbm3d(x, y, z, octaves, frequency, lacunarity, persistence):
    total = F(0.0)
    amp = F(1.0)
    freq = F(frequency)
    for _ in range(octaves):
        total = F(total + F(simplex3d(F(x * freq), F(y * freq), F(z * freq))) * amp)
        freq = F(freq * F(lacunarity))
        amp = F(amp * F(persistence))
    return float(total)


def fbm2d(x, z, octaves, frequency, lacunarity, persistence):
    total = F(0.0)
    amp = F(1.0)
    freq = F(frequency)
    for _ in range(octaves):
        total = F(total + F(simplex2d(F(x * freq), F(z * freq))) * amp)
        freq = F(freq * F(lacunarity))
        amp = F(amp * F(persistence))
    return float(total)


def evaluate_density(x, y, z) -> float:
    """Scalar Evaluate (TerrainGeneration.cuh:284-356, header constants)."""
    if y <= 30.0:
        return 100.0
    biome = F((F(simplex2d(F(x * F(0.005)), F(z * F(0.005)))) + F(1.0)) * F(0.5))
    amp = F(F(60.0) + biome * F(400.0 - 60.0))
    density = F(F(10.0) - F(y))
    density = F(density + F(fbm3d(x, y, z, 7, 0.002, 2.1, 0.45)) * amp)
    if density > 0.0:
        cave_raw = F(fbm3d(F(x + F(123.456)), y, z, 3, 0.009, 2.1, 0.45))
        cave_norm = F((cave_raw + F(1.0)) * F(0.5))
        spaghetti = abs(cave_raw) < 0.025
        cavern_region = F((F(simplex3d(F(x * F(0.006)), F(y * F(0.006)),
                                       F(z * F(0.006)))) + F(1.0)) * F(0.5))
        cavern = (cavern_region > 0.65) and (cave_norm < 0.3)
        if spaghetti or cavern:
            density = F(density - F(2.0))
    return float(density)
