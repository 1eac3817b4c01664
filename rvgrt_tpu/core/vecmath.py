"""Small vector-math helpers over "struct of arrays" float3s.

A float3 here is a tuple ``(x, y, z)`` of same-shaped jnp arrays - the
SoA layout the TPU VPU wants, replacing the reference's ``float3`` operator
set (``cumath.cuh:185-326``).  Matrices are plain ``(4, 4)`` float32 arrays in
glm column-major convention: ``m[col][row]``, multiplied like
``mat_mul_vec`` (``cumath.cuh:47-54``).
"""

from __future__ import annotations

import jax.numpy as jnp

_F32 = jnp.float32


def v3(x, y, z):
    return (jnp.asarray(x, _F32), jnp.asarray(y, _F32), jnp.asarray(z, _F32))


def splat(v, shape):
    return tuple(jnp.broadcast_to(jnp.asarray(c, _F32), shape) for c in v)


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def length(a):
    return jnp.sqrt(dot(a, a))


def normalize(a):
    inv = jnp.float32(1.0) / length(a)
    return scale(a, inv)


def lerp(a, b, t):
    return (a[0] + (b[0] - a[0]) * t,
            a[1] + (b[1] - a[1]) * t,
            a[2] + (b[2] - a[2]) * t)


def reflect(d, n):
    """r = d - 2*dot(d,n)*n (cumath.cuh reflect)."""
    k = jnp.float32(2.0) * dot(d, n)
    return sub(d, scale(n, k))


def clamp01(a):
    return tuple(jnp.clip(c, 0.0, 1.0) for c in a)


def where(mask, a, b):
    return (jnp.where(mask, a[0], b[0]),
            jnp.where(mask, a[1], b[1]),
            jnp.where(mask, a[2], b[2]))


def mat_mul_vec4(m, v4):
    """glm column-major m @ v: res_r = sum_c m[c][r] * v[c] (cumath.cuh:47-54).

    ``m`` is (4,4) with m[col, row]; ``v4`` a tuple of 4 arrays.
    Returns a tuple of 4 arrays.
    """
    return tuple(
        m[0, r] * v4[0] + m[1, r] * v4[1] + m[2, r] * v4[2] + m[3, r] * v4[3]
        for r in range(4)
    )
