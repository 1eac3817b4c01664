"""Pallas TPU kernel for the SDF min-plus convolution pass.

The jnp fallback in world/sdf.py expresses the pass as a 64-iteration
``fori_loop`` of dynamic slices over the whole padded volume in HBM - XLA
compiles that correctly but slowly (minutes through the compile service) and
each iteration re-streams the volume from HBM.  This kernel instead brings
one z-slab (1, Y + 2*cap, X) into VMEM and does all 64 shifted mins on-chip:
one HBM read + one write per slab, compile measured in seconds.

The same kernel serves the Y pass and (via transpose) the Z pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32


def _minconv_kernel(cap: int, n: int, padded_ref, out_ref):
    """out[y] = min over off in [0, cap] of padded[y + cap +- off] + off^2.

    Statically unrolled over offsets: Mosaic handles static-offset vector
    loads robustly (dynamic-start loads of large vectors do not lower)."""
    acc = padded_ref[0, cap:cap + n, :]
    for off in range(1, cap + 1):
        lo = padded_ref[0, cap - off:cap - off + n, :]
        hi = padded_ref[0, cap + off:cap + off + n, :]
        acc = jnp.minimum(acc, jnp.minimum(lo, hi) + off * off)
    out_ref[0] = acc


def minconv_axis1(sq: jax.Array, cap: int) -> jax.Array:
    """min-plus conv along axis 1 of an int32 (Z, Y, X) volume (squared
    distances); returns the squared-min volume (not yet sqrt'ed)."""
    z, y, x = sq.shape
    inf = _I32(2 * cap * cap + 1)
    padded = jnp.pad(sq, ((0, 0), (cap, cap), (0, 0)), constant_values=inf)

    return pl.pallas_call(
        functools.partial(_minconv_kernel, cap, y),
        out_shape=jax.ShapeDtypeStruct((z, y, x), _I32),
        grid=(z,),
        in_specs=[pl.BlockSpec((1, y + 2 * cap, x), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, y, x), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(padded)


def _isqrt_trunc(best: jax.Array, cap: int) -> jax.Array:
    """floor(sqrt(n)) with integer fix-up (approximate-sqrt-safe)."""
    d = jnp.sqrt(best.astype(jnp.float32)).astype(_I32)
    d = jnp.where(d * d > best, d - 1, d)
    d = jnp.where((d + 1) * (d + 1) <= best, d + 1, d)
    return jnp.minimum(d, _I32(cap))


def minconv_pass_pallas(prev_dist: jax.Array, axis: int, cap: int) -> jax.Array:
    """Drop-in equivalent of world.sdf._minconv_pass using the VMEM kernel."""
    sq = prev_dist.astype(_I32)
    sq = sq * sq
    if axis == 1:
        best = minconv_axis1(sq, cap)
    elif axis == 0:
        best = minconv_axis1(sq.transpose(1, 0, 2), cap).transpose(1, 0, 2)
    else:
        raise ValueError(axis)
    return _isqrt_trunc(best, cap)
