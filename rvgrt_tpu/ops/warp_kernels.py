"""Pallas TPU kernel for the temporal-upscale history warp.

The accumulator's reprojection is ONE display-res gather from the packed
RGBN history (``temporal._warp_state``), and that gather is the whole cost
of the upscale stage: XLA lowers it to ~13 ns/element HBM loads - 126 ms
of the 135 ms step at 3840x2400 (PERF.md round-2 breakdown).  Mosaic
cannot lower arbitrary gathers either (round-3 census, probe_r7) - but
this gather is NOT arbitrary: the motion field is nearest-upsampled from
low res and piecewise smooth, so each (8, 128) output tile reads a small,
contiguous window of the history.  The kernel:

  1. precomputes per-tile window origins on the XLA side (block-min of
     the source coordinates - dense VPU work) and hands them to the
     kernel via scalar prefetch;
  2. DMAs each tile's (WR, WC) window HBM -> VMEM, double-buffered across
     grid steps;
  3. resolves the per-lane taps with native in-register lane shuffles
     (``take_along_axis`` on the 128-lane axis - the one dynamic-gather
     shape Mosaic lowers) masked over the WR window rows;
  4. emits the TRUE 4-tap bilinear warp (the XLA default is the cheaper
     ``bilinear_shift`` approximation, 120 dB from this) as channel-first
     f32 planes plus a per-tile out-of-window counter.

Lanes whose source lies outside the window (extreme motion-field
discontinuity inside one tile) clamp to the window edge and are counted
in the overflow output - the bench surfaces the count (expected 0: the
margins cover the rotation + parallax ranges of the camera model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

R = 8      # output tile rows
C = 128    # output tile lanes (one vreg span)
# Window origins must be (8, 128)-tile-aligned (the HBM memref is tiled, a
# DMA slice at an unaligned row fails to lower), so the window carries up
# to (7, 127) of alignment waste on top of the tile span + motion range.
WR = 40    # window rows
WC = 384   # window lanes


def _unpack4(word):
    """u32 RGBN -> 4 f32 planes (r, g, b in [0,1], n in [0,1]-of-max).

    Byte extraction goes through i32: Mosaic has no u32 -> f32 cast, and
    every masked byte fits i32 exactly."""
    f = _F32(1.0 / 255.0)
    return (((word & 0xFF).astype(_I32)).astype(_F32) * f,
            (((word >> 8) & 0xFF).astype(_I32)).astype(_F32) * f,
            (((word >> 16) & 0xFF).astype(_I32)).astype(_F32) * f,
            (((word >> 24) & 0xFF).astype(_I32)).astype(_F32) * f)


def _warp_kernel(ntx: int, hh: int, hw: int,
                 base_y_ref, base_x_ref, xs_ref, ys_ref, packed_ref,
                 out_ref, win, sems):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    def dma(slot, tt):
        by = pl.multiple_of(base_y_ref[tt], 8)
        bx = pl.multiple_of(base_x_ref[tt], 128)
        return pltpu.make_async_copy(
            packed_ref.at[pl.ds(by, WR), pl.ds(bx, WC)],
            win.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()

    xs = xs_ref[...]
    ys = ys_ref[...]
    x0 = jnp.floor(xs).astype(_I32)
    y0 = jnp.floor(ys).astype(_I32)
    fx = xs - x0.astype(_F32)
    fy = ys - y0.astype(_F32)
    # clamp the +1 taps exactly like the XLA bilinear path (min(x0+1, hw-1))
    lx = x0 - base_x_ref[t]
    ly = y0 - base_y_ref[t]
    lx1 = jnp.minimum(x0 + 1, hw - 1) - base_x_ref[t]
    ly1 = jnp.minimum(y0 + 1, hh - 1) - base_y_ref[t]
    ovf = ((lx < 0) | (lx1 > WC - 1) | (ly < 0) | (ly1 > WR - 1))
    lx = jnp.clip(lx, 0, WC - 1)
    lx1 = jnp.clip(lx1, 0, WC - 1)
    ly = jnp.clip(ly, 0, WR - 1)
    ly1 = jnp.clip(ly1, 0, WR - 1)

    # Resolve win[ly, lx] with (8, 128)-shaped native ops only (Mosaic
    # rejects (1, 128) -> (8, 128) broadcasts): for each 8-row window
    # block and each sublane rotation d, the lane shuffle reads
    # win[8*wb + rot_d(r), lx[r, c]]; masking on ly == that row covers
    # every (output row, window row) pair across the d loop.
    slot = t % 2
    zero = jnp.zeros((R, C), _U32)
    v00 = zero
    v01 = zero
    v10 = zero
    v11 = zero
    r_iota = jax.lax.broadcasted_iota(_I32, (R, C), 0)
    for ch in range(WC // 128):
        ia = jnp.clip(lx - 128 * ch, 0, 127)
        ib = jnp.clip(lx1 - 128 * ch, 0, 127)
        ca = (lx >= 128 * ch) & (lx < 128 * (ch + 1))
        cb = (lx1 >= 128 * ch) & (lx1 < 128 * (ch + 1))
        for wb in range(WR // 8):
            blk = win[slot, 8 * wb:8 * wb + 8, 128 * ch:128 * (ch + 1)]
            for d in range(8):
                rolled = pltpu.roll(blk, d, axis=0) if d else blk
                a = jnp.take_along_axis(rolled, ia, axis=1)
                b = jnp.take_along_axis(rolled, ib, axis=1)
                row = 8 * wb + ((r_iota - d) % 8)
                m0 = ly == row
                m1 = ly1 == row
                v00 = jnp.where(m0 & ca, a, v00)
                v10 = jnp.where(m1 & ca, a, v10)
                v01 = jnp.where(m0 & cb, b, v01)
                v11 = jnp.where(m1 & cb, b, v11)

    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    for k in range(4):
        p00 = _unpack4(v00)[k]
        p01 = _unpack4(v01)[k]
        p10 = _unpack4(v10)[k]
        p11 = _unpack4(v11)[k]
        out_ref[k] = w00 * p00 + w01 * p01 + w10 * p10 + w11 * p11
    # plane 4: out-of-window mask (summed by the caller - SMEM scalar
    # outputs need (8,128)-divisible blocks, a 5th f32 plane does not)
    out_ref[4] = ovf.astype(_F32)


def warp_packed_bilinear(packed: jax.Array, xs: jax.Array, ys: jax.Array,
                         interpret: bool | None = None):
    """TRUE 4-tap bilinear gather of the packed RGBN history.

    ``packed``: (H, W) uint32; ``xs``/``ys``: (OH, W) f32 source coords,
    already clipped into [0, W-1] / [0, H-1] (``temporal._warp_state``
    convention).  The OUTPUT grid comes from ``xs``/``ys`` - OH may be a
    row slab of the display (the sharded path,
    ``temporal.temporal_upscale_slab``) while the window DMAs still read
    the full ``packed`` history.  Returns ``(planes, overflow)``:
    (4, OH, W) f32 [r, g, b, n/255-of-max] and the i32 count of
    out-of-window lanes.  Requires OH % 8 == 0 and W % 128 == 0.
    """
    hh, hw = packed.shape
    oh, ow = xs.shape
    assert ow == hw and ys.shape == (oh, ow), (packed.shape, xs.shape,
                                               ys.shape)
    assert oh % R == 0 and hw % C == 0 and hh % R == 0, (oh, hh, hw)
    nty, ntx = oh // R, ow // C
    nt = nty * ntx
    if interpret is None:
        # Mosaic lowering is TPU-only; everywhere else (the CPU test
        # mesh) run the kernel in interpret mode so the SAME code path is
        # gated on CPU (tests/test_warp_kernel.py, test_sharding.py)
        interpret = jax.default_backend() != "tpu"

    # per-tile window origins (block min of the floor'd coords), clipped
    # so the fixed-size window stays in bounds
    y0 = jnp.floor(ys).astype(_I32)
    x0 = jnp.floor(xs).astype(_I32)
    by = y0.reshape(nty, R, ntx, C).min(axis=(1, 3))
    bx = x0.reshape(nty, R, ntx, C).min(axis=(1, 3))
    # tile-align down (DMA slice constraint), clip so the window fits
    by = jnp.clip((by // 8) * 8, 0, max(hh - WR, 0)).reshape(-1)
    bx = jnp.clip((bx // 128) * 128, 0, max(hw - WC, 0)).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((R, C), lambda t, *_: (t // ntx, t % ntx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda t, *_: (t // ntx, t % ntx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((5, R, C),
                               lambda t, *_: (0, t // ntx, t % ntx),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WR, WC), _U32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    planes = pl.pallas_call(
        functools.partial(_warp_kernel, ntx, hh, hw),
        out_shape=jax.ShapeDtypeStruct((5, oh, ow), _F32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(by, bx, xs, ys, packed)
    return planes[:4], jnp.sum(planes[4]).astype(_I32)


def warp_packed_bilinear_xla(packed: jax.Array, xs: jax.Array,
                             ys: jax.Array):
    """Reference XLA implementation (exact 4-tap bilinear gather) - the
    CPU/test fallback and the oracle the kernel is gated against."""
    hh, hw = packed.shape
    x0 = jnp.floor(xs).astype(_I32)
    y0 = jnp.floor(ys).astype(_I32)
    x1 = jnp.minimum(x0 + 1, hw - 1)
    y1 = jnp.minimum(y0 + 1, hh - 1)
    fx = (xs - x0)[None]
    fy = (ys - y0)[None]
    p00 = jnp.stack(_unpack4(packed[y0, x0]))
    p01 = jnp.stack(_unpack4(packed[y0, x1]))
    p10 = jnp.stack(_unpack4(packed[y1, x0]))
    p11 = jnp.stack(_unpack4(packed[y1, x1]))
    out = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
           + p10 * (1 - fx) * fy + p11 * fx * fy)
    return out, jnp.zeros((), _I32)
