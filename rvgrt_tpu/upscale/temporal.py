"""Temporal super-resolution accumulator: the analytic DLSS mechanism.

The reference's DLSS call (``main.cpp:178-191``) is, at its core, jittered
temporal supersampling: each frame the camera samples the scene at a known
sub-pixel offset (the 8-phase sequence, ``Character.cpp:9-15``), and an
accumulator integrates those samples into a higher-resolution history,
rejecting stale history with motion-vector reprojection + neighborhood
rectification.  This module implements that mechanism directly (no learned
weights) as the quality/perf baseline the learned net (``model.py``) must
beat - and as a production upscaler in its own right.

TPU shape of the algorithm (everything is dense VPU work + ONE gather):

* the renderer's low-res pixel ``i`` samples NDC ``i/w*2-1 + jitter``
  (``pipeline._ray_dirs``), so it lands at display coordinate
  ``SCALE*(i + j_px)`` with ``j_px = jitter_ndc * w/2`` - a UNIFORM offset
  per frame.  Jitter-aware 3x upsampling is therefore a per-phase
  separable convolution (9 fixed blends of shifted images), not a gather.
* history + per-pixel confidence are packed RGBN into one uint32/display
  pixel, so reprojection is a single gather (the packed-warp trick from
  ``model.warp_history``; gathers cost ~7.5 ns/element on v5e).  The
  default ``bilinear_shift`` warp takes its 3 neighbor taps as
  output-space shifts of that one gather - measured 120 dB vs the true
  4-tap bilinear warp on moving frames at 418 -> 172 ms (3840x2400, v5e).
* rectification = clamp to the 3x3 low-res neighborhood min/max
  (shift/min/max at low res, nearest-upsampled).
* blending is a running average: confidence ``n`` counts effective
  accumulated samples; the current frame enters with a weight peaked where
  its jittered sample actually landed (sub-pixel locality - this is what
  recovers real detail instead of averaging blur).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rvgrt_tpu.upscale import model as up_model

_F32 = jnp.float32
SCALE = up_model.SCALE


class TemporalState(NamedTuple):
    """Carried across frames; reset to zeros on camera cuts."""
    history: jnp.ndarray  # (SCALE*h, SCALE*w, 3) f32 in [0, 1]
    conf: jnp.ndarray     # (SCALE*h, SCALE*w) f32 effective sample count
    # previous LOW-res clip depth, for depth-based disocclusion rejection
    # (``depth_reject``); zeros-shaped (1, 1) sentinel when unused so the
    # pytree structure stays stable across both modes
    depth: jnp.ndarray = None  # (h, w) f32


def init_state(height: int, width: int,
               depth_reject: bool = False,
               scale: int = SCALE) -> TemporalState:
    """Zero state for a ``height x width`` LOW-res stream.

    ``scale=1`` turns the accumulator into native-resolution temporal
    reconstruction (TAA + checkerboard/quarter hole filling, no
    super-resolution) - the native-1080p rate-cut tier's fill mechanism.
    ``temporal_upscale`` infers the scale from the state shape."""
    return TemporalState(
        history=jnp.zeros((height * scale, width * scale, 3), _F32),
        conf=jnp.zeros((height * scale, width * scale), _F32),
        depth=(jnp.ones((height, width), _F32) if depth_reject
               else jnp.zeros((1, 1), _F32)))


def _shift_cf(img_cf: jnp.ndarray, m: int, axis: int) -> jnp.ndarray:
    """Edge-padded integer shift: out[..i..] = img[..i+m..] (clamped)."""
    if m == 0:
        return img_cf
    n = img_cf.shape[axis]
    pad = [(0, 0)] * img_cf.ndim
    pad[axis] = (0, m) if m > 0 else (-m, 0)
    padded = jnp.pad(img_cf, pad, mode="edge")
    start = m if m > 0 else 0
    return jax.lax.slice_in_dim(padded, start, start + n, axis=axis)


def _phase_filter_axis(img_cf: jnp.ndarray, j_px: jnp.ndarray, axis: int,
                       scale: int = SCALE):
    """Per-phase jitter-compensating linear resample along one axis.

    Display position ``scale*i + p`` reads the low-res signal at
    ``i + p/scale - j_px``; with ``o_p = p/scale - j_px`` in (-1, 2) the
    linear interpolation is ``sum_m hat(o_p - m) * img[i + m]`` over the
    static shifts m in {-1, 0, 1, 2} - branch-free in the traced ``j_px``.
    Returns ``scale`` arrays shaped like ``img_cf``.
    """
    shifted = [_shift_cf(img_cf, m, axis) for m in (-1, 0, 1, 2)]
    outs = []
    for p in range(scale):
        o = _F32(p) / _F32(scale) - j_px
        acc = None
        for m, sh in zip((-1, 0, 1, 2), shifted):
            w = jnp.clip(1.0 - jnp.abs(o - _F32(m)), 0.0, 1.0)
            term = w * sh
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


def jitter_upsample(color: jnp.ndarray, jitter_ndc: jnp.ndarray,
                    scale: int = SCALE):
    """(h, w, 3) low-res + its NDC jitter -> (3, scale*h, scale*w)
    channel-first display-res image, resampled so the KNOWN sub-pixel
    sample positions line up with the unjittered display grid.  At
    ``scale=1`` this is the TAA jitter-compensating resample."""
    h, w = color.shape[0], color.shape[1]
    jx = jitter_ndc[0] * _F32(0.5 * w)   # low-res px
    jy = jitter_ndc[1] * _F32(0.5 * h)
    cf = color.transpose(2, 0, 1)  # (3, h, w)
    # x axis: scale phase images (3, h, w) -> interleave -> (3, h, scale*w)
    xs = _phase_filter_axis(cf, jx, axis=2, scale=scale)
    row = up_model._interleave_last(xs, scale)
    # y axis on the transposed image
    rowT = row.transpose(0, 2, 1)  # (3, scale*w, h)
    ys = _phase_filter_axis(rowT, jy, axis=2, scale=scale)
    colT = up_model._interleave_last(ys, scale)  # (3, scale*w, scale*h)
    return colT.transpose(0, 2, 1)


def _neighborhood_box(color: jnp.ndarray, gamma, scale: int = SCALE):
    """Variance-clipping rectification box: mean +- gamma*std over the 3x3
    low-res neighborhood, nearest-upsampled to display res, channel-first
    (3, scale*h, scale*w).  Variance clipping decays stale history (ghosts)
    geometrically where a min/max box lets mid-range ghosts persist, while
    still admitting sub-pixel detail within the local contrast.  ``gamma``
    may be a scalar or a per-low-res-pixel (h, w) map (motion-adaptive
    rectification)."""
    cf = color.transpose(2, 0, 1)
    s = jnp.zeros_like(cf)
    s2 = jnp.zeros_like(cf)
    for dy in (-1, 0, 1):
        sy = _shift_cf(cf, dy, axis=1)
        for dx in (-1, 0, 1):
            v = _shift_cf(sy, dx, axis=2) if dx else sy
            s = s + v
            s2 = s2 + v * v
    mu = s * _F32(1.0 / 9.0)
    sd = jnp.sqrt(jnp.maximum(s2 * _F32(1.0 / 9.0) - mu * mu, 0.0))
    g = jnp.asarray(gamma, _F32)
    if g.ndim == 2:
        g = g[None]  # broadcast over channels
    mn = mu - g * sd
    mx = mu + g * sd
    if scale == 1:
        return mn, mx
    def up(a):
        a = jnp.repeat(a, scale, axis=2)            # (3, h, scale*w)
        a = jnp.repeat(a.transpose(0, 2, 1), scale, axis=2)
        return a.transpose(0, 2, 1)                 # (3, scale*h, scale*w)
    return up(mn), up(mx)


_CONF_MAX = 12.0


def _pack_rgbn(history: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) rgb + (H, W) count -> (H, W) uint32 r|g<<8|b<<16|n<<24."""
    q = jnp.clip(jnp.round(history * 255.0), 0.0, 255.0).astype(jnp.uint32)
    nq = jnp.clip(jnp.round(conf * (255.0 / _CONF_MAX)), 0.0,
                  255.0).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (nq << 24)


def _unpack_rgbn_cf(word: jnp.ndarray):
    """(H, W) uint32 -> ((3, H, W) rgb f32, (H, W) count f32)."""
    f = _F32(1.0 / 255.0)
    rgb = jnp.stack([(word & 0xFF).astype(_F32) * f,
                     ((word >> 8) & 0xFF).astype(_F32) * f,
                     ((word >> 16) & 0xFF).astype(_F32) * f], axis=0)
    n = ((word >> 24) & 0xFF).astype(_F32) * _F32(_CONF_MAX / 255.0)
    return rgb, n


def _warp_state(state: TemporalState, motion_lowres: jnp.ndarray,
                taps: str = "bilinear", motion_decay: float = 0.35):
    """Reproject history + confidence with ONE packed 4-tap gather.

    Same coordinate convention as ``model.warp_history`` (motion = NDC
    delta current-previous, y negated, ``StateRender.cu:241,251``);
    off-screen source coordinates zero the confidence (disocclusion from
    screen edges contributes no history)."""
    hh, hw = state.history.shape[0], state.history.shape[1]
    mvx = jax.image.resize(motion_lowres[..., 0], (hh, hw), "nearest")
    mvy = jax.image.resize(motion_lowres[..., 1], (hh, hw), "nearest")
    xs = jnp.arange(hw, dtype=_F32)[None, :] - mvx * _F32(0.5 * hw)
    ys = jnp.arange(hh, dtype=_F32)[:, None] - mvy * _F32(0.5 * hh)
    xs = jnp.broadcast_to(xs, (hh, hw))
    ys = jnp.broadcast_to(ys, (hh, hw))
    inside = ((xs >= 0.0) & (xs <= hw - 1.0)
              & (ys >= 0.0) & (ys <= hh - 1.0)).astype(_F32)
    # motion-adaptive decay: every warp both resamples (a ~0.25 px blur)
    # and inherits motion-vector error, which COMPOUND over frames; decay
    # confidence with the local motion magnitude so accumulation is deep
    # when still and leans on the current frame when moving.  The motion
    # vectors here are ANALYTIC (VP-matrix reprojection of the hit point,
    # exact for static geometry), so the decay guards only resample blur
    # and disocclusion residue - keep it mild; the variance clamp is the
    # primary staleness rejector.
    mpx = jnp.sqrt((mvx * _F32(0.5 * hw)) ** 2
                   + (mvy * _F32(0.5 * hh)) ** 2)
    inside = inside * jnp.exp(-mpx * _F32(motion_decay))
    packed = _pack_rgbn(state.history, state.conf)
    x = jnp.clip(xs, 0.0, hw - 1.0)
    y = jnp.clip(ys, 0.0, hh - 1.0)
    if taps == "pallas":
        # TRUE 4-tap bilinear warp as a Pallas kernel: per-tile window DMA
        # + in-register lane shuffles instead of the display-res HBM
        # gather (ops/warp_kernels.py).  Gated against the XLA "bilinear"
        # path in tests (same 4 taps, same weights); the out-of-window
        # count is dropped here - probes surface it.
        from rvgrt_tpu.ops import warp_kernels

        planes, _ = warp_kernels.warp_packed_bilinear(packed, x, y)
        return planes[:3], planes[3] * _F32(_CONF_MAX) * inside
    if taps == "nearest":
        # 1 gather instead of 4 (~456 -> ~130 ms at 3840x2400): a <=0.5 px
        # resample shift per frame, for perf-first operating points
        rgb, n = _unpack_rgbn_cf(packed[jnp.round(y).astype(jnp.int32),
                                        jnp.round(x).astype(jnp.int32)])
        return rgb, n * inside
    if taps == "bilinear_shift":
        # bilinear quality at 1-gather cost: gather the floor tap, then
        # take the +1 neighbor taps as OUTPUT-space shifts of the gathered
        # image.  Where the motion field is locally constant (everywhere
        # except depth/object silhouettes), floor(x+1 - mx) ==
        # floor(x - mx) + 1, so shift_x(gathered)[y, x] IS the true
        # (y0, x0+1) source tap - bit-equal to 4-tap bilinear.  At motion
        # discontinuities the taps come from the wrong side of the edge;
        # the variance clamp + motion-adaptive confidence decay already
        # bound that error (same machinery that bounds MV error itself).
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[None]
        fy = (y - y0)[None]
        g = packed[y0, x0]
        rgb00, n00 = _unpack_rgbn_cf(g)
        v00 = jnp.concatenate([rgb00, n00[None]], axis=0)  # (4, H, W)
        v01 = _shift_cf(v00, 1, axis=2)
        v10 = _shift_cf(v00, 1, axis=1)
        v11 = _shift_cf(v01, 1, axis=1)
        v = ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v01
             + (1 - fx) * fy * v10 + fx * fy * v11)
        return v[:3], v[3] * inside
    if taps == "catmull_shift":
        # Catmull-Rom history resample at the same 1-gather cost: the 4x4
        # tap neighborhood comes from output-space shifts of the single
        # floor-tap gather (the bilinear_shift trick, one ring wider).
        # Bilinear reprojection low-passes the history a little every
        # frame, which compounds into visible blur under sustained motion;
        # the cubic kernel's negative lobes undo most of that.  RGB uses
        # Catmull-Rom (clamped: the lobes can overshoot), confidence stays
        # bilinear (a sample count must not go negative).
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[None]
        fy = (y - y0)[None]
        g = packed[y0, x0]
        rgb00, n00 = _unpack_rgbn_cf(g)
        v00 = jnp.concatenate([rgb00, n00[None]], axis=0)  # (4, H, W)

        def cr_w(t):
            # Catmull-Rom weights for taps at -1, 0, +1, +2
            t2 = t * t
            t3 = t2 * t
            return (_F32(-0.5) * t + t2 - _F32(0.5) * t3,
                    _F32(1.0) - _F32(2.5) * t2 + _F32(1.5) * t3,
                    _F32(0.5) * t + _F32(2.0) * t2 - _F32(1.5) * t3,
                    _F32(-0.5) * t2 + _F32(0.5) * t3)

        wx = cr_w(fx)
        wy = cr_w(fy)
        cols = [_shift_cf(v00, m, axis=2) if m else v00
                for m in (-1, 0, 1, 2)]
        rgb = jnp.zeros_like(v00[:3])
        for j, m in enumerate((-1, 0, 1, 2)):
            row = jnp.zeros_like(v00[:3])
            for k in range(4):
                c = _shift_cf(cols[k], m, axis=1) if m else cols[k]
                row = row + wx[k] * c[:3]
            rgb = rgb + wy[j] * row
        # confidence: bilinear over the center 2x2 of the same stack
        n_acc = jnp.zeros_like(v00[3])
        for j, m in enumerate((0, 1)):
            for k_i, k in enumerate((1, 2)):
                c = _shift_cf(cols[k], m, axis=1) if m else cols[k]
                bw = ((fx if k == 2 else 1.0 - fx)
                      * (fy if m == 1 else 1.0 - fy))[0]
                n_acc = n_acc + bw * c[3]
        return jnp.clip(rgb, 0.0, 1.0), n_acc * inside
    # "bilinear": exact 4-tap gather, shared with the Pallas kernel's XLA
    # oracle so the full-frame and slab (sharded) paths are bit-identical
    from rvgrt_tpu.ops import warp_kernels

    planes, _ = warp_kernels.warp_packed_bilinear_xla(packed, x, y)
    return planes[:3], planes[3] * _F32(_CONF_MAX) * inside


def _current_weight(jitter_ndc: jnp.ndarray, height: int, width: int,
                    sigma: float, w_min: float, scale: int = SCALE):
    """Per-display-pixel weight of the CURRENT frame's sample: peaked at
    the display pixels the jittered low-res sample actually landed on.

    The sample lattice sits at display coords ``scale*(i + j_px)``; for a
    display pixel with phase p the nearest-sample distance along an axis
    is ``min_m |scale*j_px + scale*m - p|`` - a per-phase scalar, so the
    weight map is a (scale,) x (scale,) outer pattern tiled over the
    image."""
    def axis_d(j_px):
        s = _F32(scale) * j_px
        p = jnp.arange(scale, dtype=_F32)
        cands = jnp.stack([jnp.abs(s - p + _F32(scale) * m)
                           for m in (-1, 0, 1)])
        return jnp.min(cands, axis=0)  # (scale,)

    dx = axis_d(jitter_ndc[0] * _F32(0.5 * width))
    dy = axis_d(jitter_ndc[1] * _F32(0.5 * height))
    d2 = dy[:, None] ** 2 + dx[None, :] ** 2          # (scale, scale)
    w = jnp.exp(-d2 / _F32(2.0 * sigma * sigma))
    w = _F32(w_min) + _F32(1.0 - w_min) * w
    wx = jnp.tile(w, (1, width))[:, :scale * width]    # (scale, scale*w)
    full = jnp.tile(wx, (height, 1))[:scale * height]  # (scale*h, scale*w)
    return full


def pack_state(state: TemporalState) -> jnp.ndarray:
    """(H, W) uint32 RGBN - the wire/replication format of the temporal
    state.  Lossless for the accumulator: the per-frame warp reads the
    history THROUGH this quantization anyway (``_warp_state`` packs
    before gathering), so carrying the packed word between frames gives
    bit-identical warps to carrying f32 history."""
    return _pack_rgbn(state.history, state.conf)


def temporal_upscale_slab(color_halo: jnp.ndarray,
                          motion_halo: jnp.ndarray,
                          jitter_ndc: jnp.ndarray, packed_full: jnp.ndarray,
                          lo0, n_lo: int, *,
                          sigma: float = 0.9, w_min: float = 0.08,
                          warp_taps: str = "bilinear_shift",
                          motion_decay: float = 0.35,
                          gamma_static: float = 1.5,
                          gamma_moving: float = 0.6,
                          beta_static: float = 8.0,
                          beta_moving: float = 40.0,
                          adapt_rate: float = 8.0):
    """One display-row slab of ``temporal_upscale`` (the multi-chip unit).

    ``color_halo``: low-res rows [lo0-1, lo0+n_lo+2) of the frame (n_lo+3
    rows), edge-clamp pre-padded by the caller - the halo absorbs the
    phase filter's y shifts and the 3x3 rectification box exactly.
    ``motion_halo``: rows [lo0-1, lo0+n_lo+1) (n_lo+2 rows, edge-clamped):
    the bottom halo row feeds the warp's +1-row output-space shift at the
    slab seam and both halo rows feed the motion-magnitude dilation.
    ``packed_full``: the full previous packed state (replicated - the
    history warp gathers along arbitrary motion).  ``lo0``: this slab's
    first interior low-res row (traced scalar).  Returns ``(out_slab,
    packed_slab)`` for display rows [3*lo0, 3*(lo0+n_lo)); assembling the
    packed slabs yields the next ``packed_full``.  Matches the full-frame
    path exactly for interior rows (gated in tests/test_sharding.py).
    """
    hh, hw = packed_full.shape
    w = color_halo.shape[1]
    slab_h = SCALE * n_lo
    h_full = hh // SCALE

    # --- current frame: jitter upsample on the halo'd slab ---
    # jitter_upsample converts NDC jitter to pixels with ITS input's
    # height; rescale the y component so the slab sees the full-frame
    # pixel offset
    j_slab = jnp.stack([jitter_ndc[0],
                        jitter_ndc[1] * _F32(h_full / color_halo.shape[0])])
    cur_halo = jitter_upsample(color_halo, j_slab)  # (3, 3*(n_lo+3), W)
    cur = cur_halo[:, SCALE:SCALE + slab_h]

    # --- warp the replicated packed history into this slab (+1-row halo
    # for the bilinear_shift output-space y shift) ---
    y0_d = jnp.asarray(lo0, _F32) * _F32(SCALE)
    mv_w = motion_halo[1:]  # rows lo0 .. lo0+n_lo (n_lo+1)
    mvx = jnp.repeat(jnp.repeat(mv_w[..., 0], SCALE, 0), SCALE, 1)
    mvx = mvx[:slab_h + 1]
    mvy = jnp.repeat(jnp.repeat(mv_w[..., 1], SCALE, 0), SCALE, 1)
    mvy = mvy[:slab_h + 1]
    gy = y0_d + jnp.arange(slab_h + 1, dtype=_F32)[:, None]
    gy = jnp.minimum(gy, _F32(hh - 1))
    xs = jnp.arange(hw, dtype=_F32)[None, :] - mvx * _F32(0.5 * hw)
    ys = gy - mvy * _F32(0.5 * hh)
    inside = ((xs >= 0.0) & (xs <= hw - 1.0)
              & (ys >= 0.0) & (ys <= hh - 1.0)).astype(_F32)
    mpx_w = jnp.sqrt((mvx * _F32(0.5 * hw)) ** 2
                     + (mvy * _F32(0.5 * hh)) ** 2)
    inside = inside * jnp.exp(-mpx_w * _F32(motion_decay))
    x = jnp.clip(xs, 0.0, hw - 1.0)
    y = jnp.clip(ys, 0.0, hh - 1.0)
    if warp_taps in ("pallas", "bilinear"):
        # TRUE 4-tap warp: the Pallas windowed-DMA kernel on TPU (the
        # same kernel the full-frame path runs - measured 106.8 -> ~35 ms
        # per mesh=1 slab call at 3840x2400, scripts/probe_v5e8.py) or
        # the XLA oracle on CPU.  The y+1 taps are gathered, so the
        # +1-row halo of the shift path is unused here.
        from rvgrt_tpu.ops import warp_kernels

        x_s, y_s = x[:slab_h], y[:slab_h]
        if warp_taps == "pallas":
            pad = (-slab_h) % 8
            if pad:
                x_s = jnp.concatenate([x_s, jnp.repeat(x_s[-1:], pad, 0)])
                y_s = jnp.concatenate([y_s, jnp.repeat(y_s[-1:], pad, 0)])
            planes, _ = warp_kernels.warp_packed_bilinear(packed_full,
                                                          x_s, y_s)
            planes = planes[:, :slab_h]
        else:
            planes, _ = warp_kernels.warp_packed_bilinear_xla(packed_full,
                                                              x_s, y_s)
        hist = planes[:3]
        n_prev = planes[3] * _F32(_CONF_MAX) * inside[:-1]
    else:  # "bilinear_shift": 1 gather + output-space shifted +1 taps
        x0 = jnp.floor(x).astype(jnp.int32)
        y0i = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[None]
        fy = (y - y0i)[None]
        rgb00, n00 = _unpack_rgbn_cf(packed_full[y0i, x0])
        v00 = jnp.concatenate([rgb00, n00[None]], axis=0)
        v01 = _shift_cf(v00, 1, axis=2)
        v10 = v00[:, 1:]
        v11 = v01[:, 1:]
        v00i = v00[:, :-1]
        v01i = v01[:, :-1]
        fx_i = fx[:, :-1]
        fy_i = fy[:, :-1]
        v = ((1 - fx_i) * (1 - fy_i) * v00i + fx_i * (1 - fy_i) * v01i
             + (1 - fx_i) * fy_i * v10 + fx_i * fy_i * v11)
        hist, n_prev = v[:3], v[3] * inside[:-1]

    # --- motion-adaptive rectification (dilated over the true halo) ---
    mpx = jnp.sqrt((motion_halo[..., 0] * _F32(0.5 * hw)) ** 2
                   + (motion_halo[..., 1] * _F32(0.5 * hh)) ** 2)
    m = mpx[None]
    for ax in (1, 2):
        m = jnp.maximum(m, jnp.maximum(_shift_cf(m, 1, axis=ax),
                                       _shift_cf(m, -1, axis=ax)))
    a_h = 1.0 - jnp.exp(-m[0] * _F32(adapt_rate))  # rows lo0-1..lo0+n_lo
    g_h = _F32(gamma_static) + _F32(gamma_moving - gamma_static) * a_h
    a_int = a_h[1:1 + n_lo]
    beta = jnp.repeat(jnp.repeat(
        _F32(beta_static) + _F32(beta_moving - beta_static) * a_int,
        SCALE, 0), SCALE, 1)

    mn_h, mx_h = _neighborhood_box(color_halo[:n_lo + 2], g_h)
    mn = mn_h[:, SCALE:SCALE + slab_h]
    mx = mx_h[:, SCALE:SCALE + slab_h]

    clamped = jnp.clip(hist, mn - _F32(0.01), mx + _F32(0.01))
    clamp_dist = jnp.mean(jnp.abs(hist - clamped), axis=0)
    n_w = n_prev * jnp.exp(-clamp_dist * beta)

    # the weight pattern is (SCALE, SCALE)-periodic and this slab starts
    # at display row SCALE*lo0 (phase 0), so slab-local tiling == global;
    # the axis pixel offsets use the FULL frame dims
    w_cur = _current_weight(jitter_ndc, h_full, w, sigma, w_min)[:slab_h]
    den = n_w + w_cur
    out_cf = (n_w[None] * clamped + w_cur[None] * cur) / den[None]
    out_cf = jnp.clip(out_cf, 0.0, 1.0)
    n_new = jnp.minimum(den, _F32(_CONF_MAX))
    out = out_cf.transpose(1, 2, 0)
    return out, _pack_rgbn(out, n_new)


def temporal_upscale(color: jnp.ndarray, motion: jnp.ndarray,
                     depth: jnp.ndarray, jitter_ndc: jnp.ndarray,
                     state: TemporalState, *,
                     sigma: float = 0.9, w_min: float = 0.08,
                     gamma: float | None = None,
                     clamp_beta: float | None = None,
                     clamp_eps: float = 0.01,
                     warp_taps: str = "bilinear_shift",
                     motion_decay: float = 0.35,
                     gamma_static: float = 1.5, gamma_moving: float = 0.6,
                     beta_static: float = 8.0, beta_moving: float = 40.0,
                     adapt_rate: float = 8.0,
                     valid=None, invalid_weight: float = 0.05,
                     depth_reject: bool = False,
                     depth_tau: float = 0.25,
                     depth_conf: float = 0.1):
    """One frame of temporal 3x super-resolution.

    Returns ``(out, new_state)`` with ``out`` (SCALE*h, SCALE*w, 3).  The
    same input contract as the learned net (``model.upscale``).

    ``valid``: optional (h, w) bool - True where this frame actually
    traced the low-res pixel (checkerboard rendering,
    ``pipeline.checker_valid_mask``).  Untraced pixels enter with
    ``invalid_weight`` x their normal weight: accumulated history
    dominates wherever it exists, and the renderer's neighbor-fill is
    only used where there is no history at all (camera cuts,
    disocclusions).

    ``depth_reject``: depth-based disocclusion rejection (the reference
    tags depth for DLSS for exactly this - ``main.cpp:489-495``).  The
    previous LOW-res clip depth (carried in ``state.depth``; init with
    ``init_state(depth_reject=True)``) is warped by the motion field (one
    low-res nearest gather) and compared in linearized units against this
    frame's depth; history confidence drops to ``depth_conf`` x where they
    disagree by more than ``depth_tau`` relative - geometry appeared or
    vanished there, so the color history is stale regardless of what the
    variance clamp thinks.
    """
    h, w = color.shape[0], color.shape[1]
    # scale inferred from the carried state: 3 = the flagship display
    # upscale, 1 = native-res temporal reconstruction (rate-cut fill)
    scale = state.history.shape[0] // h
    assert state.history.shape[0] == scale * h, (state.history.shape, h)

    cur = jitter_upsample(color, jitter_ndc, scale=scale)  # (3, H, W)
    hist, n_prev = _warp_state(state, motion, taps=warp_taps,
                               motion_decay=motion_decay)

    if depth_reject:
        # warp prev low-res depth by the same motion convention as the
        # history warp (one (h, w) nearest gather)
        xs = jnp.arange(w, dtype=_F32)[None, :] - motion[..., 0] \
            * _F32(0.5 * w)
        ys = jnp.arange(h, dtype=_F32)[:, None] - motion[..., 1] \
            * _F32(0.5 * h)
        inside = ((xs >= 0.0) & (xs <= w - 1.0)
                  & (ys >= 0.0) & (ys <= h - 1.0))
        xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
        d_prev = state.depth[yi, xi]
        # linearize the GL-style clip depth (perspectiveRH_NO: z/w in
        # [-1, 1], -> 1 at far): l ~ 1/(1+eps - d) is monotone in view
        # depth and turns the relative test into a scale-free one
        lw = 1.0 / (_F32(1.001) - jnp.minimum(d_prev, 1.0))
        lc = 1.0 / (_F32(1.001) - jnp.minimum(depth, 1.0))
        occl = inside & (jnp.abs(lw - lc)
                         > _F32(depth_tau) * jnp.maximum(lw, lc))
        keep = jnp.where(occl, _F32(depth_conf), _F32(1.0))
        keep = jnp.repeat(jnp.repeat(keep, scale, axis=0), scale, axis=1)
        n_prev = n_prev * keep

    # motion-adaptive rectification: a STILL region's history is its best
    # detail source (wide box admits accumulated sub-pixel detail, soft
    # beta keeps it), while a MOVING region's history is suspect (tight
    # box + harsh beta kill residue fast).  Measured at the extremes
    # (cube-7 CPU eval, SSAA-4 refs): static wants (1.5, 8) +0.34 dB,
    # moving wants (0.6, 40) +0.33 dB over the old global (1.0, 16) -
    # no global setting wins both, the motion blend takes both.
    # Explicit scalar gamma/clamp_beta override the adaptive blend.
    if gamma is None or clamp_beta is None:
        mpx = jnp.sqrt((motion[..., 0] * _F32(0.5 * w * scale)) ** 2
                       + (motion[..., 1] * _F32(0.5 * h * scale)) ** 2)
        # dilate by a 3x3 max: miss/sky pixels carry ZERO motion vectors,
        # but at terrain-sky silhouettes the CONTENT still moves (the edge
        # sweeps across them) - without dilation those pixels read as
        # still, get the loose clamp, and ghost (measured -0.9 dB on
        # moving scenes)
        m = mpx[None]
        for ax in (1, 2):
            m = jnp.maximum(m, jnp.maximum(_shift_cf(m, 1, axis=ax),
                                           _shift_cf(m, -1, axis=ax)))
        mpx = m[0]
        # reach the "moving" regime by ~0.3 display px/frame: even
        # sub-pixel motion misaligns warped history enough that the tight
        # clamp wins
        a = 1.0 - jnp.exp(-mpx * _F32(adapt_rate))
    if gamma is None:
        gamma = _F32(gamma_static) + _F32(gamma_moving - gamma_static) * a
    if clamp_beta is None:
        beta_lo = jnp.repeat(jnp.repeat(
            _F32(beta_static) + _F32(beta_moving - beta_static) * a,
            scale, axis=0), scale, axis=1)
        clamp_beta = beta_lo

    v3 = None
    if valid is not None:
        v3 = (valid.astype(_F32) if scale == 1 else
              jnp.repeat(jnp.repeat(valid.astype(_F32), scale, axis=0),
                         scale, axis=1))

    mn, mx = _neighborhood_box(color, gamma, scale=scale)
    clamped = jnp.clip(hist, mn - _F32(clamp_eps), mx + _F32(clamp_eps))
    if v3 is not None:
        # rate-cut frames: an UNTRACED pixel carries no fresh evidence -
        # its neighborhood box is built from neighbor-filled copies, and
        # clamping history to it pins converged detail to the fill value
        # (measured: quarter-rate static convergence plateaus ~26 dB with
        # the clamp, converges without).  Keep history as-is there; the
        # pixel is re-traced (and properly rectified) within 2-4 frames.
        clamped = v3[None] * clamped + (1.0 - v3[None]) * hist
    # history that needed clamping is stale (disocclusion/lighting change):
    # scale its effective sample count down smoothly
    clamp_dist = jnp.mean(jnp.abs(hist - clamped), axis=0)
    n_w = n_prev * jnp.exp(-clamp_dist * jnp.asarray(clamp_beta, _F32))

    w_cur = _current_weight(jitter_ndc, h, w, sigma, w_min, scale=scale)
    if v3 is not None:
        w_cur = w_cur * (v3 + (1.0 - v3) * _F32(invalid_weight))
    den = n_w + w_cur
    out_cf = (n_w[None] * clamped + w_cur[None] * cur) / den[None]
    out_cf = jnp.clip(out_cf, 0.0, 1.0)
    n_new = jnp.minimum(den, _F32(_CONF_MAX))
    out = out_cf.transpose(1, 2, 0)
    nd = depth if depth_reject else state.depth
    return out, TemporalState(history=out, conf=n_new, depth=nd)
