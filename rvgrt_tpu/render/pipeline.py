"""Per-frame render pipeline as one jitted function.

The TPU restructuring of the reference's two per-frame kernels
(``distApproximationKernel`` + ``renderKernel``, ``StateRender.cu:200-346``)
into wavefront stages over whole-image SoA buffers:

  1. half-res prepass: primary trace -> distance (biased -8, miss=300) and a
     sun-shadow factor (0.2 / 1.0) per half-res pixel;
  2. conservative 2x2-min distance upsample (``minDist``) and separable
     bilinear shadow upsample (the hardware-tex bilinear of the reference);
  3. full-res primary trace starting at the conservative distance;
  4. shading: water (fbm-distorted normal, reflection trace + reflection
     shadow trace, Schlick Fresnel) / solid (atlas albedo, Lambertian x
     shadow, 6-cone VCT GI, sky ambient) / miss (sky); exponential fog;
  5. motion vectors (current-previous unjittered NDC, y negated) + clip
     depth from the two view-projection matrices.

Water-lane secondary rays run as full-buffer traces with non-water lanes
parked OOB (they retire in two supersteps) - the mask-everything analogue of
the reference's divergent early-outs.

Outputs mirror the DLSS input contract (``main.cpp:448-509``): color (f32
[H,W,3]), motion (f32 [H,W,2]), depth (f32 [H,W]), plus the prepass buffers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.core import vecmath as vm
from rvgrt_tpu.render import shading
from rvgrt_tpu.trace import wavefront
from rvgrt_tpu.world import atlas as atlas_mod, gi_grid

_F32 = jnp.float32


class FrameOutputs(NamedTuple):
    color: jnp.ndarray        # (H, W, 3) float32 in [0,1]
    motion: jnp.ndarray       # (H, W, 2) float32, NDC delta, y negated
    depth: jnp.ndarray        # (H, W) float32 clip z/w
    half_dist: jnp.ndarray    # (H/2, W/2) float32 (biased)
    half_shadow: jnp.ndarray  # (H/2, W/2) float32


class GBuffer(NamedTuple):
    """Primary-hit geometry + material for deferred (split-dispatch) GI.

    Field names mirror TraceResult so ``gather_gi_image`` can consume
    either.  ``fog`` is the per-pixel exponential fog transmittance the
    base color was composited with - light added later must be scaled by
    the same factor for bit-compatibility with the fused path.
    """
    hit: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    t: jnp.ndarray
    albedo_r: jnp.ndarray
    albedo_g: jnp.ndarray
    albedo_b: jnp.ndarray
    fog: jnp.ndarray


class CameraArrays(NamedTuple):
    """Camera basis + matrices as jnp arrays (device-resident constants).

    The replicated-uniform equivalent of the reference's ``__constant__``
    uploads (``StateRender.cu:295-308``): closed over by the jitted step.
    """
    pos: jnp.ndarray          # (3,)
    forward: jnp.ndarray      # (3,)
    right: jnp.ndarray        # (3,)
    up: jnp.ndarray           # (3,)
    vp: jnp.ndarray           # (4,4) current unjittered view-projection
    prev_vp: jnp.ndarray      # (4,4) previous unjittered view-projection
    jitter: jnp.ndarray       # (2,) NDC jitter
    time: jnp.ndarray         # () seconds, for water waves


def _ray_dirs(cam: CameraArrays, width: int, height: int,
              pixel_center: bool, y0=0, rows: int | None = None):
    """Primary ray directions: dir = normalize(fo + ndc.x*ri + ndc.y*up).

    ``pixel_center`` selects the reference's two conventions: the prepass
    samples at (i+0.5)/n (StateRender.cu:268-269), the main pass at i/n
    (StateRender.cu:225-226).  ``y0``/``rows`` select a row slab of the
    global image (for pixel-sharded rendering); row indices are clamped to
    the image so halo rows duplicate the edge (== clamp addressing).
    """
    off = 0.5 if pixel_center else 0.0
    rows = height if rows is None else rows
    xs = (jnp.arange(width, dtype=_F32) + off) / width
    iy = jnp.clip(jnp.asarray(y0, jnp.int32)
                  + jnp.arange(rows, dtype=jnp.int32), 0, height - 1)
    ys = (iy.astype(_F32) + off) / height
    ndc_x = xs[None, :] * 2.0 - 1.0 + cam.jitter[0]
    ndc_y = ys[:, None] * 2.0 - 1.0 + cam.jitter[1]
    fo = cam.forward
    ri = cam.right
    up = cam.up
    dx = fo[0] + ndc_x * ri[0] + ndc_y * up[0]
    dy = fo[1] + ndc_x * ri[1] + ndc_y * up[1]
    dz = fo[2] + ndc_x * ri[2] + ndc_y * up[2]
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv, dy * inv, dz * inv


def make_trace_fn(bits, sdf, cfg, rcfg, table=None, sky_y=None):
    """Default ray-cast closure: single-device wavefront trace.

    Every trace the pipeline issues goes through a ``trace_fn(ox, oy, oz,
    dx, dy, dz, t0) -> TraceResult`` so the same pipeline renders against
    a z-slab volume-sharded world (parallel/volume.py provides the
    ring-handoff closure)."""
    if table is None:
        table = wavefront.make_trace_table(bits, sdf, cfg)

    def trace_fn(ox, oy, oz, dx, dy, dz, t0):
        return wavefront.trace(None, None, cfg, rcfg, ox, oy, oz,
                               dx, dy, dz, t0, table=table, sky_y=sky_y)

    return trace_fn


def _shadow_trace(trace_fn, hit, hpos, normal, sun, offset: float):
    """Sun-shadow ray from hit + normal*offset; misses parked OOB."""
    ox = jnp.where(hit, hpos[0] + normal[0] * offset, _F32(-10.0))
    oy = jnp.where(hit, hpos[1] + normal[1] * offset, _F32(-10.0))
    oz = jnp.where(hit, hpos[2] + normal[2] * offset, _F32(-10.0))
    res = trace_fn(ox, oy, oz, sun[0], sun[1], sun[2], jnp.zeros_like(ox))
    return res.hit


def _min_expand_axis(c, q: int, off: int, n_out: int, axis: int):
    """Conservative upsample-by-q along ``axis``: min over the coarse
    samples at offsets {-1, 0, +1, +2} around each output position."""
    e = [_phase_expand(c, q, off, delta, axis) for delta in (-1, 0, 1, 2)]
    m = jnp.minimum(jnp.minimum(e[0], e[1]), jnp.minimum(e[2], e[3]))
    sl = [slice(None)] * m.ndim
    sl[axis] = slice(0, n_out)
    return m[tuple(sl)]


_HINT_BIG = 1.0e9


def temporal_start_hint(cam: CameraArrays, prev_cam: CameraArrays,
                        prev_t: jnp.ndarray, rcfg,
                        out_h: int, out_w: int, *,
                        pixel_center: bool = False,
                        prev_pixel_center: bool = True,
                        window: int = 2, bias: float | None = None,
                        margin: float = 2.0,
                        sky_start: float | None = None) -> jnp.ndarray:
    """Conservative trace-start distances from the PREVIOUS frame's
    hit-distance map.  The world is static (only the camera moves,
    ``Character.cpp:56-126``), so last frame's visibility bounds this
    frame's: a deliberate TPU addition on top of the reference's same-frame
    ``minDist`` (StateRender.cu:182-198) - same approximation class, one
    frame deeper.

    For each current-grid pixel, its ray direction ``d`` is projected into
    the previous frame's ray grid through the previous camera BASIS
    (``ndc = (d.right, d.up) / d.forward`` - the renderer's ray grid is
    NOT the VP matrix's frustum, StateRender.cu:44-45), the windowed-min
    of ``prev_t`` is gathered there, and the bound is tightened by the
    camera translation (triangle inequality: a point at distance t from
    the old position is at least ``t - |dpos|`` from the new one) and
    ``bias``.  The window-min covers grid discretization, jitter, and
    translation parallax for ``t >= margin * (pw/2) * |dpos| / window``;
    closer gathers are gated to 0 (no hint - the same-frame cascade
    floor stands).  Sky lanes (``prev_t >= _HINT_BIG/2``, encoded by the
    caller) carry no bound under translation; under a pure rotation an
    all-sky window proves the ray misses, and ``sky_start`` (e.g. beyond
    the world) retires it instantly.

    Returns an (out_h, out_w) f32 map of start distances (0 = no hint),
    to be ``maximum``-combined with the same-frame conservative starts.
    """
    bias_f = _F32(rcfg.dist_bias if bias is None else bias)
    ph, pw = prev_t.shape
    # separable windowed min (edge-clamped static shifts - no gathers)
    m = prev_t
    for ax in (0, 1):
        acc = m
        for dlt in range(1, window + 1):
            acc = jnp.minimum(acc, _clamped_shift(m, dlt, ax))
            acc = jnp.minimum(acc, _clamped_shift(m, -dlt, ax))
        m = acc
    dx, dy, dz = _ray_dirs(cam, out_w, out_h, pixel_center=pixel_center)
    fo, ri, up = prev_cam.forward, prev_cam.right, prev_cam.up
    dfo = dx * fo[0] + dy * fo[1] + dz * fo[2]
    ahead = dfo > _F32(1e-6)
    dsafe = jnp.where(ahead, dfo, _F32(1.0))
    ndc_x = (dx * ri[0] + dy * ri[1] + dz * ri[2]) / dsafe \
        - prev_cam.jitter[0]
    ndc_y = (dx * up[0] + dy * up[1] + dz * up[2]) / dsafe \
        - prev_cam.jitter[1]
    poff = _F32(0.5 if prev_pixel_center else 0.0)
    fx = (ndc_x + 1.0) * _F32(0.5 * pw) - poff
    fy = (ndc_y + 1.0) * _F32(0.5 * ph) - poff
    inside = (ahead & (fx >= -0.5) & (fx <= pw - 0.5)
              & (fy >= -0.5) & (fy <= ph - 0.5))
    ix = jnp.clip(jnp.round(fx).astype(jnp.int32), 0, pw - 1)
    iy = jnp.clip(jnp.round(fy).astype(jnp.int32), 0, ph - 1)
    g = m[iy, ix]
    dp = cam.pos - prev_cam.pos
    delta = jnp.sqrt(dp[0] ** 2 + dp[1] ** 2 + dp[2] ** 2)
    # parallax gate: the window (in prev-grid px) covers the warp's
    # translation error only beyond this distance
    # (window 0 still tolerates the 0.5 px rounding of the nearest gather)
    t_gate = _F32(margin * 0.5 * pw / max(window, 0.5)) * delta
    sky = g >= _F32(_HINT_BIG * 0.5)
    hint = jnp.maximum(g - delta - bias_f, 0.0)
    hint = jnp.where(g >= t_gate, hint, 0.0)
    if sky_start is not None:
        # NOTE: a sky_start beyond ``miss_distance - dist_bias`` is NOT
        # behavior-preserving: prepass-miss pixels march from ~296 in the
        # reference semantics and can still hit distant terrain (the
        # half-res prepass undersamples thin/far features) - measured
        # 3.7k/512k extra misses at 4*world_size (PERF.md round 3)
        sky_hint = jnp.where(delta < _F32(1e-5), _F32(sky_start), _F32(0.0))
    else:
        sky_hint = _F32(0.0)
    hint = jnp.where(sky, sky_hint, hint)
    return jnp.where(inside, hint, _F32(0.0))


def temporal_hints_from_prepass(prev_half_dist: jnp.ndarray,
                                cam: CameraArrays, prev_cam: CameraArrays,
                                rcfg, *, window: int = 2,
                                bias: float | None = None,
                                margin: float = 2.0,
                                sky_start: float | None = None):
    """(hint_half, hint_full) for this frame from the previous frame's
    prepass distance buffer (``FrameOutputs.half_dist`` - already the
    per-pixel camera distance, biased by ``dist_bias`` with miss =
    ``miss_distance``).  The natural per-frame wiring: the prepass buffer
    is part of the frame contract, so no extra state is carried."""
    prev_t = prev_half_dist + _F32(rcfg.dist_bias)
    prev_t = jnp.where(prev_t >= _F32(rcfg.miss_distance - 0.5),
                       _F32(_HINT_BIG), prev_t)
    kw = dict(window=window, bias=bias, margin=margin, sky_start=sky_start)
    hint_half = temporal_start_hint(
        cam, prev_cam, prev_t, rcfg, rcfg.half_height, rcfg.half_width,
        pixel_center=True, **kw)
    hint_full = temporal_start_hint(
        cam, prev_cam, prev_t, rcfg, rcfg.height, rcfg.width,
        pixel_center=False, **kw)
    return hint_half, hint_full


def _take_rows(full: jnp.ndarray, y0, rows: int, n: int) -> jnp.ndarray:
    """rows [y0, y0+rows) of a full-frame map, edge-clamped like the ray
    grids (``_ray_dirs``/``half_res_prepass`` row conventions)."""
    iy = jnp.clip(jnp.asarray(y0, jnp.int32)
                  + jnp.arange(rows, dtype=jnp.int32), 0, n - 1)
    return jnp.take(full, iy, axis=0)


def _cascade_start(trace_fn, rcfg, cam: CameraArrays, hy0, hrows: int,
                   hint_rows=None):
    """Start distances for the half-res prepass from an even coarser trace.

    The reference starts its half-res prepass at distance 0
    (``StateRender.cu:270``) and only the full-res pass gets a conservative
    start (``minDist``).  This adds one more level of the same idea: rays
    at 1/prepass_cascade of half res trace from scratch, then every
    half-res ray starts at (min over the surrounding coarse samples)
    - dist_bias.  Same approximation class as the reference's minDist.
    """
    hw = rcfg.half_width
    q = rcfg.prepass_cascade
    while q > 1 and hw % q:
        q //= 2
    if q <= 1:
        return jnp.zeros((hrows, hw), _F32)
    off = q // 2
    crows = -(-hrows // q) + 1
    ccols = hw // q
    # coarse rays sample the half-res pixel grid (i+0.5 convention),
    # strided by q, edge-clamped within this slab
    ly = jnp.clip(off + q * jnp.arange(crows, dtype=jnp.int32), 0, hrows - 1)
    gy = jnp.clip(jnp.asarray(hy0, jnp.int32) + ly, 0, rcfg.half_height - 1)
    lx = jnp.clip(off + q * jnp.arange(ccols, dtype=jnp.int32), 0, hw - 1)
    ys = (gy.astype(_F32) + 0.5) / rcfg.half_height
    xs = (lx.astype(_F32) + 0.5) / hw
    ndc_x = xs[None, :] * 2.0 - 1.0 + cam.jitter[0]
    ndc_y = ys[:, None] * 2.0 - 1.0 + cam.jitter[1]
    dx = cam.forward[0] + ndc_x * cam.right[0] + ndc_y * cam.up[0]
    dy = cam.forward[1] + ndc_x * cam.right[1] + ndc_y * cam.up[1]
    dz = cam.forward[2] + ndc_x * cam.right[2] + ndc_y * cam.up[2]
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    cstart = jnp.zeros((crows, ccols), _F32)
    if hint_rows is not None:
        cstart = jnp.maximum(cstart, hint_rows[ly][:, lx])
    res = trace_fn(cam.pos[0] + jnp.zeros((crows, ccols), _F32),
                   cam.pos[1], cam.pos[2],
                   dx * inv, dy * inv, dz * inv, cstart)
    d = jnp.sqrt((res.px - cam.pos[0]) ** 2 + (res.py - cam.pos[1]) ** 2
                 + (res.pz - cam.pos[2]) ** 2)
    dist = jnp.where(res.hit, d, _F32(rcfg.miss_distance))
    m = _min_expand_axis(dist, q, off, hrows, 0)
    m = _min_expand_axis(m, q, off, hw, 1)
    return jnp.maximum(m - _F32(rcfg.dist_bias), 0.0)


def half_res_prepass(bits, sdf, cfg, rcfg, lcfg, cam: CameraArrays,
                     hy0=0, hrows: int | None = None, table=None,
                     sky_y=None, trace_fn=None, start_hint=None,
                     want_shadow: bool = True):
    """distApproximationKernel (StateRender.cu:255-286): distance - 8
    (miss -> 300) and hard shadow factor at half render resolution.
    ``hy0``/``hrows`` select a half-res row slab (edge-clamped).
    ``start_hint``: optional full-frame (half_height, half_width)
    conservative start map (``temporal_start_hint``), maximum-combined
    with the cascade start.  ``want_shadow=False`` skips the shadow
    estimate entirely (ones placeholder) - the decoupled-shadow tier
    (``RenderConfig.shadow_site_divisor``) marches shadows from the
    primary hits instead."""
    if trace_fn is None:
        trace_fn = make_trace_fn(bits, sdf, cfg, rcfg, table=table,
                                 sky_y=sky_y)
    hw, hh = rcfg.half_width, rcfg.half_height
    hrows = hh if hrows is None else hrows
    dx, dy, dz = _ray_dirs(cam, hw, hh, pixel_center=True, y0=hy0,
                           rows=hrows)
    hint_rows = None
    if start_hint is not None:
        hint_rows = _take_rows(start_hint, hy0, hrows, hh)
    start = _cascade_start(trace_fn, rcfg, cam, hy0, hrows,
                           hint_rows=hint_rows)
    if hint_rows is not None:
        start = jnp.maximum(start, hint_rows)
    res = trace_fn(cam.pos[0] + jnp.zeros_like(dx), cam.pos[1], cam.pos[2],
                   dx, dy, dz, start)
    d = jnp.sqrt((res.px - cam.pos[0]) ** 2 + (res.py - cam.pos[1]) ** 2
                 + (res.pz - cam.pos[2]) ** 2)
    dist = jnp.where(res.hit, d, _F32(rcfg.miss_distance))

    if not want_shadow:
        shadow = jnp.ones_like(dist)
    elif lcfg.soft_shadows:
        assert sdf is not None, "soft_shadows needs the raw SDF array"
        s = lcfg.soft_shadow_stride
        if s > 1:
            # march only every s-th prepass pixel (penumbras are smooth)
            # and lerp between the marched sites
            sub = lambda a: a[::s, ::s]  # noqa: E731
            q = shading.soft_shadow_march(
                sub(res.px), sub(res.py), sub(res.pz),
                sub(res.nx), sub(res.ny), sub(res.nz), sub(res.hit),
                sdf, cfg, lcfg, sky_y=sky_y)
            shadow = _expand_even(q, s, res.hit.shape)
        else:
            shadow = shading.soft_shadow_march(
                res.px, res.py, res.pz, res.nx, res.ny, res.nz, res.hit,
                sdf, cfg, lcfg, sky_y=sky_y)
    else:
        sun = vm.splat(lcfg.sun_dir, res.hit.shape)
        shadow_hit = _shadow_trace(trace_fn, res.hit,
                                   (res.px, res.py, res.pz),
                                   (res.nx, res.ny, res.nz), sun,
                                   offset=1e-1)
        shadow = jnp.where(res.hit & shadow_hit, _F32(lcfg.shadow_factor),
                           _F32(1.0))
    return dist - _F32(rcfg.dist_bias), shadow


def _expand_even(a: jnp.ndarray, s: int, out_shape) -> jnp.ndarray:
    """Linear upsample by integer factor ``s`` with sources anchored at
    the EVEN grid sites (out[s*k] == a[k]); edge-clamped, sliced to
    ``out_shape``.  Used to spread strided soft-shadow samples back onto
    the full prepass grid."""
    def axis_up(v, axis):
        n = v.shape[axis]
        idx = [slice(None)] * v.ndim
        idx[axis] = slice(n - 1, n)
        last = v[tuple(idx)]
        body = [slice(None)] * v.ndim
        body[axis] = slice(1, n)
        nxt = jnp.concatenate([v[tuple(body)], last], axis=axis)
        ws = [(1.0 - j / s) for j in range(s)]
        planes = [v * _F32(w) + nxt * _F32(1.0 - w) for w in ws]
        out = jnp.stack(planes, axis=axis + 1)
        shape = list(v.shape)
        shape[axis] *= s
        return out.reshape(shape)

    up = axis_up(axis_up(a, 0), 1)
    return up[:out_shape[0], :out_shape[1]]


def min_dist_upsample(half_dist: jnp.ndarray) -> jnp.ndarray:
    """Conservative 2x upsample: min over the 2x2 quad at (ix//2, iy//2),
    neighbours clamped at edges (``minDist``, StateRender.cu:182-198)."""
    pad = jnp.pad(half_dist, ((0, 1), (0, 1)), mode="edge")
    m = jnp.minimum(jnp.minimum(pad[:-1, :-1], pad[:-1, 1:]),
                    jnp.minimum(pad[1:, :-1], pad[1:, 1:]))
    return jnp.repeat(jnp.repeat(m, 2, axis=0), 2, axis=1)


def bilinear_upsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Exact CUDA-texture bilinear at full-res coords (ix/W, iy/H) over a
    half-res clamped texture: separable; even outputs average two texels,
    odd outputs copy one (StateRender.cu:230 shadow lookup)."""
    def axis_up(a, axis):
        # prev[k] = a[k-1] with clamp at the low edge (texel -1 == texel 0)
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(0, 1)
        first = a[tuple(idx)]
        body = [slice(None)] * a.ndim
        body[axis] = slice(0, a.shape[axis] - 1)
        prev = jnp.concatenate([first, a[tuple(body)]], axis=axis)
        even = 0.5 * (prev + a)
        out = jnp.stack([even, a], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] *= 2
        return out.reshape(shape)

    return axis_up(axis_up(img, 0), 1)


def _min_dist_upsample_slab(half_halo: jnp.ndarray, slab_h: int,
                            d: int = 2):
    """minDist over a prepass slab with a 1-row halo on each side
    (rows hy0 = y0//d - 1 .. (y0+slab_h)//d + 1, edge-clamped).

    d == 2 is the reference's exact 2x2 quad min (StateRender.cu:182-198);
    d > 2 widens the window to the {-1, 0, 1, 2} coarse offsets (the
    samples nearest a full-res pixel then lie up to d px away on either
    side - the quad alone would not cover them)."""
    if d == 2:
        pad = jnp.pad(half_halo, ((0, 0), (0, 1)), mode="edge")
        m = jnp.minimum(jnp.minimum(pad[:-1, :-1], pad[:-1, 1:]),
                        jnp.minimum(pad[1:, :-1], pad[1:, 1:]))
        return jnp.repeat(jnp.repeat(m[1:1 + slab_h // 2], 2, axis=0),
                          2, axis=1)
    m = half_halo
    for ax in (0, 1):
        acc = m
        for dlt in (-1, 1, 2):
            acc = jnp.minimum(acc, _clamped_shift(m, dlt, ax))
        m = acc
    return jnp.repeat(jnp.repeat(m[1:1 + slab_h // d], d, axis=0),
                      d, axis=1)


def _bilinear_upsample_slab(half_halo: jnp.ndarray, slab_h: int,
                            d: int = 2):
    """Shadow upsample of a prepass slab with halo rows.  d == 2 keeps the
    reference's exact CUDA-texture bilinear (StateRender.cu:230); d > 2
    uses the even-anchored linear expand (``_expand_even`` semantics) -
    shadows are smooth, so the alignment difference is image-gated."""
    a = half_halo
    if d == 2:
        prevx = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        evenx = 0.5 * (prevx + a)
        ax = jnp.stack([evenx, a], axis=2).reshape(a.shape[0],
                                                   a.shape[1] * 2)
        h = slab_h // 2
        avg = 0.5 * (ax[0:h] + ax[1:h + 1])
        cpy = ax[1:h + 1]
        return jnp.stack([avg, cpy], axis=1).reshape(slab_h, ax.shape[1])
    return _expand_even(a[1:], d, (slab_h, a.shape[1] * d))


def _clamped_shift(c, delta: int, axis: int):
    """``out[i] = c[clip(i + delta, 0, n-1)]`` via static pad/slice (no
    gathers - random gathers are the budget everything here protects)."""
    if delta == 0:
        return c
    pad = [(0, 0)] * c.ndim
    pad[axis] = (max(-delta, 0), max(delta, 0))
    p = jnp.pad(c, pad, mode="edge")
    sl = [slice(None)] * c.ndim
    sl[axis] = slice(max(delta, 0), max(delta, 0) + c.shape[axis])
    return p[tuple(sl)]


def _phase_expand(c, d: int, off: int, delta: int, axis: int):
    """Upsample by ``d`` along ``axis`` with nearest-coarse replication:
    ``out[y] = c[clip(i0(y) + delta)]`` where ``i0(y) = floor((y-off)/d)``
    (coarse samples were taken at full-res positions ``off + d*i``).
    Pure interleave of ``d`` statically shifted copies - no gathers."""
    if d == 1:
        return _clamped_shift(c, delta, axis)
    phases = [_clamped_shift(c, delta + (0 if r >= off else -1), axis)
              for r in range(d)]
    st = jnp.stack(phases, axis=axis + 1)
    shape = list(c.shape)
    shape[axis] *= d
    return st.reshape(shape)


def _phase_frac(n_coarse: int, d: int, off: int):
    """Per-output bilinear fraction toward the +1 coarse neighbor."""
    fr = jnp.array([((r - off) % d) / d for r in range(d)], _F32)
    return jnp.tile(fr, n_coarse)


def _normal_code(nx, ny, nz):
    """Face normals are axis-aligned: encode as a small int for equality
    tests in the GI upsample (0..5 = +-x/+-y/+-z, 6 = degenerate)."""
    i32 = jnp.int32
    return jnp.where(nx != 0, (nx > 0).astype(i32),
                     jnp.where(ny != 0, 2 + (ny > 0).astype(i32),
                               jnp.where(nz != 0, 4 + (nz > 0).astype(i32),
                                         6)))


def _gi_joint_upsample(cir, cig, cib, c_t, c_code, c_valid,
                       t_full, code_full, d: int, rel_thresh: float):
    """Geometry-aware (Hc,Wc) -> (H,W) upsample of the strided GI gather.

    Bilinear weights x validity x similarity (same face normal, hit
    distance within a relative threshold); where no similar coarse sample
    exists, falls back to validity-weighted bilinear (GI is additive
    low-frequency light - a slightly blurred fallback beats a black halo).
    """
    off = d // 2
    hc, wc = cir.shape
    fy = _phase_frac(hc, d, off)[:, None]
    fx = _phase_frac(wc, d, off)[None, :]
    chans = (cir, cig, cib)
    num1 = [0.0, 0.0, 0.0]
    num2 = [0.0, 0.0, 0.0]
    den1 = jnp.zeros_like(t_full)
    den2 = jnp.zeros_like(t_full)
    for dy in (0, 1):
        wy = fy if dy else 1.0 - fy
        for dx in (0, 1):
            wx_ = fx if dx else 1.0 - fx

            def ex(c, dy=dy, dx=dx):
                e = _phase_expand(c, d, off, dy, 0)
                return _phase_expand(e, d, off, dx, 1)

            wb = wy * wx_ * ex(c_valid).astype(_F32)
            et = ex(c_t)
            sim = (ex(c_code) == code_full) \
                & (jnp.abs(et - t_full)
                   <= _F32(rel_thresh) * t_full + _F32(2.0))
            w1 = wb * sim.astype(_F32)
            den1 = den1 + w1
            den2 = den2 + wb
            for k in range(3):
                e = ex(chans[k])
                num1[k] = num1[k] + w1 * e
                num2[k] = num2[k] + wb * e
    use1 = den1 > 1e-4
    use2 = den2 > 1e-4
    out = []
    for k in range(3):
        v1 = num1[k] / jnp.maximum(den1, 1e-6)
        v2 = num2[k] / jnp.maximum(den2, 1e-6)
        out.append(jnp.where(use1, v1, jnp.where(use2, v2, 0.0)))
    return out[0], out[1], out[2]


def gather_gi_image(res, gi, sdf, cfg, rcfg, lcfg, gi_occ=None):
    """Per-pixel indirect light for a traced frame.

    The reference cone-marches every pixel (``StateRender.cu:100-127``).
    Here, with ``gi_res_divisor`` > 1, cones march every Nth pixel and the
    result is geometry-aware-upsampled: GI is low-frequency, and cone
    gathers are the dominant frame cost on TPU (measured ~2.8s/frame at
    720p full-res vs ~0.1s strided).
    """
    cone_tbl = None
    if rcfg.gi_fused_cone:
        occ = gi_occ if gi_occ is not None \
            else gi_grid.build_occlusion(sdf, cfg)
        cone_tbl = gi_grid.make_cone_table(gi, occ)
    h, w = res.hit.shape
    d = rcfg.gi_res_divisor
    while d > 1 and (h % d or w % d):
        d //= 2
    hpos = (res.px, res.py, res.pz)
    normal = (res.nx, res.ny, res.nz)
    if d <= 1:
        return shading.gather_gi(hpos, normal, gi, sdf, cfg, lcfg,
                                 cone_table=cone_tbl)
    off = d // 2

    def sub(a):
        return a[off::d, off::d]

    cir, cig, cib = shading.gather_gi(
        tuple(sub(a) for a in hpos), tuple(sub(a) for a in normal),
        gi, sdf, cfg, lcfg, cone_table=cone_tbl)
    code = _normal_code(res.nx, res.ny, res.nz)
    return _gi_joint_upsample(cir, cig, cib, sub(res.t), sub(code),
                              sub(res.hit), res.t, code, d,
                              rcfg.gi_depth_threshold)


def checker_select(a: jnp.ndarray, parity, y0=0) -> jnp.ndarray:
    """(H, W) -> (H, W/2): keep each row's checkerboard-active columns.

    Row ``y`` (global index ``y0 + row``) keeps columns ``x = 2j + off``
    with ``off = (y + parity) & 1`` - the alternating half of the pixels a
    checkerboard frame actually traces.  ``parity`` may be traced."""
    h = a.shape[0]
    off = ((jnp.arange(h, dtype=jnp.int32) + jnp.asarray(y0, jnp.int32)
            + jnp.asarray(parity, jnp.int32)) & 1)
    off = off.reshape((h,) + (1,) * (a.ndim - 1))
    return jnp.where(off == 0, a[:, 0::2], a[:, 1::2])


# Dispatch order for the 4-phase quarter interleave: visit the 2x2 quad
# DIAGONALLY ((0,0), (1,1), (0,1), (1,0)) so any two consecutive frames
# form a complete checkerboard and any four the full grid.  The raster
# order (0,1,2,3) covers only one quad ROW after two frames, so the
# accumulator's 2-frame coverage is anisotropic and static convergence
# measurably slower (probe_checker_motion --script mixed).  Pure dispatch
# policy - quarter_select/expand/valid are phase-value-based and order-
# independent.
QUARTER_PHASE_ORDER = (0, 3, 1, 2)


def quarter_select(a: jnp.ndarray, phase) -> jnp.ndarray:
    """(H, W[, C]) -> (H/2, W/2[, C]): keep pixels with ``y & 1 ==
    phase >> 1`` and ``x & 1 == phase & 1`` - the quarter of the pixels a
    4-phase interleaved frame traces (the quarter-rate analog of the
    checkerboard; DLSS-Ultra-Performance-class rate cutting under the
    temporal accumulator).  ``phase`` (0..3) may be traced."""
    h, w = a.shape[0], a.shape[1]
    py = (jnp.asarray(phase, jnp.int32) >> 1) & 1
    px = jnp.asarray(phase, jnp.int32) & 1
    a4 = a.reshape((h // 2, 2, w // 2, 2) + a.shape[2:])
    return a4[:, py, :, px]


def quarter_expand(q: jnp.ndarray, phase=None) -> jnp.ndarray:
    """(H/2, W/2[, C]) -> (H, W[, C]) nearest fill.

    ``q[i, j]`` lands on all four pixels of its 2x2 quad, so the traced
    pixel (2i + py, 2j + px) carries its exact value for EVERY phase -
    the expand is phase-independent; the accumulator's validity mask
    (``quarter_valid_mask``) is what down-weights the three copies."""
    return jnp.repeat(jnp.repeat(q, 2, axis=0), 2, axis=1)


def quarter_valid_mask(height: int, width: int, phase) -> jnp.ndarray:
    """(H, W) bool: True where this 4-phase frame traced a pixel."""
    py = (jnp.asarray(phase, jnp.int32) >> 1) & 1
    px = jnp.asarray(phase, jnp.int32) & 1
    ys = jnp.arange(height, dtype=jnp.int32)[:, None]
    xs = jnp.arange(width, dtype=jnp.int32)[None, :]
    return ((ys & 1) == py) & ((xs & 1) == px)


def _shift_cols(a: jnp.ndarray, delta: int) -> jnp.ndarray:
    """Edge-clamped static column shift: out[:, j] = a[:, clip(j+delta)]."""
    if delta == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[1] = (max(-delta, 0), max(delta, 0))
    p = jnp.pad(a, pad, mode="edge")
    lo = max(delta, 0)
    return jax.lax.slice_in_dim(p, lo, lo + a.shape[1], axis=1)


def _shift_rows(a: jnp.ndarray, delta: int) -> jnp.ndarray:
    if delta == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[0] = (max(-delta, 0), max(delta, 0))
    p = jnp.pad(a, pad, mode="edge")
    lo = max(delta, 0)
    return jax.lax.slice_in_dim(p, lo, lo + a.shape[0], axis=0)


def checker_expand(half: jnp.ndarray, parity, y0=0) -> jnp.ndarray:
    """(H, W/2[, C]) checkerboard buffer -> (H, W[, C]) full frame.

    Traced pixels keep their exact values; the untraced half is filled
    with the average of its 4 traced neighbors (left/right in the same
    row, up/down in the adjacent rows - all traced by construction of the
    checkerboard), edge-clamped.  The fill is a placeholder the temporal
    accumulator immediately down-weights (``temporal_upscale(valid=...)``)
    wherever real history exists - the static-scene steady state contains
    NO filled pixels, only samples."""
    h, w2 = half.shape[0], half.shape[1]
    off = ((jnp.arange(h, dtype=jnp.int32) + jnp.asarray(y0, jnp.int32)
            + jnp.asarray(parity, jnp.int32)) & 1)
    off = off.reshape((h,) + (1,) * (half.ndim - 1))
    up = _shift_rows(half, -1)
    down = _shift_rows(half, 1)
    vert = up + down
    # off == 0 (traced at even x): untraced odd x' = 2j+1 between half
    # cols j and j+1; off == 1: untraced even x' = 2j between j-1 and j
    fill0 = (half + _shift_cols(half, 1) + vert) * _F32(0.25)
    fill1 = (_shift_cols(half, -1) + half + vert) * _F32(0.25)
    fill = jnp.where(off == 0, fill0, fill1)
    evens = jnp.where(off == 0, half, fill)
    odds = jnp.where(off == 0, fill, half)
    out = jnp.stack([evens, odds], axis=2)
    return out.reshape((h, 2 * w2) + half.shape[2:])


def checker_valid_mask(height: int, width: int, parity) -> jnp.ndarray:
    """(H, W) bool: True where this checkerboard frame traced a pixel
    (``(x + y + parity) & 1 == 0``)."""
    ys = jnp.arange(height, dtype=jnp.int32)[:, None]
    xs = jnp.arange(width, dtype=jnp.int32)[None, :]
    return ((xs + ys + jnp.asarray(parity, jnp.int32)) & 1) == 0


def render_slab(bits, sdf, gi, atlas, cam: CameraArrays,
                ecfg: EngineConfig, y0, slab_h: int,
                include_gi: bool = True, gi_occ=None,
                sky_y=None, table=None,
                return_gbuffer: bool = False, trace_fn=None,
                checker_parity=None, quarter_phase=None, hint_half=None,
                hint_full=None, start_override=None,
                shadow_override=None) -> FrameOutputs:
    """Render rows [y0, y0 + slab_h) of the frame.

    ``start_override``/``shadow_override``: precomputed full-res
    conservative start distances / shadow factors for this slab - the
    prepass is skipped entirely (the split-dispatch experiment: the fused
    GI frame measurably lands XLA's slow schedule while split stages land
    the fast one, PERF.md "schedule lottery").  The returned half_dist/
    half_shadow are then placeholders.

    The unit of pixel-parallel work: a full frame is one slab; a sharded
    frame is one slab per device (parallel/sharding.py), each recomputing a
    1-row half-res halo instead of exchanging boundaries - cheaper than a
    collective for a 2x-downsampled prepass.  ``y0`` must be even.

    ``checker_parity`` (traced i32 0/1, or None): checkerboard rendering -
    trace only the pixels with ``(x + y + parity) & 1 == 0`` (half the
    lanes; the alternating-frame rate halving DLSS-class pipelines use
    under a temporal accumulator).  Outputs come back HALF-width (H, W/2);
    the caller expands with ``checker_expand`` after any deferred GI
    composite and passes ``checker_valid_mask`` to the upscaler.  A
    deliberate, quality-gated deviation from renderKernel's every-pixel
    contract (StateRender.cu:200-253).

    ``hint_half`` / ``hint_full``: optional FULL-FRAME conservative
    start-distance maps from the previous frame (``temporal_start_hint``
    at the (half_height, half_width) prepass grid / the (height, width)
    primary grid); maximum-combined with the same-frame cascade/minDist
    starts.
    """
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    w, h = rcfg.width, slab_h

    # the combined tracer gather table should be built ONCE per world
    # (brick repack + ~260 MB materialization at 1024^3 scale) and passed
    # in; building here keeps ad-hoc callers working
    if trace_fn is None:
        trace_fn = make_trace_fn(bits, sdf, cfg, rcfg, table=table,
                                 sky_y=sky_y)

    # ---- 1+2: prepass (with halo) and conservative upsamples ----
    pd = rcfg.prepass_divisor
    assert slab_h % pd == 0, \
        f"slab height {slab_h} not divisible by prepass_divisor {pd}"
    hy0 = jnp.asarray(y0, jnp.int32) // pd - 1
    # pad the halo'd row count up to a multiple of the row-tile target:
    # slab_h//2 + 2 is often nearly prime (720p full frame -> 362 = 2*181),
    # which leaves the tracer a single giant row tile and forfeits tile
    # retirement; the extra rows duplicate the clamped bottom edge and are
    # sliced off below
    hneed = slab_h // pd + 2
    t = max(rcfg.trace_tile_rows, 1)
    hrows = -(-hneed // t) * t
    shadow_decoupled = (lcfg.soft_shadows
                        and rcfg.shadow_site_divisor > 0
                        and shadow_override is None)
    if start_override is not None and shadow_override is None:
        # the prepass is skipped, so a prepass-COUPLED shadow config
        # (hard shadows, or soft with shadow_site_divisor == 0) would
        # silently light every pixel with the all-ones placeholder below
        assert shadow_decoupled, (
            "start_override without shadow_override requires decoupled "
            "shadow sites (lighting.soft_shadows and "
            "render.shadow_site_divisor > 0); pass shadow_override or "
            "decouple the shadows")
    if start_override is not None:
        # precomputed starts/shadows (split-dispatch callers): skip the
        # prepass; placeholder half buffers keep the output contract
        half_dist = jnp.zeros((hneed, rcfg.half_width), _F32)
        half_shadow = jnp.ones_like(half_dist)
    else:
        half_dist, half_shadow = half_res_prepass(
            bits, sdf, cfg, rcfg, lcfg, cam, hy0=hy0, hrows=hrows,
            trace_fn=trace_fn, sky_y=sky_y, start_hint=hint_half,
            want_shadow=not shadow_decoupled)
    half_dist = half_dist[:hneed]
    half_shadow = half_shadow[:hneed]
    if start_override is not None:
        start_dist = start_override
    else:
        start_dist = _min_dist_upsample_slab(half_dist, slab_h, d=pd)
    # Deliberate quirk fix (SURVEY app. B class, like the c_cam jitter
    # fix): clamp the conservative start at the camera.  The reference
    # feeds minDist's ``dist - 8`` to trace() unclamped
    # (StateRender.cu:228-233), so rays whose prepass distance is under
    # the bias march from BEHIND the camera - which can back the origin
    # out of the world near its bounds (approximateCSDF OOB -> miss,
    # raytracing_functions.cu:69-71) or exhaust the 5-major-iteration
    # budget on the longer march (miss after 5 majors, line 105) - both
    # unreachable in the reference's 4096x512x4096 world but real at
    # small worlds/near-top poses (probe_prepass_d4: 14-163 flipped hits
    # per frame).  A start of 0 can never overshoot, so the clamp is
    # strictly conservative; the cascade start was already clamped
    # (``_cascade_start``), this makes the two start tiers consistent.
    # Mirrored in the scalar oracle (tests/golden/scalar_render.py).
    start_dist = jnp.maximum(start_dist, _F32(0.0))
    if hint_full is not None:
        start_dist = jnp.maximum(
            start_dist, _take_rows(hint_full, y0, slab_h, rcfg.height))
    if shadow_override is not None:
        shadow_full = shadow_override
    else:
        shadow_full = (None if shadow_decoupled else
                       _bilinear_upsample_slab(half_shadow, slab_h, d=pd))

    # ---- 3: full-res primary ----
    dx, dy, dz = _ray_dirs(cam, w, rcfg.height, pixel_center=False,
                           y0=y0, rows=slab_h)
    if checker_parity is not None:
        sel = lambda a: checker_select(a, checker_parity, y0=y0)  # noqa: E731
        dx, dy, dz = sel(dx), sel(dy), sel(dz)
        start_dist = sel(start_dist)
        if shadow_full is not None:
            shadow_full = sel(shadow_full)
    elif quarter_phase is not None:
        # 4-phase interleave: trace one pixel per 2x2 quad per frame
        # (quarter_select; the accumulator fills from history + the
        # validity mask).  Same quality-gated family as the checkerboard,
        # at half its per-frame ray budget.
        sel = lambda a: quarter_select(a, quarter_phase)  # noqa: E731
        dx, dy, dz = sel(dx), sel(dy), sel(dz)
        start_dist = sel(start_dist)
        if shadow_full is not None:
            shadow_full = sel(shadow_full)
    res = trace_fn(cam.pos[0] + jnp.zeros_like(dx), cam.pos[1], cam.pos[2],
                   dx, dy, dz, start_dist)
    hit = res.hit
    hpos = (res.px, res.py, res.pz)
    normal = (res.nx, res.ny, res.nz)
    d = (dx, dy, dz)
    sun = vm.splat(lcfg.sun_dir, hit.shape)

    if shadow_decoupled:
        # SDF penumbra march from every s-th TRUE primary hit (see
        # RenderConfig.shadow_site_divisor); sites live on the post-
        # checker grid, so under checkerboarding neighbor sites alternate
        # world parity - penumbras are smooth, image-gated like the
        # prepass-coupled stride.
        # Slab anchoring: sites subsample at [::ssd] from the SLAB's row
        # 0, so global site phase is consistent across sharded slabs only
        # when slab_h % ssd == 0 (then y0 = k*slab_h is always a site
        # row) - asserted here; the residual slab effect is the
        # _expand_even bottom-edge clamp on each slab's last ssd-1 rows
        # (clamped to the slab's final site instead of interpolating into
        # the next slab).  Shadows are smooth, so the seam is image-gated
        # (tests/test_sharding.py::test_sharded_decoupled_shadow_seam).
        ssd = rcfg.shadow_site_divisor
        assert hit.shape[0] % ssd == 0, (
            f"post-rate slab rows {hit.shape[0]} not divisible by "
            f"shadow_site_divisor {ssd}: sharded slabs would sample "
            f"shadow sites at inconsistent global phases")
        sub = lambda a: a[::ssd, ::ssd]  # noqa: E731
        q = shading.soft_shadow_march(
            sub(res.px), sub(res.py), sub(res.pz),
            sub(res.nx), sub(res.ny), sub(res.nz), sub(res.hit),
            sdf, cfg, lcfg, sky_y=sky_y)
        shadow_full = _expand_even(q, ssd, hit.shape)

    # ---- 4a: water path (StateRender.cu:53-87) ----
    # the two secondary traces are skipped entirely (lax.cond) when no
    # water pixel is visible: even fully-parked wavefront traces cost
    # ~100 ms at 720p in per-tile loop overhead
    is_water = hit & (res.py < _F32(lcfg.water_level))

    def water_branch(_):
        wnormal = shading.water_normal(hpos, normal, cam.time, lcfg)
        refl_dir = vm.reflect(d, wnormal)
        rox = jnp.where(is_water, res.px, _F32(-10.0))
        roy = jnp.where(is_water, res.py, _F32(-10.0))
        roz = jnp.where(is_water, res.pz, _F32(-10.0))
        refl = trace_fn(rox, roy, roz,
                        refl_dir[0], refl_dir[1], refl_dir[2],
                        jnp.full(hit.shape, 0.001, _F32))
        refl_albedo = vm.v3(*atlas_mod.sample_texture(
            atlas, refl.uv_u, refl.uv_v, refl.px, refl.py, refl.pz))
        refl_shadow_hit = _shadow_trace(
            trace_fn, is_water & refl.hit,
            (refl.px, refl.py, refl.pz), (refl.nx, refl.ny, refl.nz), sun,
            offset=1e-3)
        refl_solid_col = vm.where(refl_shadow_hit,
                                  vm.scale(refl_albedo, 0.1), refl_albedo)
        refl_col = vm.where(refl.hit, refl_solid_col,
                            shading.sample_sky(refl_dir, lcfg))
        n_dot_v = jnp.maximum(vm.dot(normal, vm.scale(d, -1.0)), 0.0)
        fresnel = shading.fresnel_schlick(n_dot_v,
                                          _F32(lcfg.water_reflectivity))
        return vm.lerp(vm.splat(lcfg.water_color, hit.shape), refl_col,
                       fresnel)

    def no_water(_):
        z = jnp.zeros_like(res.px)
        return (z, z, z)

    water_col = jax.lax.cond(jnp.any(is_water), water_branch, no_water,
                             None)

    # ---- 4b: solid path (StateRender.cu:88-131) ----
    albedo = vm.v3(*atlas_mod.sample_texture(atlas, res.uv_u, res.uv_v,
                                             res.px, res.py, res.pz))
    diffuse = jnp.maximum(vm.dot(normal, sun), 0.0)
    direct = vm.scale(albedo, diffuse * shadow_full)
    solid_col = direct
    if include_gi:
        ir, ig, ib = gather_gi_image(res, gi, sdf, cfg, rcfg, lcfg,
                                     gi_occ=gi_occ)
        indirect = vm.mul(vm.v3(ir, ig, ib),
                          vm.scale(albedo, _F32(lcfg.gi_strength)))
        ambient = vm.mul(shading.sample_sky(normal, lcfg),
                         vm.scale(albedo, _F32(lcfg.ambient_strength)))
        solid_col = vm.add(vm.add(direct, indirect), ambient)

    # ---- 4c: miss path + composition ----
    sky_col = shading.sample_sky(d, lcfg)
    color = vm.where(is_water, water_col,
                     vm.where(hit, solid_col, sky_col))

    # ---- fog (StateRender.cu:140-145) ----
    dist = vm.length(vm.sub(hpos, (cam.pos[0], cam.pos[1], cam.pos[2])))
    fog_t = jnp.where(hit, jnp.exp(-dist * _F32(lcfg.fog_density)),
                      _F32(1.0))
    fog_col = vm.splat(lcfg.fog_color, fog_t.shape)
    color = vm.add(vm.scale(color, fog_t), vm.scale(fog_col, 1.0 - fog_t))

    # ---- 5: motion vectors + depth (StateRender.cu:234-252) ----
    ones = jnp.ones_like(res.px)
    prev_clip = vm.mat_mul_vec4(cam.prev_vp, (res.px, res.py, res.pz, ones))
    cur_clip = vm.mat_mul_vec4(cam.vp, (res.px, res.py, res.pz, ones))
    both_front = (prev_clip[3] > 0.0) & (cur_clip[3] > 0.0)
    # miss pixels get the motion of a point at INFINITY along the ray
    # (w = 0 through the VP matrices): exact for sky under rotation, and
    # translation does not move infinity.  The reference leaves miss
    # motion at zero, which is wrong under rotation - DLSS-class temporal
    # upscalers then warp sky history incorrectly and must clamp the
    # misalignment away (measured: the accumulator's sky/still detector
    # reads rotating sky as "still" and ghosts).
    zeros = jnp.zeros_like(res.px)
    prev_inf = vm.mat_mul_vec4(cam.prev_vp, (dx, dy, dz, zeros))
    cur_inf = vm.mat_mul_vec4(cam.vp, (dx, dy, dz, zeros))
    inf_front = (prev_inf[3] > 0.0) & (cur_inf[3] > 0.0)
    mv_inf_x = jnp.where(inf_front,
                         cur_inf[0] / cur_inf[3] - prev_inf[0] / prev_inf[3],
                         0.0)
    mv_inf_y = jnp.where(inf_front,
                         cur_inf[1] / cur_inf[3] - prev_inf[1] / prev_inf[3],
                         0.0)
    mv_x = jnp.where(hit & both_front,
                     cur_clip[0] / cur_clip[3] - prev_clip[0] / prev_clip[3],
                     jnp.where(hit, 0.0, mv_inf_x))
    mv_y = jnp.where(hit & both_front,
                     cur_clip[1] / cur_clip[3] - prev_clip[1] / prev_clip[3],
                     jnp.where(hit, 0.0, mv_inf_y))
    depth = jnp.where(hit & (cur_clip[3] > 0.0),
                      cur_clip[2] / cur_clip[3], _F32(1.0))

    color_img = jnp.clip(jnp.stack(color, axis=-1), 0.0, 1.0)
    motion = jnp.stack([mv_x, -mv_y], axis=-1)
    out = FrameOutputs(color=color_img, motion=motion, depth=depth,
                       half_dist=half_dist[1:-1],
                       half_shadow=half_shadow[1:-1])
    if return_gbuffer:
        gb = GBuffer(hit=hit, px=res.px, py=res.py, pz=res.pz,
                     nx=res.nx, ny=res.ny, nz=res.nz, t=res.t,
                     albedo_r=albedo[0], albedo_g=albedo[1],
                     albedo_b=albedo[2], fog=fog_t)
        return out, gb
    return out


def render_frame(bits, sdf, gi, atlas, cam: CameraArrays,
                 ecfg: EngineConfig, include_gi: bool = True,
                 gi_occ=None, sky_y=None, table=None,
                 return_gbuffer: bool = False, trace_fn=None,
                 checker_parity=None, quarter_phase=None, hint_half=None,
                 hint_full=None, start_override=None,
                 shadow_override=None) -> FrameOutputs:
    """Full frame = one slab covering every row."""
    return render_slab(bits, sdf, gi, atlas, cam, ecfg,
                       y0=jnp.int32(0), slab_h=ecfg.render.height,
                       include_gi=include_gi, gi_occ=gi_occ, sky_y=sky_y,
                       table=table, return_gbuffer=return_gbuffer,
                       trace_fn=trace_fn, checker_parity=checker_parity,
                       quarter_phase=quarter_phase,
                       hint_half=hint_half, hint_full=hint_full,
                       start_override=start_override,
                       shadow_override=shadow_override)


def gi_composite(color, gb: GBuffer, gi, sdf, ecfg: EngineConfig,
                 gi_occ=None, return_addend: bool = False):
    """Add cone-traced indirect + sky ambient onto a GI-less base color.

    The split-dispatch half of the GI frame: ``render_frame(include_gi=
    False, return_gbuffer=True)`` in one jit, this in a second.  Measured
    on v5e (512^3, 720p): the fused GI frame compiles to a slow schedule
    (~830 ms) while base (354 ms) + this (146 ms) both land the fast one -
    a 1.66x frame win for the same math (PERF.md).  Matches the fused
    ``include_gi=True`` output to float addition-order (the added light is
    scaled by the same fog transmittance the base was composited with; the
    base's [0,1] clip is a no-op on lit solid pixels, which never exceed
    1.0 pre-GI).
    """
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    ir, ig, ib = gather_gi_image(gb, gi, sdf, cfg, rcfg, lcfg,
                                 gi_occ=gi_occ)
    albedo = (gb.albedo_r, gb.albedo_g, gb.albedo_b)
    normal = (gb.nx, gb.ny, gb.nz)
    indirect = vm.mul(vm.v3(ir, ig, ib),
                      vm.scale(albedo, _F32(lcfg.gi_strength)))
    ambient = vm.mul(shading.sample_sky(normal, lcfg),
                     vm.scale(albedo, _F32(lcfg.ambient_strength)))
    solid = gb.hit & ~(gb.py < _F32(lcfg.water_level))
    scale = jnp.where(solid, gb.fog, _F32(0.0))
    add = jnp.stack(vm.scale(vm.add(indirect, ambient), scale), axis=-1)
    out = jnp.clip(color + add, 0.0, 1.0)
    if return_addend:
        # the added-light image, for cross-frame reuse (bench GI-composite
        # cadence: indirect light is low-frequency and geometry-attached,
        # so re-adding last frame's addend to the next base frame is a
        # quality-gated amortization - probe_checker_motion measures it)
        return out, add
    return out
