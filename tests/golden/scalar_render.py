"""Scalar golden model of the full no-GI render pipeline.

Per-pixel Python loops over the scalar tracer + scalar noise goldens,
mirroring ``render/pipeline.render_frame(include_gi=False)`` stage by stage
(cascade start -> half-res prepass -> conservative upsample -> full-res
primary -> water/solid/miss shading -> fog).  The physics (tracing, block-ID
noise, atlas sampling, Fresnel, fog) is computed scalar and independent; the
pure index-plumbing upsamples (``_min_expand_axis``/``_min_dist_upsample_
slab``/``_bilinear_upsample_slab``) are replicated with small numpy
equivalents.

Used by the image-level PSNR gate in tests/test_render.py (SURVEY.md §4:
"images within 1% PSNR of the CUDA reference" - the reference here being
reference-semantics scalar code).
"""

from __future__ import annotations

import math

import numpy as np

from tests.golden import scalar_noise as sn
from tests.golden import scalar_trace as st

F = np.float32


def _norm3(v):
    l = math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    return (v[0] / l, v[1] / l, v[2] / l)


def sample_sky(d, lcfg):
    sun = lcfg.sun_dir
    sd = d[0] * sun[0] + d[1] * sun[1] + d[2] * sun[2]
    if sd > lcfg.sun_disc_cos:
        return np.array(lcfg.sun_color, F)
    t = min(max(0.5 * (d[1] + 1.0), 0.0), 1.0)
    h = np.array(lcfg.sky_horizon, F)
    z = np.array(lcfg.sky_zenith, F)
    return h + (z - h) * F(t)


def select_tile(px, py, pz):
    """Scalar twin of atlas.select_tile (raytracing_functions.cu:41-54)."""
    freq = F(0.05)
    fx, fy, fz = F(np.floor(px)), F(np.floor(py)), F(np.floor(pz))
    e1 = sn.simplex3d(fx * freq, fy * freq, fz * freq)
    f2 = freq * F(0.3)
    e2 = sn.simplex3d(F(np.floor(F(px + F(121.3)))) * f2,
                      F(np.floor(F(py + F(1321.3)))) * f2,
                      F(np.floor(F(pz + F(721.5)))) * f2)
    ev = F(e1) * F(0.4) + F(e2) * F(0.6)
    from rvgrt_tpu.world import atlas as am

    tiles = [
        (-1.3, am.TILE_STONE), (-1.2, am.TILE_DIAMOND), (-0.7, am.TILE_IRON),
        (0.0, am.TILE_STONE), (0.1, am.TILE_COAL), (0.4, am.TILE_COBBLE),
        (0.8, am.TILE_DIRT), (1.2, am.TILE_STONE2),
    ]
    pick = am.TILE_STONE
    for thresh, tile in tiles:
        if ev < thresh:
            pick = tile
            break
    return pick[0] / 16.0, pick[1] / 16.0


def sample_texture(atlas_rgb, uv_u, uv_v, px, py, pz):
    """atlas_rgb: (256, 256, 3) f32 in the stored (u-major) orientation."""
    tu, tv = select_tile(px, py, pz)
    u = F(uv_u) * F(1.0 / 16.0) + F(tu)
    v = F(uv_v) * F(1.0 / 16.0) + F(tv)
    up = int(F(u) * 256) & 255
    vp = int(F(v) * 256) & 255
    return atlas_rgb[up, vp]


def water_normal(pos, normal, time, lcfg):
    nx_w = sn.fbm3d(pos[0], pos[2], time, 3, 0.06, 2.0, 0.6)
    ny_w = sn.fbm3d(pos[2], pos[0], F(time) + F(112.0), 3, 0.06, 2.0, 0.6)
    d = (normal[0] + F(nx_w) * F(0.1), normal[1] + F(ny_w) * F(0.1),
         normal[2])
    l = math.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    if l <= 1e-8:
        return (1.0, 0.0, 0.0)
    return (d[0] / l, d[1] / l, d[2] / l)


def _shadow_hit(world, pos, normal, sun, offset):
    o = (F(pos[0] + normal[0] * offset), F(pos[1] + normal[1] * offset),
         F(pos[2] + normal[2] * offset))
    return st.trace(world, o, sun, 0.0).hit


def _soft_shadow(world, lcfg, pos, normal, sun, sky_y):
    """Scalar twin of shading.soft_shadow_march (same constants)."""
    c = float(world.c)
    o = tuple(F(pos[k] + normal[k] * 1.25 * c) for k in range(3))
    t, rs = 2.0 * c, 1.0
    for _ in range(lcfg.soft_shadow_steps):
        p = tuple(F(o[k] + sun[k] * t) for k in range(3))
        if p[1] >= sky_y or t > lcfg.soft_shadow_max_t:
            break
        h = float(world.sdf_at_voxel(int(math.floor(p[0])),
                                     int(math.floor(p[1])),
                                     int(math.floor(p[2])))) * c
        rs = min(rs, lcfg.sun_softness * h / t)
        if rs <= 0.01:
            break
        t += max(h, 1.5)
    sf = lcfg.shadow_factor
    return F(sf + (1.0 - sf) * min(max(rs, 0.0), 1.0))


def render_frame_scalar(world: st.ScalarWorld, atlas_rgb, cam_pos, forward,
                        right, up, ecfg, time: float = 0.0):
    """(H, W, 3) float32 color image, no GI, zero jitter."""
    rcfg, lcfg = ecfg.render, ecfg.lighting
    W, H = rcfg.width, rcfg.height
    hw, hh = rcfg.half_width, rcfg.half_height
    sun = lcfg.sun_dir
    # 1 + highest solid y (voxel_grid.sky_limit semantics)
    _y_any = world.solid.any(axis=(0, 2))
    sky_y = float(_y_any.nonzero()[0].max() + 1) if _y_any.any() else 0.0

    def ray_dir(u01, v01):
        ndc_x = F(u01) * 2.0 - 1.0
        ndc_y = F(v01) * 2.0 - 1.0
        d = tuple(F(forward[k] + ndc_x * right[k] + ndc_y * up[k])
                  for k in range(3))
        return _norm3(d)

    def trace_q(d, t0):
        return st.trace(world, cam_pos, d, t0)

    def hit_dist(h):
        if not h.hit:
            return F(rcfg.miss_distance)
        dx = h.pos[0] - cam_pos[0]
        dy = h.pos[1] - cam_pos[1]
        dz = h.pos[2] - cam_pos[2]
        return F(math.sqrt(dx * dx + dy * dy + dz * dz))

    # ---- cascade start for the half-res prepass ----
    t = max(rcfg.trace_tile_rows, 1)
    hneed = H // 2 + 2
    hrows = -(-hneed // t) * t
    hy0 = -1
    q = rcfg.prepass_cascade
    while q > 1 and hw % q:
        q //= 2
    if q > 1:
        off = q // 2
        crows = -(-hrows // q) + 1
        ccols = hw // q
        cdist = np.zeros((crows, ccols), F)
        for i in range(crows):
            ly = min(max(off + q * i, 0), hrows - 1)
            gy = min(max(hy0 + ly, 0), hh - 1)
            for j in range(ccols):
                lx = min(max(off + q * j, 0), hw - 1)
                d = ray_dir((lx + 0.5) / hw, (gy + 0.5) / hh)
                cdist[i, j] = hit_dist(trace_q(d, 0.0))
        # conservative min-expand: out[y] = min over delta in {-1,0,1,2} of
        # coarse[clip(i0(y) + delta)] with i0(y) = floor((y - off) / q)
        # (numpy twin of pipeline._min_expand_axis / _phase_expand)
        def min_expand(c, n_out, axis):
            nc = c.shape[axis]
            out = None
            for y_idx in range(n_out):
                i0 = (y_idx - off) // q if y_idx >= off else -1
                vals = [np.take(c, min(max(i0 + dlt, 0), nc - 1), axis=axis)
                        for dlt in (-1, 0, 1, 2)]
                v = np.minimum(np.minimum(vals[0], vals[1]),
                               np.minimum(vals[2], vals[3]))
                v = np.expand_dims(v, axis)
                out = v if out is None else np.concatenate([out, v], axis)
            return out

        m = min_expand(cdist, hrows, 0)
        m = min_expand(m, hw, 1)
        start_half = np.maximum(m - F(rcfg.dist_bias), 0.0).astype(F)
    else:
        start_half = np.zeros((hrows, hw), F)

    # ---- half-res prepass: dist - 8 (miss 300) + shadow factor ----
    # only rows < hneed are consumed downstream (the pipeline's extra
    # tile-padding rows are duplicates it slices off); skip tracing them
    half_dist = np.zeros((hrows, hw), F)
    half_shadow = np.ones((hrows, hw), F)
    for i in range(hneed):
        gy = min(max(hy0 + i, 0), hh - 1)
        for j in range(hw):
            d = ray_dir((j + 0.5) / hw, (gy + 0.5) / hh)
            h = st.trace(world, cam_pos, d, start_half[i, j])
            half_dist[i, j] = hit_dist(h) - F(rcfg.dist_bias)
            if getattr(lcfg, "soft_shadows", False):
                if h.hit:
                    half_shadow[i, j] = _soft_shadow(
                        world, lcfg, h.pos, h.normal, sun, sky_y)
            elif h.hit and _shadow_hit(world, h.pos, h.normal, sun, 1e-1):
                half_shadow[i, j] = F(lcfg.shadow_factor)

    # ---- conservative min 2x2 + separable bilinear upsample (plumbing) ----
    pad = np.pad(half_dist, ((0, 0), (0, 1)), mode="edge")
    m2 = np.minimum(np.minimum(pad[:-1, :-1], pad[:-1, 1:]),
                    np.minimum(pad[1:, :-1], pad[1:, 1:]))
    # clamped at the camera like the pipeline (deliberate quirk fix: the
    # reference feeds dist-8 unclamped, see render/pipeline.py render_slab)
    start_full = np.maximum(
        np.repeat(np.repeat(m2[1:1 + H // 2], 2, 0), 2, 1), F(0.0))

    a = half_shadow
    prevx = np.concatenate([a[:, :1], a[:, :-1]], axis=1)
    ax = np.stack([F(0.5) * (prevx + a), a], axis=2).reshape(a.shape[0],
                                                            hw * 2)
    nh = H // 2
    shadow_full = np.stack([F(0.5) * (ax[0:nh] + ax[1:nh + 1]),
                            ax[1:nh + 1]], axis=1).reshape(H, ax.shape[1])

    # ---- full-res primary + shading ----
    img = np.zeros((H, W, 3), F)
    n_hit = n_water = 0
    for y in range(H):
        for x in range(W):
            d = ray_dir(x / W, y / H)
            h = st.trace(world, cam_pos, d, start_full[y, x])
            n_hit += int(h.hit)
            n_water += int(h.hit and h.pos[1] < lcfg.water_level)
            if not h.hit:
                col = sample_sky(d, lcfg)
            elif h.pos[1] < lcfg.water_level:
                wn = water_normal(h.pos, h.normal, time, lcfg)
                # vm.reflect: r = d - 2*dot(d,n)*n, no re-normalization
                k2 = F(2.0) * F(d[0] * wn[0] + d[1] * wn[1] + d[2] * wn[2])
                rd = tuple(F(d[k] - k2 * wn[k]) for k in range(3))
                rh = st.trace(world, h.pos, rd, 0.001)
                if rh.hit:
                    alb = sample_texture(atlas_rgb, rh.uv[0], rh.uv[1],
                                         rh.pos[0], rh.pos[1], rh.pos[2])
                    if _shadow_hit(world, rh.pos, rh.normal, sun, 1e-3):
                        rcol = alb * F(0.1)
                    else:
                        rcol = alb
                else:
                    rcol = sample_sky(rd, lcfg)
                ndv = max(-(h.normal[0] * d[0] + h.normal[1] * d[1]
                            + h.normal[2] * d[2]), 0.0)
                base_r = F(lcfg.water_reflectivity)
                fres = base_r + (1.0 - base_r) * F(1.0 - ndv) ** 5
                wc = np.array(lcfg.water_color, F)
                col = wc + (rcol - wc) * F(fres)
            else:
                alb = sample_texture(atlas_rgb, h.uv[0], h.uv[1],
                                     h.pos[0], h.pos[1], h.pos[2])
                diffuse = max(h.normal[0] * sun[0] + h.normal[1] * sun[1]
                              + h.normal[2] * sun[2], 0.0)
                col = alb * F(diffuse) * shadow_full[y, x]
            if h.hit:
                dx_ = h.pos[0] - cam_pos[0]
                dy_ = h.pos[1] - cam_pos[1]
                dz_ = h.pos[2] - cam_pos[2]
                dist = math.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
                fog = F(math.exp(-dist * lcfg.fog_density))
                col = col * fog + np.array(lcfg.fog_color, F) * (1.0 - fog)
            img[y, x] = np.clip(col, 0.0, 1.0)
    stats = {"hit_frac": n_hit / (H * W), "water_frac": n_water / (H * W)}
    return img, stats
