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

import jax.numpy as jnp

from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.core import vecmath as vm
from rvgrt_tpu.render import shading
from rvgrt_tpu.trace import wavefront
from rvgrt_tpu.world import atlas as atlas_mod

_F32 = jnp.float32


class FrameOutputs(NamedTuple):
    color: jnp.ndarray        # (H, W, 3) float32 in [0,1]
    motion: jnp.ndarray       # (H, W, 2) float32, NDC delta, y negated
    depth: jnp.ndarray        # (H, W) float32 clip z/w
    half_dist: jnp.ndarray    # (H/2, W/2) float32 (biased)
    half_shadow: jnp.ndarray  # (H/2, W/2) float32


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


def _shadow_trace(bits, sdf, cfg, rcfg, hit, hpos, normal, sun,
                  offset: float, table=None):
    """Sun-shadow ray from hit + normal*offset; misses parked OOB."""
    ox = jnp.where(hit, hpos[0] + normal[0] * offset, _F32(-10.0))
    oy = jnp.where(hit, hpos[1] + normal[1] * offset, _F32(-10.0))
    oz = jnp.where(hit, hpos[2] + normal[2] * offset, _F32(-10.0))
    res = wavefront.trace(bits, sdf, cfg, rcfg, ox, oy, oz,
                          sun[0], sun[1], sun[2], jnp.zeros_like(ox),
                          table=table)
    return res.hit


def half_res_prepass(bits, sdf, cfg, rcfg, lcfg, cam: CameraArrays,
                     hy0=0, hrows: int | None = None, table=None):
    """distApproximationKernel (StateRender.cu:255-286): distance - 8
    (miss -> 300) and hard shadow factor at half render resolution.
    ``hy0``/``hrows`` select a half-res row slab (edge-clamped)."""
    hw, hh = rcfg.half_width, rcfg.half_height
    hrows = hh if hrows is None else hrows
    dx, dy, dz = _ray_dirs(cam, hw, hh, pixel_center=True, y0=hy0,
                           rows=hrows)
    res = wavefront.trace(bits, sdf, cfg, rcfg,
                          cam.pos[0], cam.pos[1], cam.pos[2],
                          dx, dy, dz, jnp.zeros((hrows, hw), _F32),
                          table=table)
    d = jnp.sqrt((res.px - cam.pos[0]) ** 2 + (res.py - cam.pos[1]) ** 2
                 + (res.pz - cam.pos[2]) ** 2)
    dist = jnp.where(res.hit, d, _F32(rcfg.miss_distance))

    sun = vm.splat(lcfg.sun_dir, res.hit.shape)
    shadow_hit = _shadow_trace(bits, sdf, cfg, rcfg, res.hit,
                               (res.px, res.py, res.pz),
                               (res.nx, res.ny, res.nz), sun, offset=1e-1,
                               table=table)
    shadow = jnp.where(res.hit & shadow_hit, _F32(lcfg.shadow_factor),
                       _F32(1.0))
    return dist - _F32(rcfg.dist_bias), shadow


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


def _min_dist_upsample_slab(half_halo: jnp.ndarray, slab_h: int):
    """minDist over a half-res slab with a 1-row halo on each side
    (rows hy0 = y0//2 - 1 .. (y0+slab_h)//2 + 1, edge-clamped)."""
    pad = jnp.pad(half_halo, ((0, 0), (0, 1)), mode="edge")
    m = jnp.minimum(jnp.minimum(pad[:-1, :-1], pad[:-1, 1:]),
                    jnp.minimum(pad[1:, :-1], pad[1:, 1:]))
    return jnp.repeat(jnp.repeat(m[1:1 + slab_h // 2], 2, axis=0), 2, axis=1)


def _bilinear_upsample_slab(half_halo: jnp.ndarray, slab_h: int):
    """Bilinear 2x upsample of a half-res slab with halo rows."""
    a = half_halo
    prevx = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    evenx = 0.5 * (prevx + a)
    ax = jnp.stack([evenx, a], axis=2).reshape(a.shape[0], a.shape[1] * 2)
    h = slab_h // 2
    avg = 0.5 * (ax[0:h] + ax[1:h + 1])
    cpy = ax[1:h + 1]
    return jnp.stack([avg, cpy], axis=1).reshape(slab_h, ax.shape[1])


def render_slab(bits, sdf, gi, atlas, cam: CameraArrays,
                ecfg: EngineConfig, y0, slab_h: int,
                include_gi: bool = True) -> FrameOutputs:
    """Render rows [y0, y0 + slab_h) of the frame.

    The unit of pixel-parallel work: a full frame is one slab; a sharded
    frame is one slab per device (parallel/sharding.py), each recomputing a
    1-row half-res halo instead of exchanging boundaries - cheaper than a
    collective for a 2x-downsampled prepass.  ``y0`` must be even.
    """
    cfg, rcfg, lcfg = ecfg.world, ecfg.render, ecfg.lighting
    w, h = rcfg.width, slab_h

    # the combined tracer gather table is built ONCE per frame (it is a
    # ~260 MB materialization at 1024^3 scale; per-call rebuilds blow HBM)
    table = wavefront.make_trace_table(bits, sdf, cfg)

    # ---- 1+2: half-res prepass (with halo) and conservative upsamples ----
    hy0 = jnp.asarray(y0, jnp.int32) // 2 - 1
    hrows = slab_h // 2 + 2
    half_dist, half_shadow = half_res_prepass(bits, sdf, cfg, rcfg, lcfg,
                                              cam, hy0=hy0, hrows=hrows,
                                              table=table)
    start_dist = _min_dist_upsample_slab(half_dist, slab_h)
    shadow_full = _bilinear_upsample_slab(half_shadow, slab_h)

    # ---- 3: full-res primary ----
    dx, dy, dz = _ray_dirs(cam, w, rcfg.height, pixel_center=False,
                           y0=y0, rows=slab_h)
    res = wavefront.trace(bits, sdf, cfg, rcfg,
                          cam.pos[0], cam.pos[1], cam.pos[2],
                          dx, dy, dz, start_dist, table=table)
    hit = res.hit
    hpos = (res.px, res.py, res.pz)
    normal = (res.nx, res.ny, res.nz)
    d = (dx, dy, dz)
    sun = vm.splat(lcfg.sun_dir, hit.shape)

    # ---- 4a: water path (StateRender.cu:53-87) ----
    is_water = hit & (res.py < _F32(lcfg.water_level))
    wnormal = shading.water_normal(hpos, normal, cam.time, lcfg)
    refl_dir = vm.reflect(d, wnormal)
    rox = jnp.where(is_water, res.px, _F32(-10.0))
    roy = jnp.where(is_water, res.py, _F32(-10.0))
    roz = jnp.where(is_water, res.pz, _F32(-10.0))
    refl = wavefront.trace(bits, sdf, cfg, rcfg, rox, roy, roz,
                           refl_dir[0], refl_dir[1], refl_dir[2],
                           jnp.full(hit.shape, 0.001, _F32), table=table)
    refl_albedo = vm.v3(*atlas_mod.sample_texture(
        atlas, refl.uv_u, refl.uv_v, refl.px, refl.py, refl.pz))
    refl_shadow_hit = _shadow_trace(
        bits, sdf, cfg, rcfg, is_water & refl.hit,
        (refl.px, refl.py, refl.pz), (refl.nx, refl.ny, refl.nz), sun,
        offset=1e-3, table=table)
    refl_solid_col = vm.where(refl_shadow_hit,
                              vm.scale(refl_albedo, 0.1), refl_albedo)
    refl_col = vm.where(refl.hit, refl_solid_col,
                        shading.sample_sky(refl_dir, lcfg))
    n_dot_v = jnp.maximum(vm.dot(normal, vm.scale(d, -1.0)), 0.0)
    fresnel = shading.fresnel_schlick(n_dot_v, _F32(lcfg.water_reflectivity))
    water_col = vm.lerp(vm.splat(lcfg.water_color, hit.shape), refl_col,
                        fresnel)

    # ---- 4b: solid path (StateRender.cu:88-131) ----
    albedo = vm.v3(*atlas_mod.sample_texture(atlas, res.uv_u, res.uv_v,
                                             res.px, res.py, res.pz))
    diffuse = jnp.maximum(vm.dot(normal, sun), 0.0)
    direct = vm.scale(albedo, diffuse * shadow_full)
    solid_col = direct
    if include_gi:
        ir, ig, ib = shading.gather_gi(hpos, normal, gi, sdf, cfg, lcfg)
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
    color = shading.apply_fog(color, hit, dist, lcfg)

    # ---- 5: motion vectors + depth (StateRender.cu:234-252) ----
    ones = jnp.ones_like(res.px)
    prev_clip = vm.mat_mul_vec4(cam.prev_vp, (res.px, res.py, res.pz, ones))
    cur_clip = vm.mat_mul_vec4(cam.vp, (res.px, res.py, res.pz, ones))
    both_front = (prev_clip[3] > 0.0) & (cur_clip[3] > 0.0)
    mv_x = jnp.where(hit & both_front,
                     cur_clip[0] / cur_clip[3] - prev_clip[0] / prev_clip[3],
                     0.0)
    mv_y = jnp.where(hit & both_front,
                     cur_clip[1] / cur_clip[3] - prev_clip[1] / prev_clip[3],
                     0.0)
    depth = jnp.where(hit & (cur_clip[3] > 0.0),
                      cur_clip[2] / cur_clip[3], _F32(1.0))

    color_img = jnp.clip(jnp.stack(color, axis=-1), 0.0, 1.0)
    motion = jnp.stack([mv_x, -mv_y], axis=-1)
    return FrameOutputs(color=color_img, motion=motion, depth=depth,
                        half_dist=half_dist[1:-1], half_shadow=half_shadow[1:-1])


def render_frame(bits, sdf, gi, atlas, cam: CameraArrays,
                 ecfg: EngineConfig, include_gi: bool = True) -> FrameOutputs:
    """Full frame = one slab covering every row."""
    return render_slab(bits, sdf, gi, atlas, cam, ecfg,
                       y0=jnp.int32(0), slab_h=ecfg.render.height,
                       include_gi=include_gi)
