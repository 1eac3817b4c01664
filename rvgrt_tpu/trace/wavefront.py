"""Wavefront hybrid tracer: sphere-trace the coarse SDF, then DDA.

This is the TPU restructuring of the reference's branchy per-thread
``trace()`` megakernel (``raytracing_functions.cu:85-202``): instead of one
divergent loop per ray, the whole ray buffer advances in lockstep
*supersteps*.  Every ray carries a phase (SPHERE / DDA / DONE); one superstep
performs exactly one masked state transition per live ray:

* SPHERE lanes step ``pos += dir * sdf[pos]`` until the SDF says they are
  within one cell of a surface (``approximateCSDF``, lines 65-83);
* DDA lanes advance one voxel along the dominant tMax axis (branchless axis
  select like lines 172-192), probing the SDF every 8th step and long-jumping
  ``dist * COARSENESSSDF`` when open space re-appears (lines 127-141),
  restarting the major loop (max 5 majors, line 105);
* DONE lanes idle (masked out).

All lanes share ONE SDF gather and ONE occupancy-bit gather per superstep -
the only non-elementwise ops - so the loop body is two HBM gathers plus VPU
arithmetic over the SoA ray state.  The loop runs under ``lax.while_loop``
until every lane is DONE (or the hard superstep cap).

Semantics deliberately preserved from the reference (golden-tested against a
scalar model): iteration budgets 5 x (100 sphere + 200 DDA), the ``its``
counter, tMax/uv/normal construction, the ``distance`` parameter's fp16
quantization, OOB => miss with pos sentinel.  One deliberate fix (SURVEY.md
appendix B): a hit on the very first DDA cell (reference ``mask == -128``,
uninitialized normal) returns a defined payload: normal = 0, pos = entry
point, uv = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import RenderConfig, WorldConfig
from rvgrt_tpu.world import voxel_grid, sdf as sdf_mod

_F32 = jnp.float32
_I32 = jnp.int32

PHASE_SPHERE = 0
PHASE_DDA = 1
PHASE_DONE = 2

MASK_NONE = -128  # no DDA step taken yet
MISS_POS = -500.0
OOB_POS = -100.0


class TraceResult(NamedTuple):
    hit: jax.Array   # bool
    px: jax.Array    # hit position (f32)
    py: jax.Array
    pz: jax.Array
    nx: jax.Array    # face normal (f32, one of +-1 on one axis; 0 for
    ny: jax.Array    # first-cell hits)
    nz: jax.Array
    uv_u: jax.Array  # in-face UV
    uv_v: jax.Array
    its: jax.Array   # iteration count (i32) - the Mrays/s work metric
    t: jax.Array     # ray parameter of the hit (f32; 0 on miss)


def trace(bits: jax.Array, sdf: jax.Array, cfg: WorldConfig,
          rcfg: RenderConfig,
          ox, oy, oz, dx, dy, dz, t_start,
          quantize_start_fp16: bool = True) -> TraceResult:
    """Trace rays (any common broadcast shape) through the world.

    ``t_start`` mirrors the reference's ``half distance`` parameter: the
    march origin is ``origin + t_start * dir`` (raytracing_functions.cu:90),
    quantized through fp16 like the implicit CUDA float->half conversion.
    """
    shape = jnp.broadcast_shapes(
        jnp.shape(ox), jnp.shape(oy), jnp.shape(oz),
        jnp.shape(dx), jnp.shape(dy), jnp.shape(dz), jnp.shape(t_start))

    ox = jnp.broadcast_to(jnp.asarray(ox, _F32), shape)
    oy = jnp.broadcast_to(jnp.asarray(oy, _F32), shape)
    oz = jnp.broadcast_to(jnp.asarray(oz, _F32), shape)
    dx = jnp.broadcast_to(jnp.asarray(dx, _F32), shape)
    dy = jnp.broadcast_to(jnp.asarray(dy, _F32), shape)
    dz = jnp.broadcast_to(jnp.asarray(dz, _F32), shape)
    t0 = jnp.broadcast_to(jnp.asarray(t_start, _F32), shape)
    if quantize_start_fp16:
        t0 = t0.astype(jnp.float16).astype(_F32)

    big = _F32(1e10)
    ddx = jnp.where(dx != 0, jnp.abs(1.0 / dx), big)
    ddy = jnp.where(dy != 0, jnp.abs(1.0 / dy), big)
    ddz = jnp.where(dz != 0, jnp.abs(1.0 / dz), big)
    stx = jnp.sign(dx).astype(_I32)
    sty = jnp.sign(dy).astype(_I32)
    stz = jnp.sign(dz).astype(_I32)

    size_x, size_y, size_z = cfg.size_x, cfg.size_y, cfg.size_z

    # Zeros derived from ALL ray inputs so the while-loop carry has a
    # consistent varying-axis type under shard_map (any device-varying
    # input - origins, dirs, or start distances - propagates its vma type).
    zf = (ox + oy + oz + dx + dy + dz + t0) * _F32(0.0)
    zi = zf.astype(_I32)
    state = dict(
        px=ox + t0 * dx, py=oy + t0 * dy, pz=oz + t0 * dz,
        ix=zi, iy=zi, iz=zi,
        tmx=zf, tmy=zf, tmz=zf,
        phase=zi + PHASE_SPHERE,
        major=zi,
        sphere_i=zi,
        dda_i=zi,
        mask=zi + MASK_NONE,
        its=zi + 1,  # major-loop entry counts one (line 107)
        hit=zi != 0,
        hpx=zf + MISS_POS,
        hpy=zf + MISS_POS,
        hpz=zf + MISS_POS,
        nx=zf, ny=zf, nz=zf,
        uvu=zf, uvv=zf,
        step_count=jnp.zeros((), _I32),
    )

    def enter_dda(s, lanes):
        """Transition ``lanes`` from SPHERE to DDA: floor pos, init tMax."""
        fx = jnp.floor(s["px"])
        fy = jnp.floor(s["py"])
        fz = jnp.floor(s["pz"])
        nix, niy, niz = fx.astype(_I32), fy.astype(_I32), fz.astype(_I32)
        # tMax to first boundary per axis (lines 116-120)
        ntmx = jnp.where(stx > 0, fx + 1.0 - s["px"], s["px"] - fx) * ddx
        ntmy = jnp.where(sty > 0, fy + 1.0 - s["py"], s["py"] - fy) * ddy
        ntmz = jnp.where(stz > 0, fz + 1.0 - s["pz"], s["pz"] - fz) * ddz
        out = dict(s)
        out["ix"] = jnp.where(lanes, nix, s["ix"])
        out["iy"] = jnp.where(lanes, niy, s["iy"])
        out["iz"] = jnp.where(lanes, niz, s["iz"])
        out["tmx"] = jnp.where(lanes, ntmx, s["tmx"])
        out["tmy"] = jnp.where(lanes, ntmy, s["tmy"])
        out["tmz"] = jnp.where(lanes, ntmz, s["tmz"])
        out["mask"] = jnp.where(lanes, MASK_NONE, s["mask"])
        out["dda_i"] = jnp.where(lanes, 0, s["dda_i"])
        out["phase"] = jnp.where(lanes, PHASE_DDA, s["phase"])
        return out

    def body(s):
        in_sphere = s["phase"] == PHASE_SPHERE
        in_dda = s["phase"] == PHASE_DDA

        # ---------- shared SDF gather ----------
        # SPHERE lanes query at floor(pos) (float overload, cuh:35-51);
        # DDA lanes at ipos (int overload, cuh:52-67).  Same clamped
        # coarse-cell lookup -> one gather for everyone.
        qx = jnp.where(in_sphere, jnp.floor(s["px"]).astype(_I32), s["ix"])
        qy = jnp.where(in_sphere, jnp.floor(s["py"]).astype(_I32), s["iy"])
        qz = jnp.where(in_sphere, jnp.floor(s["pz"]).astype(_I32), s["iz"])
        dist = sdf_mod.sample_sdf_at_voxel(sdf, cfg, qx, qy, qz)

        # ---------- shared occupancy gather (DDA lanes) ----------
        solid = voxel_grid.is_solid(bits, cfg, s["ix"], s["iy"], s["iz"])

        ns = dict(s)

        # ================= SPHERE phase =================
        # (approximateCSDF, lines 65-83)
        sp_oob = (s["px"] < 0) | (s["py"] < 0) | (s["pz"] < 0) | \
                 (s["px"] >= size_x) | (s["py"] >= size_y) | (s["pz"] >= size_z)
        sp_oob &= in_sphere
        sp_converged = in_sphere & ~sp_oob & (dist <= 1)
        sp_exhaust = in_sphere & ~sp_oob & ~sp_converged & (s["sphere_i"] >= rcfg.max_sphere_steps - 1)
        sp_march = in_sphere & ~sp_oob & ~sp_converged

        distf = dist.astype(_F32)
        ns["px"] = jnp.where(sp_march, s["px"] + dx * distf, s["px"])
        ns["py"] = jnp.where(sp_march, s["py"] + dy * distf, s["py"])
        ns["pz"] = jnp.where(sp_march, s["pz"] + dz * distf, s["pz"])
        ns["sphere_i"] = jnp.where(sp_march, s["sphere_i"] + 1, s["sphere_i"])
        # OOB -> sentinel pos (-100): next DDA iteration misses (line 71)
        ns["px"] = jnp.where(sp_oob, OOB_POS, ns["px"])
        ns["py"] = jnp.where(sp_oob, OOB_POS, ns["py"])
        ns["pz"] = jnp.where(sp_oob, OOB_POS, ns["pz"])
        to_dda = sp_oob | sp_converged | sp_exhaust
        ns = enter_dda(ns, to_dda)

        # ================= DDA phase =================
        probe_turn = in_dda & ((s["dda_i"] & (rcfg.sdf_probe_interval - 1))
                               == rcfg.sdf_probe_interval - 1)
        ns["its"] = jnp.where(in_dda, s["its"] + 1, ns["its"])

        # (a) SDF long jump (lines 127-141)
        do_jump = probe_turn & (dist > rcfg.jump_min_dist)
        cx = s["ix"].astype(_F32) + 0.5
        cy = s["iy"].astype(_F32) + 0.5
        cz = s["iz"].astype(_F32) + 0.5
        t_proj = (cx - s["px"]) * dx + (cy - s["py"]) * dy + (cz - s["pz"]) * dz
        jump_len = t_proj + dist.astype(_F32) * cfg.sdf_coarseness
        jpx = s["px"] + jump_len * dx
        jpy = s["py"] + jump_len * dy
        jpz = s["pz"] + jump_len * dz
        new_major = s["major"] + 1
        jump_miss = do_jump & (new_major >= rcfg.max_major_iterations)
        jump_resphere = do_jump & ~jump_miss
        ns["px"] = jnp.where(do_jump, jpx, ns["px"])
        ns["py"] = jnp.where(do_jump, jpy, ns["py"])
        ns["pz"] = jnp.where(do_jump, jpz, ns["pz"])
        ns["major"] = jnp.where(do_jump, new_major, ns["major"])
        ns["sphere_i"] = jnp.where(jump_resphere, 0, ns["sphere_i"])
        ns["phase"] = jnp.where(jump_resphere, PHASE_SPHERE, ns["phase"])
        # major-loop re-entry counts one its (line 107)
        ns["its"] = jnp.where(jump_resphere, ns["its"] + 1, ns["its"])
        ns["phase"] = jnp.where(jump_miss, PHASE_DONE, ns["phase"])

        live = in_dda & ~do_jump

        # (b) bounds check (lines 144-147)
        dda_oob = live & ((s["ix"] < 0) | (s["iy"] < 0) | (s["iz"] < 0)
                          | (s["ix"] >= size_x) | (s["iy"] >= size_y)
                          | (s["iz"] >= size_z))
        ns["phase"] = jnp.where(dda_oob, PHASE_DONE, ns["phase"])
        live &= ~dda_oob

        # (c) solid hit (lines 149-168)
        do_hit = live & solid
        stxf = stx.astype(_F32)
        styf = sty.astype(_F32)
        stzf = stz.astype(_F32)
        m = s["mask"]
        t_hit = jnp.where(
            m == 0, s["tmx"] - ddx,
            jnp.where(m == 1, s["tmy"] - ddy,
                      jnp.where(m == 2, s["tmz"] - ddz, _F32(0.0))))
        hx = s["px"] + t_hit * dx
        hy = s["py"] + t_hit * dy
        hz = s["pz"] + t_hit * dz
        # first-cell hit (mask -128): defined payload = entry pos, zero normal
        first_cell = m == MASK_NONE
        hx = jnp.where(first_cell, s["px"], hx)
        hy = jnp.where(first_cell, s["py"], hy)
        hz = jnp.where(first_cell, s["pz"], hz)
        nnx = jnp.where(m == 0, -stxf, 0.0)
        nny = jnp.where(m == 1, -styf, 0.0)
        nnz = jnp.where(m == 2, -stzf, 0.0)
        fx_ = s["ix"].astype(_F32)
        fy_ = s["iy"].astype(_F32)
        fz_ = s["iz"].astype(_F32)
        # per-face UV with orientation flips (lines 156-166)
        uvu = jnp.where(m == 0, hy - fy_,
                        jnp.where(m == 1, hx - fx_,
                                  jnp.where(m == 2, hx - fx_, 0.0)))
        uvv_x = jnp.where(stx == -1, 1.0 - (hz - fz_), hz - fz_)
        uvu_z = jnp.where(stz == 1, 1.0 - uvu, uvu)
        uvu = jnp.where(m == 2, uvu_z, uvu)
        uvv = jnp.where(m == 0, uvv_x,
                        jnp.where(m == 1, hz - fz_,
                                  jnp.where(m == 2, hy - fy_, 0.0)))
        ns["hit"] = jnp.where(do_hit, True, ns["hit"])
        ns["hpx"] = jnp.where(do_hit, hx, ns["hpx"])
        ns["hpy"] = jnp.where(do_hit, hy, ns["hpy"])
        ns["hpz"] = jnp.where(do_hit, hz, ns["hpz"])
        ns["nx"] = jnp.where(do_hit, nnx, ns["nx"])
        ns["ny"] = jnp.where(do_hit, nny, ns["ny"])
        ns["nz"] = jnp.where(do_hit, nnz, ns["nz"])
        ns["uvu"] = jnp.where(do_hit, uvu, ns["uvu"])
        ns["uvv"] = jnp.where(do_hit, uvv, ns["uvv"])
        ns["phase"] = jnp.where(do_hit, PHASE_DONE, ns["phase"])
        live &= ~do_hit

        # (d) branchless DDA step (lines 172-192)
        step_x = live & (s["tmx"] < s["tmy"]) & (s["tmx"] < s["tmz"])
        step_y = live & ~step_x & (s["tmy"] < s["tmz"])
        step_z = live & ~step_x & ~step_y
        ns["tmx"] = jnp.where(step_x, s["tmx"] + ddx, ns["tmx"])
        ns["tmy"] = jnp.where(step_y, s["tmy"] + ddy, ns["tmy"])
        ns["tmz"] = jnp.where(step_z, s["tmz"] + ddz, ns["tmz"])
        ns["ix"] = jnp.where(step_x, s["ix"] + stx, ns["ix"])
        ns["iy"] = jnp.where(step_y, s["iy"] + sty, ns["iy"])
        ns["iz"] = jnp.where(step_z, s["iz"] + stz, ns["iz"])
        ns["mask"] = jnp.where(step_x, 0,
                               jnp.where(step_y, 1,
                                         jnp.where(step_z, 2, ns["mask"])))
        new_i = s["dda_i"] + 1
        ns["dda_i"] = jnp.where(live, new_i, ns["dda_i"])
        # DDA budget exhausted without a jump -> miss (loop end, line 199)
        ns["phase"] = jnp.where(live & (new_i >= rcfg.max_dda_steps),
                                PHASE_DONE, ns["phase"])

        ns["step_count"] = s["step_count"] + 1
        return ns

    def cond(s):
        return (s["step_count"] < rcfg.max_supersteps) & \
               jnp.any(s["phase"] != PHASE_DONE)

    final = jax.lax.while_loop(cond, body, state)

    t_hit = jnp.where(
        final["hit"],
        (final["hpx"] - ox) * dx + (final["hpy"] - oy) * dy
        + (final["hpz"] - oz) * dz,
        _F32(0.0))
    return TraceResult(
        hit=final["hit"], px=final["hpx"], py=final["hpy"], pz=final["hpz"],
        nx=final["nx"], ny=final["ny"], nz=final["nz"],
        uv_u=final["uvu"], uv_v=final["uvv"], its=final["its"], t=t_hit)
