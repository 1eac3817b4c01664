"""Scalar golden model of the hybrid tracer.

Per-ray Python loops, float32-emulated, mirroring the reference's control
flow exactly (``raytracing_functions.cu:65-202``): sphere-trace the coarse
SDF (<=100 steps), then DDA over the fine bit grid (<=200 steps) with an SDF
re-probe every 8th step and a long jump restarting the major loop (<=5
majors).  The vectorized wavefront tracer is tested against this.

One deliberate deviation, matching rvgrt_tpu.trace.wavefront: a hit on the
first DDA cell (reference mask == -128, *uninitialized* normal/pos) returns a
defined payload (normal=0, pos=entry point, uv=0).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

F = np.float32


@dataclass
class Hit:
    hit: bool = False
    pos: tuple = (-500.0, -500.0, -500.0)
    normal: tuple = (0.0, 0.0, 0.0)
    uv: tuple = (0.0, 0.0)
    its: int = 0


class ScalarWorld:
    """Dense bool occupancy (z, y, x) + uint8 coarse SDF for the golden model."""

    def __init__(self, solid_zyx: np.ndarray, sdf_zyx: np.ndarray,
                 sdf_coarseness: int = 2):
        self.solid = solid_zyx
        self.sdf = sdf_zyx
        self.c = sdf_coarseness
        self.sz, self.sy, self.sx = solid_zyx.shape

    def is_solid(self, ix, iy, iz) -> bool:
        return bool(self.solid[iz % self.sz, iy % self.sy, ix % self.sx])

    def sdf_at_voxel(self, vx, vy, vz) -> int:
        cz, cy, cx = self.sdf.shape
        gx = min(max(vx // self.c, 0), cx - 1)
        gy = min(max(vy // self.c, 0), cy - 1)
        gz = min(max(vz // self.c, 0), cz - 1)
        return int(self.sdf[gz, gy, gx])


def trace(world: ScalarWorld, origin, direction, t_start,
          max_major=5, max_sphere=100, max_dda=200, probe=8,
          jump_min=2, quantize_start_fp16=True) -> Hit:
    ox, oy, oz = F(origin[0]), F(origin[1]), F(origin[2])
    dx, dy, dz = F(direction[0]), F(direction[1]), F(direction[2])
    t0 = F(np.float16(t_start)) if quantize_start_fp16 else F(t_start)

    px, py, pz = F(ox + t0 * dx), F(oy + t0 * dy), F(oz + t0 * dz)

    big = F(1e10)
    ddx = F(abs(F(1.0) / dx)) if dx != 0 else big
    ddy = F(abs(F(1.0) / dy)) if dy != 0 else big
    ddz = F(abs(F(1.0) / dz)) if dz != 0 else big
    stx = int(dx > 0) - int(dx < 0)
    sty = int(dy > 0) - int(dy < 0)
    stz = int(dz > 0) - int(dz < 0)

    hi = Hit()
    its = 0
    sx, sy, sz = world.sx, world.sy, world.sz

    major = 0
    while major < max_major:
        its += 1
        # ---- sphere trace ----
        sphere_i = 0
        while sphere_i < max_sphere:
            if px < 0 or py < 0 or pz < 0 or px >= sx or py >= sy or pz >= sz:
                px = py = pz = F(-100.0)
                break
            d = world.sdf_at_voxel(int(np.floor(px)), int(np.floor(py)),
                                   int(np.floor(pz)))
            if d <= 1:
                break
            px = F(px + dx * F(d))
            py = F(py + dy * F(d))
            pz = F(pz + dz * F(d))
            sphere_i += 1

        # ---- DDA ----
        ix = int(np.floor(px))
        iy = int(np.floor(py))
        iz = int(np.floor(pz))
        tmx = F((F(ix + 1.0) - px if stx > 0 else px - F(ix)) * ddx)
        tmy = F((F(iy + 1.0) - py if sty > 0 else py - F(iy)) * ddy)
        tmz = F((F(iz + 1.0) - pz if stz > 0 else pz - F(iz)) * ddz)
        mask = -128
        jumped = False
        for i in range(max_dda):
            its += 1
            if (i & (probe - 1)) == probe - 1:
                d8 = world.sdf_at_voxel(ix, iy, iz)
                if d8 > jump_min:
                    t = F((F(ix + 0.5) - px) * dx + (F(iy + 0.5) - py) * dy
                          + (F(iz + 0.5) - pz) * dz)
                    jl = F(t + F(d8) * F(world.c))
                    px = F(px + jl * dx)
                    py = F(py + jl * dy)
                    pz = F(pz + jl * dz)
                    jumped = True
                    break
            if ix < 0 or iy < 0 or iz < 0 or ix >= sx or iy >= sy or iz >= sz:
                hi.its = its
                return hi
            if world.is_solid(ix, iy, iz):
                hi.hit = True
                if mask == 0:
                    t_hit = F(tmx - ddx)
                elif mask == 1:
                    t_hit = F(tmy - ddy)
                elif mask == 2:
                    t_hit = F(tmz - ddz)
                else:  # first-cell hit: defined payload (deviation, see above)
                    hi.pos = (float(px), float(py), float(pz))
                    hi.normal = (0.0, 0.0, 0.0)
                    hi.uv = (0.0, 0.0)
                    hi.its = its
                    return hi
                hx = F(px + t_hit * dx)
                hy = F(py + t_hit * dy)
                hz = F(pz + t_hit * dz)
                hi.pos = (float(hx), float(hy), float(hz))
                if mask == 0:
                    hi.normal = (float(-stx), 0.0, 0.0)
                    u = F(hy - F(iy))
                    v = F(hz - F(iz))
                    if stx == -1:
                        v = F(F(1.0) - v)
                    hi.uv = (float(u), float(v))
                elif mask == 1:
                    hi.normal = (0.0, float(-sty), 0.0)
                    hi.uv = (float(F(hx - F(ix))), float(F(hz - F(iz))))
                else:
                    hi.normal = (0.0, 0.0, float(-stz))
                    u = F(hx - F(ix))
                    v = F(hy - F(iy))
                    if stz == 1:
                        u = F(F(1.0) - u)
                    hi.uv = (float(u), float(v))
                hi.its = its
                return hi
            # branchless-equivalent axis step
            if tmx < tmy:
                if tmx < tmz:
                    tmx = F(tmx + ddx)
                    ix += stx
                    mask = 0
                else:
                    tmz = F(tmz + ddz)
                    iz += stz
                    mask = 2
            else:
                if tmy < tmz:
                    tmy = F(tmy + ddy)
                    iy += sty
                    mask = 1
                else:
                    tmz = F(tmz + ddz)
                    iz += stz
                    mask = 2
        if jumped:
            major += 1
            continue
        break  # DDA budget exhausted without jump -> miss

    hi.its = its
    return hi
