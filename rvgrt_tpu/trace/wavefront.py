"""Wavefront hybrid tracer: sphere-trace the coarse SDF, then DDA.

This is the TPU restructuring of the reference's branchy per-thread
``trace()`` megakernel (``raytracing_functions.cu:85-202``): instead of one
divergent loop per ray, the whole ray buffer advances in lockstep
*supersteps*.  Every ray carries a phase (SPHERE / DDA / DONE); one superstep
performs exactly one masked state transition per live ray.

TPU-shaped design decisions (driven by profiling on v5e):

* **One HBM gather per superstep.**  Random gathers are the whole cost of
  this workload on TPU (~7.5 ns/element in-kernel, measured); everything
  else in a superstep is ~1 ns/lane of VPU work.  The occupancy words and
  the coarse SDF live in ONE combined uint32 table (bits words, then SDF
  packed 4 cells/word) so every lane - sphere-stepping, DDA-stepping, or
  SDF-probing - issues exactly one gather.  The reference's every-8th-step
  SDF re-probe (lines 127-141) becomes its own superstep (a lane probes,
  *then* resumes DDA next superstep) instead of a second gather.
* **Slim carry.**  The while-loop state is 11 arrays (44 B/lane): positions,
  voxel coords, tMax, a packed flags word (phase | mask | major | sphere_i |
  dda_i | probed), and the ``its`` counter.  The hit payload (position,
  normal, UV) is reconstructed after the loop from the final state - it
  never rides through the loop.
* **Row tiles.**  ``lax.map`` over row tiles bounds divergence: a tile's
  superstep loop exits when *its* rays converge, instead of every ray
  paying for the globally slowest one.

Semantics are preserved from the reference and golden-tested against a
scalar model: iteration budgets 5 x (100 sphere + 200 DDA), the exact
``its`` counter, tMax/uv/normal construction, fp16 quantization of the
``distance`` parameter, OOB => miss.  One deliberate fix (SURVEY.md appendix
B): a hit on the very first DDA cell (reference ``mask == -128``,
uninitialized payload) returns a defined payload: normal = 0, pos = entry
point, uv = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rvgrt_tpu.config import RenderConfig, WorldConfig

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

PHASE_SPHERE = 0
PHASE_DDA = 1
PHASE_MISS = 2
PHASE_HIT = 3
# volume-sharded tracing only (z_edges given): the ray left this device's
# z-slab through the low/high face and must be handed to the neighbor
PHASE_EXIT_LO = 4
PHASE_EXIT_HI = 5

MASK_X = 0
MASK_Y = 1
MASK_Z = 2
MASK_NONE = 3  # no DDA step taken yet (reference mask == -128)

MISS_POS = -500.0
OOB_POS = -100.0

# flags word layout (LSB first)
_PH_SH, _PH_W = 0, 3        # phase
_MK_SH, _MK_W = 3, 2        # mask
_MJ_SH, _MJ_W = 5, 3        # major iteration
_SP_SH, _SP_W = 8, 7        # sphere step counter
_DD_SH, _DD_W = 15, 8       # DDA step counter
_PR_SH = 23                 # probed flag


def _get(flags, sh, w):
    return (flags >> sh) & ((1 << w) - 1)


def _set(flags, sh, w, val):
    mask = ((1 << w) - 1) << sh
    return (flags & ~mask) | ((val << sh) & mask)


class TraceResult(NamedTuple):
    hit: jax.Array   # bool
    px: jax.Array    # hit position (f32); (-500,...) on miss
    py: jax.Array
    pz: jax.Array
    nx: jax.Array    # face normal (+-1 on one axis; 0 for first-cell hits)
    ny: jax.Array
    nz: jax.Array
    uv_u: jax.Array  # in-face UV
    uv_v: jax.Array
    its: jax.Array   # iteration count (i32) - the Mrays/s work metric
    t: jax.Array     # ray parameter of the hit (f32; 0 on miss)
    # volume-sharded tracing only: -1/+1 = ray left the local z-slab
    # through the low/high face (px/py/pz then hold the exit position,
    # local coords); 0 otherwise
    exit_dir: jax.Array = 0
    # supersteps the ray's retirement tile ran (i32, same value across a
    # tile) - the tracer's true cost counter: tile time ~ steps x lanes
    steps: jax.Array = 0
    # two-phase straggler respite only: True where a ray exceeded the
    # phase-2 buffer cap and silently degraded to miss.  Production
    # telemetry: the bench sums this per frame and reports it; the cap
    # carries a 1.57x measured margin so the expected value is 0
    degraded: jax.Array = 0


def make_trace_table(bits: jax.Array, sdf: jax.Array,
                     cfg: WorldConfig) -> jax.Array:
    """Combined gather table: [brick occupancy words | SDF 4 cells/word].

    Built once per world (pass it through per-frame calls - the brick
    repack is not free); lets every tracer superstep be a single uint32
    gather regardless of lane phase.  Occupancy words are 4x2x4 bricks
    (``voxel_grid.to_brick_words``) so one DDA gather serves several
    sub-steps.
    """
    from rvgrt_tpu.world import voxel_grid

    # QUARTERED pack: byte k of word w = cell ``w + k * (num_cells/4)``,
    # i.e. four contiguous quarter-slices OR'd together - dense
    # elementwise ops with no tiny trailing dim and no striding.  The
    # round-4 consecutive-cells-per-word layout cost 24 s at 2048^3 (the
    # s[0::4] strided slices lower to scatter-pattern relayouts,
    # probe_r32); a (N, 4)+bitcast formulation pads the trailing dim to
    # 128 lanes (a 137 GB alloc at 2048^3) and u8->u32 BitcastConvert
    # also hangs this jaxlib's XLA:CPU.  The tracer-side index math
    # (``_sdf_word_index``) has the same op count in either layout.
    q = sdf.reshape(4, cfg.sdf_num_cells // 4).astype(_U32)
    packed = q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)
    return jnp.concatenate([voxel_grid.to_brick_words(bits, cfg), packed])


def _sdf_word_index(cfg: WorldConfig, bits_len: int, vx, vy, vz):
    """Combined-table index + byte position for an SDF lookup at fine-voxel
    coords (the getDistance clamp semantics, raytracing_functions.cuh:35-67).

    Quartered layout (see ``make_trace_table``): cell ``cidx`` lives in
    word ``cidx mod num_cells/4`` at byte ``cidx div num_cells/4``."""
    c = cfg.sdf_coarseness
    cx = jnp.clip(vx // c, 0, cfg.sdf_size_x - 1)
    cy = jnp.clip(vy // c, 0, cfg.sdf_size_y - 1)
    cz = jnp.clip(vz // c, 0, cfg.sdf_size_z - 1)
    cidx = cz * (cfg.sdf_size_x * cfg.sdf_size_y) + cy * cfg.sdf_size_x + cx
    qshift = (cfg.sdf_num_cells // 4).bit_length() - 1  # log2(num_cells/4)
    return (bits_len + (cidx & (cfg.sdf_num_cells // 4 - 1)),
            (cidx >> qshift) << 3)


def _brick_word_index(cfg: WorldConfig, vx, vy, vz):
    """Combined-table index + bit position for an occupancy lookup in the
    4x2x4 brick layout (wrap semantics match IsSolid/toIndex,
    cumath.cuh:33-45: coords wrap at the power-of-two world dims)."""
    x = vx & (cfg.size_x - 1)
    y = vy & (cfg.size_y - 1)
    z = vz & (cfg.size_z - 1)
    wi = ((x >> 2)
          | ((y >> 1) << (cfg.shift_x - 2))
          | ((z >> 2) << (cfg.shift_x - 2 + cfg.shift_y - 1)))
    return wi, (x & 3) | ((y & 1) << 2) | ((z & 3) << 3)


def _pick_tile_count(n: int, target_size: int, min_size: int,
                     pad_penalty: int = 0) -> int:
    """Tile count along one image axis: the divisor of ``n`` whose tile
    size is closest to ``target_size`` (never below ``min_size``).

    ``pad_penalty`` > 0 charges vreg padding (a 160-wide tile occupies 256
    lanes); essential on the 128-lane axis, near-free on the 8-sublane
    axis (20-row tiles measured faster than 24 despite padding).
    """
    best, best_score = 1, float("inf")
    for t in range(1, n + 1):
        if n % t:
            continue
        size = n // t
        if size < min_size:
            break
        padded = -(-size // min_size) * min_size
        score = (padded - size) * pad_penalty + abs(padded - target_size)
        if score < best_score:
            best, best_score = t, score
    return best


def _superstep_pregather(cfg: WorldConfig, rcfg: RenderConfig, dirs, s,
                         sky_y=None, z_edges=None):
    """Superstep front half: retirement masks + THE gather's table index.

    Pure jnp over the carried state ``s`` (px/py/pz, ix/iy/iz, flags) and
    the per-lane direction invariants ``dirs`` = (dx, dy, dz, ddx, ddy,
    ddz, stx, sty, stz).  Runs in the XLA superstep body, and is
    *recomputed* inside the fused Pallas superstep kernel
    (``ops/superstep_kernel.py``) from the same inputs - one source of
    truth keeps the two paths bit-exact by construction.
    """
    dx, dy, dz = dirs[0], dirs[1], dirs[2]
    size_x, size_y, size_z = cfg.size_x, cfg.size_y, cfg.size_z
    probe_mask = rcfg.sdf_probe_interval - 1  # power of two
    flags = s["flags"]
    phase = _get(flags, _PH_SH, _PH_W)
    dda_i = _get(flags, _DD_SH, _DD_W)
    probed = (flags >> _PR_SH) & 1

    in_sphere = phase == PHASE_SPHERE
    if sky_y is not None:
        # above every solid voxel and not descending -> can never hit
        sky_out = in_sphere & (dy >= 0) & (s["py"] >= sky_y)
        in_sphere &= ~sky_out
        flags = jnp.where(sky_out,
                          _set(flags, _PH_SH, _PH_W, PHASE_MISS), flags)
    if z_edges is not None:
        # interior slab face -> hand the ray to the z neighbor instead
        # of missing; x/y (or edge-shard z) overflow stays a real miss
        xy_in = ((s["px"] >= 0) & (s["py"] >= 0)
                 & (s["px"] < size_x) & (s["py"] < size_y))
        exit_lo = in_sphere & xy_in & (s["pz"] < 0) & ~z_edges[0]
        exit_hi = in_sphere & xy_in & (s["pz"] >= size_z) & ~z_edges[1]
        sp_exit = exit_lo | exit_hi
        in_sphere &= ~sp_exit
        flags = jnp.where(exit_lo, _set(flags, _PH_SH, _PH_W,
                                        PHASE_EXIT_LO), flags)
        flags = jnp.where(exit_hi, _set(flags, _PH_SH, _PH_W,
                                        PHASE_EXIT_HI), flags)
        # sphere exits carry their position directly (mask = NONE)
        flags = jnp.where(sp_exit,
                          _set(flags, _MK_SH, _MK_W, MASK_NONE), flags)
    in_dda = phase == PHASE_DDA
    # probe superstep: reference's (i & 7) == 7 SDF re-check (line 127)
    probe_turn = in_dda & ((dda_i & probe_mask) == probe_mask) \
        & (probed == 0)
    action_turn = in_dda & ~probe_turn

    # ---------- THE gather's index (one gather per superstep) ----------
    bits_len = cfg.num_words
    table_len = bits_len + cfg.sdf_num_cells // 4
    sph_or_probe = in_sphere | probe_turn
    qvx = jnp.where(in_sphere, jnp.floor(s["px"]).astype(_I32), s["ix"])
    qvy = jnp.where(in_sphere, jnp.floor(s["py"]).astype(_I32), s["iy"])
    qvz = jnp.where(in_sphere, jnp.floor(s["pz"]).astype(_I32), s["iz"])
    widx_sdf, bytepos = _sdf_word_index(cfg, bits_len, qvx, qvy, qvz)
    widx_bit, _ = _brick_word_index(cfg, s["ix"], s["iy"], s["iz"])
    widx = jnp.where(sph_or_probe, widx_sdf, widx_bit)
    return dict(flags=flags, in_sphere=in_sphere, probe_turn=probe_turn,
                action_turn=action_turn, dda_i=dda_i,
                widx=jnp.clip(widx, 0, table_len - 1),
                bytepos=bytepos, widx_bit=widx_bit)


def _superstep_update(cfg: WorldConfig, rcfg: RenderConfig, dirs, tm, s,
                      pre, word, z_edges=None, carry_tm: bool = True):
    """Superstep back half: the masked state machine over the gathered
    ``word`` (sphere march / SDF probe+jump / DDA brick substeps).

    Pure jnp; runs in the XLA superstep body AND inside the fused Pallas
    kernel (``ops/superstep_kernel.py`` passes the tile state resident in
    VMEM).  ``tm`` is (tmx, tmy, tmz) - carried (non-slim) or recomputed
    (slim); ``carry_tm=False`` (slim) skips writing tm into the state.
    Returns the next state dict (no ``step``; the caller advances it).
    """
    dx, dy, dz, ddx, ddy, ddz, stx, sty, stz = dirs
    s_tmx, s_tmy, s_tmz = tm
    size_x, size_y, size_z = cfg.size_x, cfg.size_y, cfg.size_z
    probe_mask = rcfg.sdf_probe_interval - 1
    big = _F32(1e10)
    flags = pre["flags"]
    in_sphere = pre["in_sphere"]
    probe_turn = pre["probe_turn"]
    action_turn = pre["action_turn"]
    dda_i = pre["dda_i"]
    widx_bit = pre["widx_bit"]
    dist = ((word >> pre["bytepos"].astype(_U32)) & _U32(0xFF)).astype(_I32)

    def enter_dda(sd, lanes, fl):
        """SPHERE -> DDA for ``lanes``: floor pos, init tMax (lines 114-120)."""
        fx = jnp.floor(sd["px"])
        fy = jnp.floor(sd["py"])
        fz = jnp.floor(sd["pz"])
        sd["ix"] = jnp.where(lanes, fx.astype(_I32), sd["ix"])
        sd["iy"] = jnp.where(lanes, fy.astype(_I32), sd["iy"])
        sd["iz"] = jnp.where(lanes, fz.astype(_I32), sd["iz"])
        if carry_tm:
            ntmx = jnp.where(stx > 0, fx + 1.0 - sd["px"], sd["px"] - fx) * ddx
            ntmy = jnp.where(sty > 0, fy + 1.0 - sd["py"], sd["py"] - fy) * ddy
            ntmz = jnp.where(stz > 0, fz + 1.0 - sd["pz"], sd["pz"] - fz) * ddz
            sd["tmx"] = jnp.where(lanes, ntmx, sd["tmx"])
            sd["tmy"] = jnp.where(lanes, ntmy, sd["tmy"])
            sd["tmz"] = jnp.where(lanes, ntmz, sd["tmz"])
        nf = _set(fl, _PH_SH, _PH_W, PHASE_DDA)
        nf = _set(nf, _MK_SH, _MK_W, MASK_NONE)
        nf = _set(nf, _DD_SH, _DD_W, 0)
        nf = nf & ~(1 << _PR_SH)
        return jnp.where(lanes, nf, fl)

    ns = dict(s)
    nflags = flags

    # ================= SPHERE phase =================
    # (approximateCSDF, lines 65-83)
    sphere_i = _get(flags, _SP_SH, _SP_W)
    sp_oob = in_sphere & (
        (s["px"] < 0) | (s["py"] < 0) | (s["pz"] < 0)
        | (s["px"] >= size_x) | (s["py"] >= size_y) | (s["pz"] >= size_z))
    sp_converged = in_sphere & ~sp_oob & (dist <= 1)
    sp_march = in_sphere & ~sp_oob & ~sp_converged
    sp_exhaust = sp_march & (sphere_i >= rcfg.max_sphere_steps - 1)

    distf = dist.astype(_F32)
    ns["px"] = jnp.where(sp_march, s["px"] + dx * distf, s["px"])
    ns["py"] = jnp.where(sp_march, s["py"] + dy * distf, s["py"])
    ns["pz"] = jnp.where(sp_march, s["pz"] + dz * distf, s["pz"])
    nflags = jnp.where(sp_march,
                       _set(nflags, _SP_SH, _SP_W, sphere_i + 1), nflags)
    ns["px"] = jnp.where(sp_oob, OOB_POS, ns["px"])
    ns["py"] = jnp.where(sp_oob, OOB_POS, ns["py"])
    ns["pz"] = jnp.where(sp_oob, OOB_POS, ns["pz"])
    to_dda = sp_oob | sp_converged | sp_exhaust
    nflags = enter_dda(ns, to_dda, nflags)

    # ================= DDA probe superstep =================
    # (lines 127-141); no reference-iteration advance unless jumping
    do_jump = probe_turn & (dist > rcfg.jump_min_dist)
    no_jump = probe_turn & ~do_jump
    cx = s["ix"].astype(_F32) + 0.5
    cy = s["iy"].astype(_F32) + 0.5
    cz = s["iz"].astype(_F32) + 0.5
    t_proj = (cx - s["px"]) * dx + (cy - s["py"]) * dy \
        + (cz - s["pz"]) * dz
    jump_len = t_proj + dist.astype(_F32) * cfg.sdf_coarseness
    major = _get(flags, _MJ_SH, _MJ_W)
    new_major = major + 1
    jump_miss = do_jump & (new_major >= rcfg.max_major_iterations)
    jump_resphere = do_jump & ~jump_miss
    ns["px"] = jnp.where(do_jump, s["px"] + jump_len * dx, ns["px"])
    ns["py"] = jnp.where(do_jump, s["py"] + jump_len * dy, ns["py"])
    ns["pz"] = jnp.where(do_jump, s["pz"] + jump_len * dz, ns["pz"])
    nflags = jnp.where(do_jump, _set(nflags, _MJ_SH, _MJ_W, new_major),
                       nflags)
    nflags = jnp.where(jump_resphere,
                       _set(_set(nflags, _PH_SH, _PH_W, PHASE_SPHERE),
                            _SP_SH, _SP_W, 0), nflags)
    nflags = jnp.where(jump_miss,
                       _set(nflags, _PH_SH, _PH_W, PHASE_MISS), nflags)
    # its: +1 for the DDA iteration that jumped (line 124), +1 more for
    # the major-loop re-entry (line 107)
    ns["its"] = jnp.where(jump_miss, s["its"] + 1, s["its"])
    ns["its"] = jnp.where(jump_resphere, s["its"] + 2, ns["its"])
    nflags = jnp.where(no_jump, nflags | (1 << _PR_SH), nflags)

    # ================= DDA action superstep =================
    # The gathered word is a 4x2x4 occupancy brick: up to dda_substeps
    # reference loop iterations (lines 123-199) run against it on the
    # VPU before the next gather.  A lane stops sub-stepping when it
    # hits, goes OOB, exhausts the budget, reaches a probe boundary
    # (i % 8 == 7, line 127), or leaves the brick.
    l_ix, l_iy, l_iz = s["ix"], s["iy"], s["iz"]
    l_tmx, l_tmy, l_tmz = s_tmx, s_tmy, s_tmz
    l_mask = _get(flags, _MK_SH, _MK_W)
    l_dda = dda_i
    l_its = ns["its"]
    false = action_turn & False
    hit_acc, miss_acc, stepped = false, false, false
    dda_exit_lo, dda_exit_hi = false, false
    act = action_turn
    for _k in range(max(rcfg.dda_substeps, 1)):
        # loop-top its++ (line 124)
        l_its = jnp.where(act, l_its + 1, l_its)
        # bounds check (lines 144-147); in volume-sharded mode an
        # interior z face is a handoff, not a miss
        oob_k = act & ((l_ix < 0) | (l_iy < 0) | (l_iz < 0)
                       | (l_ix >= size_x) | (l_iy >= size_y)
                       | (l_iz >= size_z))
        if z_edges is not None:
            xy_in = ((l_ix >= 0) & (l_iy >= 0)
                     & (l_ix < size_x) & (l_iy < size_y))
            ex_lo = act & xy_in & (l_iz < 0) & ~z_edges[0]
            ex_hi = act & xy_in & (l_iz >= size_z) & ~z_edges[1]
            dda_exit_lo |= ex_lo
            dda_exit_hi |= ex_hi
            oob_k &= ~(ex_lo | ex_hi)
            act &= ~(ex_lo | ex_hi)
        miss_acc |= oob_k
        act &= ~oob_k
        # solid hit (lines 149-168): freeze; payload comes post-loop
        _, bitpos_k = _brick_word_index(cfg, l_ix, l_iy, l_iz)
        solid_k = ((word >> bitpos_k.astype(_U32)) & _U32(1)) != 0
        hit_k = act & solid_k
        hit_acc |= hit_k
        act &= ~hit_k
        # branchless axis step (lines 172-192)
        step_x = act & (l_tmx < l_tmy) & (l_tmx < l_tmz)
        step_y = act & ~step_x & (l_tmy < l_tmz)
        step_z = act & ~step_x & ~step_y
        l_tmx = jnp.where(step_x, l_tmx + ddx, l_tmx)
        l_tmy = jnp.where(step_y, l_tmy + ddy, l_tmy)
        l_tmz = jnp.where(step_z, l_tmz + ddz, l_tmz)
        l_ix = jnp.where(step_x, l_ix + stx, l_ix)
        l_iy = jnp.where(step_y, l_iy + sty, l_iy)
        l_iz = jnp.where(step_z, l_iz + stz, l_iz)
        l_mask = jnp.where(step_x, MASK_X,
                           jnp.where(step_y, MASK_Y,
                                     jnp.where(step_z, MASK_Z, l_mask)))
        stepped |= act
        l_dda = jnp.where(act, l_dda + 1, l_dda)
        # budget exhausted without a jump -> miss (loop end, line 199)
        bud = act & (l_dda >= rcfg.max_dda_steps)
        miss_acc |= bud
        act &= ~bud
        if _k + 1 < rcfg.dda_substeps:
            due = (l_dda & probe_mask) == probe_mask
            nwi, _ = _brick_word_index(cfg, l_ix, l_iy, l_iz)
            act &= ~due & (nwi == widx_bit)
    ns["ix"] = jnp.where(action_turn, l_ix, ns["ix"])
    ns["iy"] = jnp.where(action_turn, l_iy, ns["iy"])
    ns["iz"] = jnp.where(action_turn, l_iz, ns["iz"])
    if carry_tm:
        ns["tmx"] = jnp.where(action_turn, l_tmx, ns["tmx"])
        ns["tmy"] = jnp.where(action_turn, l_tmy, ns["tmy"])
        ns["tmz"] = jnp.where(action_turn, l_tmz, ns["tmz"])
    ns["its"] = l_its
    nflags = jnp.where(action_turn,
                       _set(_set(nflags, _MK_SH, _MK_W, l_mask),
                            _DD_SH, _DD_W, l_dda), nflags)
    nflags = jnp.where(stepped, nflags & ~(1 << _PR_SH), nflags)
    nflags = jnp.where(hit_acc, _set(nflags, _PH_SH, _PH_W, PHASE_HIT),
                       nflags)
    nflags = jnp.where(miss_acc, _set(nflags, _PH_SH, _PH_W, PHASE_MISS),
                       nflags)
    if z_edges is not None:
        nflags = jnp.where(dda_exit_lo,
                           _set(nflags, _PH_SH, _PH_W, PHASE_EXIT_LO),
                           nflags)
        nflags = jnp.where(dda_exit_hi,
                           _set(nflags, _PH_SH, _PH_W, PHASE_EXIT_HI),
                           nflags)

    ns["flags"] = nflags
    return ns


def trace(bits: jax.Array, sdf: jax.Array, cfg: WorldConfig,
          rcfg: RenderConfig,
          ox, oy, oz, dx, dy, dz, t_start,
          quantize_start_fp16: bool = True,
          table: jax.Array | None = None,
          row_tiles: int | None = None,
          sky_y=None, z_edges=None,
          _return_resume: bool = False) -> TraceResult:
    """Trace rays (any common broadcast shape) through the world.

    ``t_start`` mirrors the reference's ``half distance`` parameter: the
    march origin is ``origin + t_start * dir`` (raytracing_functions.cu:90),
    quantized through fp16 like the implicit CUDA float->half conversion.

    ``sky_y``: optional traced scalar = 1 + the highest solid voxel's y.
    Upward rays at or above it can never hit and retire immediately instead
    of marching to the world boundary - image-identical to the reference
    (those rays miss either way; only the ``its`` work counter shrinks).
    Dominant win for sun-shadow and GI sun-visibility rays.

    ``z_edges``: volume-sharded tracing (parallel/volume.py).  A pair of
    traced bool scalars (is_first, is_last): leaving the world in -z/+z is
    a real miss only on the first/last z-slab shard; elsewhere the ray
    retires as PHASE_EXIT_LO/HI with its exit position in the payload, to
    be handed to the neighbor shard over ICI.
    """
    if table is None:
        table = make_trace_table(bits, sdf, cfg)

    shape = jnp.broadcast_shapes(
        jnp.shape(ox), jnp.shape(oy), jnp.shape(oz),
        jnp.shape(dx), jnp.shape(dy), jnp.shape(dz), jnp.shape(t_start))

    args = tuple(jnp.broadcast_to(jnp.asarray(a, _F32), shape)
                 for a in (ox, oy, oz, dx, dy, dz, t_start))

    n_total = 1
    for s_ in shape:
        n_total *= s_
    if (rcfg.straggler_budget > 0 and z_edges is None
            and not _return_resume and n_total >= 4 * 4096):
        return _trace_two_phase(table, cfg, rcfg, args, shape,
                                quantize_start_fp16, sky_y, row_tiles)

    if len(shape) == 2:
        h, w = shape
        if row_tiles is not None:
            ty = row_tiles if h % row_tiles == 0 else 1
        else:
            ty = _pick_tile_count(h, rcfg.trace_tile_rows, min_size=8)
        tx = _pick_tile_count(w, rcfg.trace_tile_cols, min_size=128,
                              pad_penalty=1000)
    else:
        ty = tx = 1
    if ty * tx > 1:
        h, w = shape
        th, tw = h // ty, w // tx
        # (h, w) -> (ty*tx, th, tw) spatial blocks: rays in a block are
        # spatially coherent, so whole blocks converge (and retire) together
        tiled = tuple(
            a.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3)
            .reshape(ty * tx, th, tw) for a in args)
        res = jax.lax.map(
            lambda t: _trace_impl(table, cfg, rcfg, *t,
                                  quantize_start_fp16=quantize_start_fp16,
                                  sky_y=sky_y, z_edges=z_edges,
                                  return_resume=_return_resume),
            tiled)
        out = tuple(
            r.reshape(ty, tx, th, tw).transpose(0, 2, 1, 3).reshape(h, w)
            for r in res)
        return TraceResult(*out)
    return _trace_impl(table, cfg, rcfg, *args,
                       quantize_start_fp16=quantize_start_fp16, sky_y=sky_y,
                       z_edges=z_edges, return_resume=_return_resume)


def _trace_two_phase(table, cfg: WorldConfig, rcfg: RenderConfig, args,
                     shape, quantize_start_fp16: bool, sky_y,
                     row_tiles) -> TraceResult:
    """Straggler respite: short-budget phase 1 over every lane, then the
    few unfinished rays compacted into DENSE tiles and finished.

    Tile retirement makes the superstep loop pay the tile's WORST lane:
    silhouette-grazing stragglers run 100+ supersteps while the tile mean
    needs ~10, a measured 4-5x tax at 1280x800/1024^3 (mean its 10.4,
    ~42 supersteps/tile).  Phase 1 caps the budget at
    ``rcfg.straggler_budget`` supersteps; lanes still marching export a
    resume point (exit_dir 2/3, _trace_impl return_resume) and are packed
    with ``jnp.nonzero(size=cap)`` into a buffer of
    ``straggler_cap_frac * N`` lanes that re-enters the tracer at full
    budget.  Traversal is memoryless in position, so phase 2 finds the
    same surface: hit flags and normals match single-phase exactly;
    positions/UVs match to fp tolerance (tMax is re-derived from the
    resume point); ``its`` drifts by the resume re-entry accounting
    (+1 major entry for sphere lanes; DDA lanes additionally re-test the
    1-2 cells behind the backed-up resume point - approximated by the
    -2 correction below, so its is exact for sphere lanes and +-2 for
    DDA lanes).  Stragglers beyond the cap (never observed under the
    2.5x margin; a documented bound, tested at forced-tiny caps) fall
    back to miss.
    """
    import dataclasses

    N = 1
    for s_ in shape:
        N *= s_
    rcfg1 = dataclasses.replace(rcfg, max_supersteps=rcfg.straggler_budget)
    r1 = trace(None, None, cfg, rcfg1, *args,
               quantize_start_fp16=quantize_start_fp16, table=table,
               row_tiles=row_tiles, sky_y=sky_y, _return_resume=True)
    r1 = jax.tree.map(lambda a: a.reshape(-1), r1)

    capn = -(-max(4096, int(N * rcfg.straggler_cap_frac)) // 4096) * 4096
    capn = min(capn, -(-N // 4096) * 4096)
    code = r1.exit_dir
    unfin = code >= 2
    take = jnp.nonzero(unfin, size=capn, fill_value=N)[0]
    ok = take < N
    gtake = jnp.minimum(take, N - 1)

    gather = lambda a: a[gtake]
    o2 = [gather(a.reshape(-1)) for a in args[:3]]
    d2 = [gather(a.reshape(-1)) for a in args[3:6]]
    code_t = gather(code)
    # resume t: exact current position (sphere) / 0.25 voxels BEHIND the
    # current-cell entry (DDA).  Backing up is the safety move: a DDA lane
    # whose budget expired right after stepping carries an entry point to a
    # cell whose solidity was never tested - resuming inside it would turn
    # a solid pending cell into a degenerate first-cell hit (normal = 0)
    # instead of the proper face hit.  Every point strictly before the
    # entry on the ray is in free space (the segment [0, first-hit) is
    # free by definition and prepass starts honor the conservative-start
    # contract), so the resumed sphere phase re-converges and the DDA
    # re-enters the pending cell through its face with the correct mask.
    t2 = gather(r1.t) - jnp.where(code_t == 3, _F32(0.25), _F32(0.0))
    t2 = jnp.maximum(t2, _F32(0.0))
    its1 = gather(r1.its)
    steps1 = gather(r1.steps)
    # park the padding slots at an OOB start (init-retire)
    o2 = [jnp.where(ok, v, _F32(-10.0)) for v in o2]
    t2 = jnp.where(ok, t2, _F32(0.0))

    shp2 = (capn // 4096, 4096)
    rcfg2 = dataclasses.replace(rcfg, straggler_budget=0)
    r2 = trace(None, None, cfg, rcfg2,
               *[v.reshape(shp2) for v in o2 + d2], t2.reshape(shp2),
               quantize_start_fp16=False, table=table, sky_y=sky_y)
    r2 = jax.tree.map(lambda a: a.reshape(-1), r2)

    # merge: finished phase-2 lanes overwrite their phase-1 slots
    ids = jnp.where(ok, take, N)  # N -> scatter mode="drop"
    corr = jnp.where(code_t == 3, _I32(2), _I32(1))
    its2 = jnp.maximum(its1 + r2.its - corr, its1)
    put = lambda f1, f2: f1.at[ids].set(f2, mode="drop")
    out = TraceResult(
        hit=put(r1.hit, r2.hit),
        px=put(r1.px, r2.px), py=put(r1.py, r2.py), pz=put(r1.pz, r2.pz),
        nx=put(r1.nx, r2.nx), ny=put(r1.ny, r2.ny), nz=put(r1.nz, r2.nz),
        uv_u=put(r1.uv_u, r2.uv_u), uv_v=put(r1.uv_v, r2.uv_v),
        its=put(r1.its, its2), t=put(r1.t, r2.t),
        exit_dir=jnp.zeros_like(r1.exit_dir),
        steps=put(r1.steps, steps1 + r2.steps))
    # over-cap stragglers (if any) degrade to the miss payload; the
    # ``degraded`` flag makes that loss observable instead of silent
    leftover = unfin.at[ids].set(False, mode="drop")
    out = out._replace(
        px=jnp.where(leftover, _F32(MISS_POS), out.px),
        py=jnp.where(leftover, _F32(MISS_POS), out.py),
        pz=jnp.where(leftover, _F32(MISS_POS), out.pz),
        t=jnp.where(leftover, _F32(0.0), out.t),
        degraded=leftover)
    return jax.tree.map(lambda a: a.reshape(shape), out)


def _trace_impl(table, cfg: WorldConfig, rcfg: RenderConfig,
                ox, oy, oz, dx, dy, dz, t0,
                quantize_start_fp16: bool, sky_y=None,
                z_edges=None, return_resume: bool = False) -> TraceResult:
    if quantize_start_fp16:
        t0 = t0.astype(jnp.float16).astype(_F32)

    bits_len = cfg.num_words
    table_len = bits_len + cfg.sdf_num_cells // 4

    big = _F32(1e10)
    ddx = jnp.where(dx != 0, jnp.abs(1.0 / dx), big)
    ddy = jnp.where(dy != 0, jnp.abs(1.0 / dy), big)
    ddz = jnp.where(dz != 0, jnp.abs(1.0 / dz), big)
    stx = jnp.sign(dx).astype(_I32)
    sty = jnp.sign(dy).astype(_I32)
    stz = jnp.sign(dz).astype(_I32)

    size_x, size_y, size_z = cfg.size_x, cfg.size_y, cfg.size_z

    # varying-typed zeros (shard_map-safe carry init)
    zf = (ox + oy + oz + dx + dy + dz + t0) * _F32(0.0)
    zi = zf.astype(_I32)

    px0 = ox + t0 * dx
    py0 = oy + t0 * dy
    pz0 = oz + t0 * dz

    # ---- init-time retirement ----
    # Lanes that the FIRST supersteps would only discover are dead (sky-out,
    # slab exit, OOB start) retire before the loop, with the exact phase/its
    # the in-loop path would produce; a tile whose lanes are all dead then
    # fails the loop condition immediately instead of paying ~2 supersteps
    # over every lane (measured 70 ms per parked 720p trace call).  Order
    # mirrors the body: sky first, then slab exits, then sphere OOB.
    ph0 = zi + PHASE_SPHERE
    its0 = zi + 1  # major-loop entry counts one (line 107)
    live0 = jnp.ones_like(px0, bool)
    if sky_y is not None:
        sky0 = (dy >= 0) & (py0 >= sky_y)
        ph0 = jnp.where(sky0, PHASE_MISS, ph0)
        live0 &= ~sky0
    if z_edges is not None:
        xy_in0 = (px0 >= 0) & (py0 >= 0) & (px0 < size_x) & (py0 < size_y)
        ex_lo0 = live0 & xy_in0 & (pz0 < 0) & ~z_edges[0]
        ex_hi0 = live0 & xy_in0 & (pz0 >= size_z) & ~z_edges[1]
        ph0 = jnp.where(ex_lo0, PHASE_EXIT_LO, ph0)
        ph0 = jnp.where(ex_hi0, PHASE_EXIT_HI, ph0)
        live0 &= ~(ex_lo0 | ex_hi0)
    oob0 = live0 & (
        (px0 < 0) | (py0 < 0) | (pz0 < 0)
        | (px0 >= size_x) | (py0 >= size_y) | (pz0 >= size_z))
    ph0 = jnp.where(oob0, PHASE_MISS, ph0)
    # OOB start: sphere returns (-100)^3, DDA's loop-top its++ then the
    # bounds check misses -> its == 2 (lines 124, 144-147)
    its0 = jnp.where(oob0, its0 + 1, its0)

    slim = rcfg.slim_carry
    state = dict(
        px=px0, py=py0, pz=pz0,
        ix=zi, iy=zi, iz=zi,
        flags=_set(_set(zi, _MK_SH, _MK_W, MASK_NONE), _PH_SH, _PH_W, ph0),
        its=its0,
        step=jnp.zeros((), _I32),
    )
    if not slim:
        state.update(tmx=zf, tmy=zf, tmz=zf)

    def recompute_tmax(px_, ix_, st_, dd_):
        """tMax for the current DDA cell from the frozen DDA-entry position:
        the distance along the ray to the next boundary on this axis.
        Algebraically equal to the incrementally-carried value (entry value
        (floor+-frac)*dd plus k steps of +dd telescopes to this), to float
        rounding.  Guard: a zero-direction lane whose entry position sits
        exactly on a boundary would recompute 0 forever (the incremental
        carry escapes by one no-move step); park it at +inf instead."""
        ixf = ix_.astype(_F32)
        tm = jnp.where(st_ > 0, ixf + 1.0 - px_, px_ - ixf) * dd_
        return jnp.where((st_ == 0) & (tm == 0.0), big, tm)

    # Fused Pallas superstep: same math (_superstep_pregather/_update are
    # shared verbatim), with the post-gather state machine compiled by
    # Mosaic over the whole tile in VMEM.  Unsupported combos fall back.
    fused = rcfg.fused_superstep and not slim and z_edges is None

    def body(s):
        if slim:
            # re-derive the 6 direction invariants from the (already-read)
            # direction instead of re-reading them from HBM each superstep;
            # the barrier pins the computation inside the loop body (XLA's
            # loop-invariant code motion would otherwise hoist + rematerialize
            # them as HBM-resident loop inputs, undoing the traffic saving)
            dxb, dyb, dzb = jax.lax.optimization_barrier((dx, dy, dz))
            l_ddx = jnp.where(dxb != 0, jnp.abs(1.0 / dxb), big)
            l_ddy = jnp.where(dyb != 0, jnp.abs(1.0 / dyb), big)
            l_ddz = jnp.where(dzb != 0, jnp.abs(1.0 / dzb), big)
            l_stx = jnp.sign(dxb).astype(_I32)
            l_sty = jnp.sign(dyb).astype(_I32)
            l_stz = jnp.sign(dzb).astype(_I32)
            s_tmx = recompute_tmax(s["px"], s["ix"], l_stx, l_ddx)
            s_tmy = recompute_tmax(s["py"], s["iy"], l_sty, l_ddy)
            s_tmz = recompute_tmax(s["pz"], s["iz"], l_stz, l_ddz)
        else:
            l_ddx, l_ddy, l_ddz = ddx, ddy, ddz
            l_stx, l_sty, l_stz = stx, sty, stz
            s_tmx, s_tmy, s_tmz = s["tmx"], s["tmy"], s["tmz"]
        dirs_l = (dx, dy, dz, l_ddx, l_ddy, l_ddz, l_stx, l_sty, l_stz)
        pre = _superstep_pregather(cfg, rcfg, dirs_l, s,
                                   sky_y=sky_y, z_edges=z_edges)
        # ---------- THE gather (one per superstep) ----------
        word = jnp.take(table, pre["widx"], mode="clip")
        if fused:
            from rvgrt_tpu.ops import superstep_kernel
            ns = superstep_kernel.fused_superstep(
                cfg, rcfg, dirs_l, s, word, sky_y=sky_y)
        else:
            ns = _superstep_update(cfg, rcfg, dirs_l,
                                   (s_tmx, s_tmy, s_tmz), s, pre, word,
                                   z_edges=z_edges, carry_tm=not slim)
        ns["step"] = s["step"] + 1
        return ns

    def cond(s):
        phase = _get(s["flags"], _PH_SH, _PH_W)
        return (s["step"] < rcfg.max_supersteps) & \
               jnp.any(phase < PHASE_MISS)

    k = rcfg.steps_per_check

    def outer_body(s):
        s, _ = jax.lax.scan(lambda c, _: (body(c), None), s, None, length=k)
        return s

    final = jax.lax.while_loop(cond, outer_body, state)

    # ---------------- post-loop hit payload ----------------
    flags = final["flags"]
    phase = _get(flags, _PH_SH, _PH_W)
    m = _get(flags, _MK_SH, _MK_W)
    hit = phase == PHASE_HIT
    stxf = stx.astype(_F32)
    styf = sty.astype(_F32)
    stzf = stz.astype(_F32)
    if slim:
        ftmx = recompute_tmax(final["px"], final["ix"], stx, ddx)
        ftmy = recompute_tmax(final["py"], final["iy"], sty, ddy)
        ftmz = recompute_tmax(final["pz"], final["iz"], stz, ddz)
    else:
        ftmx, ftmy, ftmz = final["tmx"], final["tmy"], final["tmz"]
    t_hit = jnp.where(
        m == MASK_X, ftmx - ddx,
        jnp.where(m == MASK_Y, ftmy - ddy,
                  jnp.where(m == MASK_Z, ftmz - ddz, _F32(0.0))))
    hx = final["px"] + t_hit * dx
    hy = final["py"] + t_hit * dy
    hz = final["pz"] + t_hit * dz
    first_cell = m == MASK_NONE
    hx = jnp.where(first_cell, final["px"], hx)
    hy = jnp.where(first_cell, final["py"], hy)
    hz = jnp.where(first_cell, final["pz"], hz)
    nx = jnp.where(hit & (m == MASK_X), -stxf, 0.0)
    ny = jnp.where(hit & (m == MASK_Y), -styf, 0.0)
    nz = jnp.where(hit & (m == MASK_Z), -stzf, 0.0)
    fx_ = final["ix"].astype(_F32)
    fy_ = final["iy"].astype(_F32)
    fz_ = final["iz"].astype(_F32)
    # per-face UV with orientation flips (lines 156-166)
    uvu = jnp.where(m == MASK_X, hy - fy_, hx - fx_)
    uvu_z = jnp.where(stz == 1, 1.0 - uvu, uvu)
    uvu = jnp.where(m == MASK_Z, uvu_z, uvu)
    uvu = jnp.where(first_cell, 0.0, uvu)
    uvv_x = jnp.where(stx == -1, 1.0 - (hz - fz_), hz - fz_)
    uvv = jnp.where(m == MASK_X, uvv_x,
                    jnp.where(m == MASK_Y, hz - fz_,
                              jnp.where(m == MASK_Z, hy - fy_, 0.0)))
    if z_edges is not None:
        # exit lanes reuse the hit-position reconstruction: the entry
        # point of the first out-of-slab cell (DDA) or the sphere position
        # (mask forced to NONE at exit time); t likewise
        exit_lo = phase == PHASE_EXIT_LO
        exit_hi = phase == PHASE_EXIT_HI
        exited = exit_lo | exit_hi
        keep = hit | exited
        exit_dir = jnp.where(exit_lo, -1, jnp.where(exit_hi, 1, 0))
    elif return_resume:
        # straggler respite (trace() two-phase scheme): lanes still in
        # SPHERE/DDA when the superstep budget ran out export a resume
        # point instead of reading as misses.  exit_dir 2 = sphere lane
        # (resume at its current march position); 3 = DDA lane (payload =
        # entry point of its current cell; the caller backs the resume up
        # 0.25 voxels because that cell's solidity may not have been
        # tested yet).  Traversal is memoryless in position, so phase 2
        # finds the same surface; ``its`` drifts by the re-entry
        # accounting, corrected approximately by the caller.
        unf_sphere = phase == PHASE_SPHERE
        unf_dda = phase == PHASE_DDA
        unfinished = unf_sphere | unf_dda
        # sphere lanes: current position; DDA lanes: current-cell entry
        # (the hx/hy/hz reconstruction above)
        hx = jnp.where(unf_sphere, final["px"], hx)
        hy = jnp.where(unf_sphere, final["py"], hy)
        hz = jnp.where(unf_sphere, final["pz"], hz)
        keep = hit | unfinished
        exit_dir = jnp.where(unf_sphere, 2, jnp.where(unf_dda, 3, 0))
    else:
        keep = hit
        exit_dir = jnp.zeros_like(final["its"])
    out_px = jnp.where(keep, hx, _F32(MISS_POS))
    out_py = jnp.where(keep, hy, _F32(MISS_POS))
    out_pz = jnp.where(keep, hz, _F32(MISS_POS))
    t_out = jnp.where(
        keep,
        (out_px - ox) * dx + (out_py - oy) * dy + (out_pz - oz) * dz,
        _F32(0.0))
    return TraceResult(
        hit=hit, px=out_px, py=out_py, pz=out_pz,
        nx=nx, ny=ny, nz=nz,
        uv_u=jnp.where(hit, uvu, 0.0), uv_v=jnp.where(hit, uvv, 0.0),
        its=final["its"], t=t_out, exit_dir=exit_dir,
        steps=jnp.broadcast_to(final["step"], hit.shape),
        degraded=jnp.zeros_like(hit))
