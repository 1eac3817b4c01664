"""Phase-3 scaling: voxel-volume sharding with a ray-handoff ring over ICI.

For worlds beyond one chip's HBM (SURVEY.md §5.7/§7 phase 3), the voxel
grid + SDF are sharded in z-slabs: each device holds only its slab's tracer
gather table.  Rays are traced by the device that owns their current slab;
a ray crossing a slab face retires as ``PHASE_EXIT_LO/HI`` in the wavefront
tracer (``trace/wavefront.py``, ``z_edges``) and is handed to the z
neighbor with one ``ppermute`` per direction per round - the ray-queue ring
analogue of ring attention's block passing.  A ray's z progress is
monotone (the DDA step sign never changes), so ``n_shards + 2`` rounds
resolve every ray; terminal rays scatter their payload into a per-device
result buffer that is ``psum``-reduced at the end.

Differences vs single-device tracing (documented, tested):
* a handed-off ray RESTARTS its sphere phase and iteration budgets in the
  neighbor slab (the hybrid traversal is memoryless given a position, so
  hit results match; the ``its`` counter is the sum over visited shards);
* SDF values are sampled from the owning slab only, clamped at slab faces
  (the stored distances were computed globally, so they remain valid
  lower bounds inside the slab).

Buffer capacity stays at the full ray set per device (camera rays all
start in one slab, so any device can legitimately own every ray), but two
load-balancing levers keep the ring from paying full cost everywhere:
devices with an empty buffer skip the whole trace for that round
(``lax.cond``), and ``handoff_cap`` bounds each ppermute packet with
overflow-retry (exit rays that don't fit stay local one more round).  The
world MEMORY is what this shards - the point for 2048^3+ streaming worlds.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rvgrt_tpu.config import RenderConfig, WorldConfig
from rvgrt_tpu.trace import wavefront

_F32 = jnp.float32
_I32 = jnp.int32


def local_config(cfg: WorldConfig, n_shards: int) -> WorldConfig:
    """WorldConfig of one z-slab (power-of-two shard counts only)."""
    lg = int(math.log2(n_shards))
    assert 1 << lg == n_shards, n_shards
    assert cfg.shift_z - lg >= 2, "slab must be >= one 4-deep brick"
    return dataclasses.replace(cfg, shift_z=cfg.shift_z - lg)


def build_shard_tables(bits: jax.Array, sdf: jax.Array, cfg: WorldConfig,
                       mesh: Mesh, axis: str = "z") -> jax.Array:
    """(n, local_table_len) stacked per-slab gather tables, sharded so each
    device holds exactly its slab (the world-memory win)."""
    n = mesh.shape[axis]
    lcfg = local_config(cfg, n)
    zs = cfg.size_z // n
    vol = bits.reshape(cfg.size_z, cfg.size_y, cfg.size_x // 32)
    svol = sdf.reshape(cfg.sdf_size_z, cfg.sdf_size_y, cfg.sdf_size_x)
    czs = cfg.sdf_size_z // n
    tables = [
        wavefront.make_trace_table(
            vol[i * zs:(i + 1) * zs].reshape(-1),
            svol[i * czs:(i + 1) * czs].reshape(-1), lcfg)
        for i in range(n)
    ]
    stacked = jnp.stack(tables)
    return jax.device_put(stacked, NamedSharding(mesh, P(axis)))


def _pack(valid, fields, capacity: int, id_sentinel: int):
    """Stable-pack the ``valid`` lanes of ``fields`` into ``capacity``
    slots; overflow lanes are dropped, empty slots get ``id_sentinel``
    (fields[0] must be the ray id)."""
    order = jnp.argsort(~valid)  # valid lanes first, stable
    take = order[:capacity]
    ok = valid[take]
    out = [jnp.where(ok, fields[0][take], id_sentinel)]
    out += [f[take] for f in fields[1:]]
    return out, ok


def trace_ring(tbl: jax.Array, cfg: WorldConfig, rcfg: RenderConfig,
               n_shards: int, ox, oy, oz, dx, dy, dz, t0,
               sky_y=None, axis: str = "z",
               rounds: int | None = None,
               handoff_cap: int | None = None) -> dict:
    """Per-device body of the volume-sharded trace: claim rays whose march
    start lies in this device's z-slab, trace against the local table,
    hand slab-crossers to the z neighbors over the ``axis`` ring, repeat;
    returns psum-merged (replicated) result arrays of length cap >= N.

    Must run INSIDE a ``shard_map`` over ``axis`` (``trace_volume_sharded``
    wraps it for standalone use; ``render_frame_volume`` calls it per
    pipeline trace).  Ray inputs must be identical on every device.

    ``handoff_cap`` bounds each per-round per-direction ppermute packet
    (default: full buffer capacity).  Exit rays that do not fit stay in
    the local buffer and retry next round (their out-of-slab start
    re-classifies as an exit immediately, costing ~no trace work); the
    default ``rounds`` grows by ceil(cap/handoff_cap) to absorb retries.
    Load-balancing lever: with coherent camera rays only a small fraction
    crosses a face per round, so ICI bytes shrink by cap/handoff_cap.
    """
    n = n_shards
    lcfg = local_config(cfg, n)
    slab = float(cfg.size_z // n)
    N = ox.shape[0]
    cap = -(-N // 4096) * 4096  # trace buffers run as (cap/4096, 4096)
    hcap = cap if handoff_cap is None else min(handoff_cap, cap)
    if rounds is None:
        rounds = n + 2 + (0 if hcap == cap else -(-cap // hcap))
    sentinel = cap  # out-of-range id -> scatter mode="drop" discards

    def pad(a, fill):
        return jnp.pad(a, (0, cap - N), constant_values=fill)

    ids0 = pad(jnp.arange(N, dtype=_I32), sentinel)
    rox, roy, roz = pad(ox, -10.0), pad(oy, -10.0), pad(oz, -10.0)
    rdx, rdy, rdz = pad(dx, 1.0), pad(dy, 0.0), pad(dz, 0.0)
    # the reference's fp16 start-distance quantization is applied ONCE to
    # the caller's t0; handoff resume distances stay fp32 (re-quantizing
    # them could round a resumed ray back across the slab face forever)
    rt0 = pad(jnp.asarray(t0, _F32).astype(jnp.float16).astype(_F32), 0.0)

    zi = jax.lax.axis_index(axis)
    z0 = zi.astype(_F32) * _F32(slab)
    is_first = zi == 0
    is_last = zi == n - 1

    # claim the rays whose march START lies in my slab (clamped: rays
    # starting outside the world go to the nearest edge shard, whose
    # z_edges flags turn them into the reference's OOB-start miss)
    sz = roz + rt0 * rdz
    owner = jnp.clip(jnp.floor(sz / _F32(slab)).astype(_I32), 0, n - 1)
    my0 = (ids0 < sentinel) & (owner == zi)

    fields0 = [ids0, rox, roy, roz, rdx, rdy, rdz, rt0,
               jnp.zeros_like(ids0),   # accumulated its
               jnp.zeros_like(ids0)]   # resumed (crossed a slab face)
    packed, _ = _pack(my0, fields0, cap, sentinel)
    # the scan carry becomes device-varying after the first ppermute;
    # mark any still-replicated initial carry component varying to match.
    # Target = the ring axis PLUS every axis the ray inputs already vary
    # over (on a 2-D ('slice','chip') mesh the rays vary over 'slice' —
    # each slice traces its own row band — so cond/scan branches must
    # agree on the full (slice, chip) vma, not just the ring axis).
    _target_vma = {axis}
    for _a in (ox, oy, oz, dx, dy, dz, t0):
        _target_vma |= set(jax.typeof(_a).vma)

    def _vary(f):
        need = tuple(_target_vma - set(jax.typeof(f).vma))
        return jax.lax.pcast(f, need, to="varying") if need else f

    packed = [_vary(f) for f in packed]

    # zero-initialized so the final psum-merge across shards is a
    # plain sum (each terminal ray is scattered by exactly one shard)
    zeros_out = dict(
        hit=jnp.zeros((cap,), _I32),
        px=jnp.zeros((cap,), _F32), py=jnp.zeros((cap,), _F32),
        pz=jnp.zeros((cap,), _F32),
        nx=jnp.zeros((cap,), _F32), ny=jnp.zeros((cap,), _F32),
        nz=jnp.zeros((cap,), _F32),
        uv_u=jnp.zeros((cap,), _F32), uv_v=jnp.zeros((cap,), _F32),
        its=jnp.zeros((cap,), _I32), t=jnp.zeros((cap,), _F32))

    def round_body(carry, _):
        fields, out = carry
        rid, qox, qoy, qoz, qdx, qdy, qdz, qt, qits, qres = fields
        live = rid < sentinel
        # park empty slots at an OOB start (retire in ~2 supersteps);
        # t must be zeroed too or garbage t*dir can re-enter the world
        pox = jnp.where(live, qox, -10.0)
        poz = jnp.where(live, qoz - z0, -10.0)
        pt = jnp.where(live, qt, 0.0)
        shp = (-1, 4096)

        def do_trace():
            r = wavefront.trace(
                None, None, lcfg, rcfg,
                pox.reshape(shp), qoy.reshape(shp), poz.reshape(shp),
                qdx.reshape(shp), qdy.reshape(shp), qdz.reshape(shp),
                pt.reshape(shp), table=tbl, sky_y=sky_y,
                z_edges=(is_first, is_last), quantize_start_fp16=False)
            # .steps can come out replicated (pure loop-counter); unify
            return jax.tree.map(lambda a: _vary(a.reshape(-1)), r)

        def no_trace():
            f32 = lambda: jnp.zeros((cap,), _F32)
            i32 = lambda: jnp.zeros((cap,), _I32)
            r = wavefront.TraceResult(
                hit=jnp.zeros((cap,), bool), px=f32(), py=f32(), pz=f32(),
                nx=f32(), ny=f32(), nz=f32(), uv_u=f32(), uv_v=f32(),
                its=i32(), t=f32(), exit_dir=i32(), steps=i32(),
                degraded=jnp.zeros((cap,), bool))
            return jax.tree.map(_vary, r)  # match do_trace's varying vma

        # devices with an empty buffer skip the whole superstep machine
        # (in round 0 every ray starts in ONE slab for camera frames -
        # without this, the other n-1 devices pay the full parked-trace
        # floor every round)
        res = jax.lax.cond(jnp.any(live), do_trace, no_trace)

        term = live & (res.exit_dir == 0)
        sids = jnp.where(term, rid, sentinel)
        tot_its = qits + res.its
        # a handed-off ray that hits in its FIRST DDA cell gets the
        # reference's undefined-first-cell normal (zero); but it entered
        # this slab through the z face by construction, so the true face
        # normal is (0, 0, -sign(dz)).  Patch it - otherwise slab-boundary
        # hits shade with a degenerate normal (visible seam at slab faces)
        zero_n = (res.nx == 0) & (res.ny == 0) & (res.nz == 0)
        fix_n = res.hit & (qres != 0) & zero_n
        nz_fix = jnp.where(fix_n, -jnp.sign(qdz), res.nz)
        # ... and the matching z-face UV (wavefront.py uv construction,
        # MASK_Z branch): u = frac(x) flipped when stepping +z, v = frac(y)
        frac_x = res.px - jnp.floor(res.px)
        frac_y = res.py - jnp.floor(res.py)
        uvu_fix = jnp.where(qdz > 0, 1.0 - frac_x, frac_x)
        uv_u_fix = jnp.where(fix_n, uvu_fix, res.uv_u)
        uv_v_fix = jnp.where(fix_n, frac_y, res.uv_v)
        upd = dict(
            hit=res.hit.astype(_I32), px=res.px, py=res.py,
            pz=jnp.where(res.hit, res.pz + z0, res.pz),
            nx=res.nx, ny=res.ny, nz=nz_fix,
            uv_u=uv_u_fix, uv_v=uv_v_fix, its=tot_its, t=res.t)
        out = {k: out[k].at[sids].set(upd[k], mode="drop")
               for k in out}

        # hand off exits: global exit position -> resume t just past
        # the slab face (guards fp ping-pong across the boundary)
        ex_lo = live & (res.exit_dir < 0)
        ex_hi = live & (res.exit_dir > 0)
        gz = res.pz + z0
        face = jnp.where(ex_hi, z0 + slab + 1e-3, z0 - 1e-3)
        t_face = jnp.where(qdz != 0, (face - qoz) / qdz, 0.0)
        t_exit = ((res.px - qox) * qdx + (res.py - qoy) * qdy
                  + (gz - qoz) * qdz)
        t_new = jnp.maximum(t_exit, t_face)
        send = [rid, qox, qoy, qoz, qdx, qdy, qdz, t_new, tot_its,
                jnp.ones_like(rid)]
        if hcap < cap:
            # bounded packets: only the first hcap exits per direction
            # ship this round; the rest stay local and retry (their
            # out-of-slab resume start re-exits immediately next round)
            def bounded(valid):
                rank = jnp.cumsum(valid.astype(_I32)) - 1
                return valid & (rank < hcap)

            ship_lo, ship_hi = bounded(ex_lo), bounded(ex_hi)
            stay = (ex_lo & ~ship_lo) | (ex_hi & ~ship_hi)
        else:
            ship_lo, ship_hi = ex_lo, ex_hi
            stay = None
        lo_pkt, _ = _pack(ship_lo, send, hcap, sentinel)
        hi_pkt, _ = _pack(ship_hi, send, hcap, sentinel)
        down = [(i, (i - 1) % n) for i in range(n)]
        up = [(i, (i + 1) % n) for i in range(n)]
        recv_hi = [jax.lax.ppermute(f, axis, up) for f in hi_pkt]
        recv_lo = [jax.lax.ppermute(f, axis, down) for f in lo_pkt]
        # wrap-around slots carry no valid rays (edge shards convert
        # boundary exits to misses), but mask them anyway
        parts = [recv_hi, recv_lo]
        if stay is not None:
            stay_pkt = [jnp.where(stay, send[0], sentinel)] + send[1:]
            parts.append(stay_pkt)
        merged_valid = jnp.concatenate([p[0] < sentinel for p in parts])
        merged = [jnp.concatenate(fs) for fs in zip(*parts)]
        fields, _ = _pack(merged_valid, merged, cap, sentinel)
        return (fields, out), None

    zeros_out = {k: _vary(v) for k, v in zeros_out.items()}
    (fields, out), _ = jax.lax.scan(round_body, (packed, zeros_out),
                                    None, length=rounds)
    return {k: jax.lax.psum(v, axis) for k, v in out.items()}


def _ring_result(out: dict, N: int) -> wavefront.TraceResult:
    miss = out["hit"][:N] == 0
    fix = lambda v: v[:N]
    return wavefront.TraceResult(
        hit=fix(out["hit"]) != 0,
        px=jnp.where(miss, wavefront.MISS_POS, fix(out["px"])),
        py=jnp.where(miss, wavefront.MISS_POS, fix(out["py"])),
        pz=jnp.where(miss, wavefront.MISS_POS, fix(out["pz"])),
        nx=fix(out["nx"]), ny=fix(out["ny"]), nz=fix(out["nz"]),
        uv_u=fix(out["uv_u"]), uv_v=fix(out["uv_v"]),
        its=fix(out["its"]), t=fix(out["t"]),
        exit_dir=jnp.zeros((N,), _I32), steps=jnp.zeros((N,), _I32),
        degraded=jnp.zeros((N,), bool))


@functools.lru_cache(maxsize=None)
def _trace_volume_jit(cfg: WorldConfig, rcfg: RenderConfig, mesh: Mesh,
                      have_sky: bool, axis: str, rounds: int | None,
                      handoff_cap: int | None):
    """Cached jitted shard_map ring trace.  shard_map must never bind
    eagerly: the unjitted fallback interprets the tracer per device
    (minutes instead of seconds on the virtual CPU mesh)."""
    n = mesh.shape[axis]
    rep = P()

    def shard_fn(tbl, ox, oy, oz, dx, dy, dz, t0, sky_y):
        return trace_ring(tbl, cfg, rcfg, n, ox, oy, oz, dx, dy, dz, t0,
                          sky_y=sky_y, axis=axis, rounds=rounds,
                          handoff_cap=handoff_cap)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(axis),) + (rep,) * 8,
                   out_specs={k: P() for k in
                              ("hit", "px", "py", "pz", "nx", "ny", "nz",
                               "uv_u", "uv_v", "its", "t")})
    del have_sky  # cache key only (None vs traced scalar retraces)
    return jax.jit(fn)


def trace_volume_sharded(tables: jax.Array, cfg: WorldConfig,
                         rcfg: RenderConfig, mesh: Mesh,
                         ox, oy, oz, dx, dy, dz, t0,
                         sky_y=None, axis: str = "z",
                         rounds: int | None = None,
                         handoff_cap: int | None = None,
                         ) -> wavefront.TraceResult:
    """Trace flat ray arrays against the z-slab-sharded world.

    Inputs are replicated 1-D arrays of equal length N; returns a
    TraceResult of replicated (N,) arrays (exit_dir always 0).
    """
    N = ox.shape[0]
    fn = _trace_volume_jit(cfg, rcfg, mesh, sky_y is not None, axis, rounds,
                           handoff_cap)
    return _ring_result(fn(tables, ox, oy, oz, dx, dy, dz, t0, sky_y), N)


@functools.lru_cache(maxsize=None)
def _render_volume_jit(ecfg, mesh: Mesh, include_gi: bool, have_sky: bool,
                       axis: str, rounds: int | None,
                       handoff_cap: int | None):
    from rvgrt_tpu.render import pipeline
    from rvgrt_tpu.render.pipeline import CameraArrays, FrameOutputs

    n = mesh.shape[axis]
    cfg, rcfg = ecfg.world, ecfg.render

    def shard_fn(tbl, sdf_rep, gi_rep, atlas_rep, cam_rep, sky_y):
        def trace_fn(ox, oy, oz, dx, dy, dz, t0):
            shape = jnp.broadcast_shapes(
                jnp.shape(ox), jnp.shape(oy), jnp.shape(oz),
                jnp.shape(dx), jnp.shape(dy), jnp.shape(dz),
                jnp.shape(t0))
            flat = [jnp.broadcast_to(jnp.asarray(a, jnp.float32),
                                     shape).reshape(-1)
                    for a in (ox, oy, oz, dx, dy, dz, t0)]
            out = trace_ring(tbl, cfg, rcfg, n, *flat, sky_y=sky_y,
                             axis=axis, rounds=rounds,
                             handoff_cap=handoff_cap)
            res = _ring_result(out, flat[0].shape[0])
            return jax.tree.map(lambda a: a.reshape(shape), res)

        return pipeline.render_slab(
            None, sdf_rep, gi_rep, atlas_rep, cam_rep, ecfg,
            y0=jnp.int32(0), slab_h=rcfg.height, include_gi=include_gi,
            sky_y=sky_y, trace_fn=trace_fn)

    rep = P()
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), rep, rep, rep, CameraArrays(*([rep] * 8)), rep),
        out_specs=FrameOutputs(*([rep] * 5)))
    del have_sky  # cache key only
    return jax.jit(fn)


def render_frame_volume(tables: jax.Array, sdf_replicated, gi, atlas,
                        cam, ecfg, mesh: Mesh, include_gi: bool = True,
                        sky_y=None, axis: str = "z",
                        rounds: int | None = None,
                        handoff_cap: int | None = None):
    """Full per-frame pipeline against the z-slab-sharded world.

    Every ray cast the pipeline issues (cascade, prepass, shadows, primary,
    water pair) runs through the ray-handoff ring; shading/composition is
    computed redundantly on every device from the psum-merged trace
    results.  World MEMORY is what this shards (the bits + per-slab tables
    live sharded); the coarse SDF is replicated for the GI cone march -
    1/8 the bit volume in bytes.  Correctness-first, like
    ``trace_volume_sharded``; returns replicated FrameOutputs.  Runs as a
    cached jitted shard_map (eager binding interprets per device -
    minutes instead of seconds).
    """
    fn = _render_volume_jit(ecfg, mesh, include_gi, sky_y is not None,
                            axis, rounds, handoff_cap)
    return fn(tables, sdf_replicated, gi, atlas, cam, sky_y)
