"""Multi-chip scaling: pixel/ray data parallelism over a device mesh.

The reference is single-GPU (SURVEY.md §2.3); this module adds the device
axis the TPU way (§5.7/§5.8): a 1-D ``Mesh`` over a ``rays`` axis, the world
(bits / SDF / GI / atlas) replicated in every chip's HBM, and the frame's
pixel rows sharded - each device renders its own row slab with
``render_slab`` (recomputing a one-row half-res halo instead of exchanging
boundaries).  The only collectives are the implicit all-gather when the
caller assembles the image and an ``all_gather`` of GI window shards in the
distributed GI update.  Camera constants are replicated by closure - the
TPU-native replacement for ``cudaMemcpyToSymbol`` uniforms.

Phase 2/3 (volume sharding with ray-handoff rings over ICI for worlds beyond
one chip's HBM) layers on top of the same slab decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.gi import update as gi_update
from rvgrt_tpu.render import pipeline


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


@functools.lru_cache(maxsize=None)
def _render_sharded_jit(ecfg: EngineConfig, mesh: Mesh, include_gi: bool,
                        have_occ: bool):
    """Cached jitted shard_map for one (config, mesh) operating point.

    shard_map MUST run under jit here: binding it eagerly falls back to a
    per-device Python interpretation of the whole tracer while-loop -
    measured 25+ minutes for a 64x32 frame on the 8-virtual-CPU mesh,
    where the jitted program takes seconds."""
    n = mesh.shape["rays"]
    h = ecfg.render.height
    assert h % (2 * n) == 0, (h, n)
    slab_h = h // n

    def shard_fn(bits, sdf, gi, atlas, cam, gi_occ, sky_y, table):
        idx = jax.lax.axis_index("rays")
        y0 = (idx * slab_h).astype(jnp.int32)
        return pipeline.render_slab(bits, sdf, gi, atlas, cam, ecfg,
                                    y0=y0, slab_h=slab_h,
                                    include_gi=include_gi, gi_occ=gi_occ,
                                    sky_y=sky_y, table=table)

    rep = P()
    out_specs = pipeline.FrameOutputs(
        color=P("rays"), motion=P("rays"), depth=P("rays"),
        half_dist=P("rays"), half_shadow=P("rays"))
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(rep, rep, rep, rep,
                             pipeline.CameraArrays(*([rep] * 8)), rep, rep,
                             rep),
                   out_specs=out_specs)
    del have_occ  # part of the cache key only (None vs array retraces)
    return jax.jit(fn)


def render_frame_sharded(bits, sdf, gi, atlas, cam: pipeline.CameraArrays,
                         ecfg: EngineConfig, mesh: Mesh,
                         include_gi: bool = True, gi_occ=None, sky_y=None,
                         table=None) -> pipeline.FrameOutputs:
    """Render with pixel rows sharded across the mesh's ``rays`` axis.

    Returns FrameOutputs whose leading (row) axis is sharded; callers can
    ``jax.device_get`` to assemble (per-host shard fetch = the "present").
    """
    if gi_occ is None and ecfg.render.gi_fused_cone:
        from rvgrt_tpu.world import gi_grid
        gi_occ = gi_grid.build_occlusion(sdf, ecfg.world)
    if sky_y is None:
        from rvgrt_tpu.world import voxel_grid
        sky_y = voxel_grid.sky_limit(bits, ecfg.world)
    if table is None:
        from rvgrt_tpu.trace import wavefront
        table = wavefront.make_trace_table(bits, sdf, ecfg.world)
    fn = _render_sharded_jit(ecfg, mesh, include_gi, gi_occ is not None)
    return fn(bits, sdf, gi, atlas, cam, gi_occ, sky_y, table)


@functools.lru_cache(maxsize=None)
def _update_gi_sharded_jit(ecfg: EngineConfig, mesh: Mesh):
    """Cached jitted shard_map GI update (see _render_sharded_jit on why
    shard_map must never bind eagerly)."""
    n_dev = mesh.shape["rays"]
    n = ecfg.gi_window
    assert n % n_dev == 0
    per_dev = n // n_dev

    import dataclasses
    sub_ecfg = dataclasses.replace(ecfg, gi_rays_per_frame=per_dev)

    def shard_fn(gi, bits, sdf, atlas, frame, offset, sky_y, table):
        idx = jax.lax.axis_index("rays")
        my_off = offset + idx.astype(jnp.int32) * per_dev
        # compute this device's updated window slice
        updated = gi_update.update_gi(gi, bits, sdf, atlas, sub_ecfg,
                                      frame, my_off, sky_y=sky_y,
                                      table=table)
        window = jax.lax.dynamic_slice(updated, (my_off,), (per_dev,))
        return window

    rep = P()
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(rep, rep, rep, rep, rep, rep, rep, rep),
                   out_specs=P("rays"))

    def apply(gi, bits, sdf, atlas, frame, offset, sky_y, table):
        windows = fn(gi, bits, sdf, atlas, frame, offset, sky_y, table)
        # windows: (n,) sharded; write the full window back into the grid
        return jax.lax.dynamic_update_slice(gi, windows, (offset,))

    return jax.jit(apply)


def update_gi_sharded(gi, bits, sdf, atlas, ecfg: EngineConfig, frame,
                      offset, mesh: Mesh, sky_y=None, table=None):
    """Distributed progressive GI: each device updates a sub-window of the
    round-robin cell slice, then the shards are all-gathered and written
    back with one dynamic_update_slice (replicated grid).

    Pass the world's ``sky_y``/``trace_table`` (replicated): without them
    every sharded GI frame re-traces table-less - the brick gather table
    (World.trace_table) must be built once per world and passed through
    (PERF.md), on the sharded path exactly as on the single-chip one."""
    return _update_gi_sharded_jit(ecfg, mesh)(gi, bits, sdf, atlas,
                                              jnp.asarray(frame),
                                              jnp.asarray(offset),
                                              sky_y, table)


def replicate(mesh: Mesh, *arrays):
    """Place arrays replicated on every device of the mesh."""
    sh = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sh) for a in arrays)


@functools.lru_cache(maxsize=None)
def _temporal_sharded_jit(h: int, w: int, mesh: Mesh,
                          warp_taps: str = "bilinear_shift"):
    """Cached jitted shard_map for the temporal upscaler at one shape."""
    from rvgrt_tpu.upscale import temporal

    n = mesh.shape["rays"]
    assert h % n == 0, (h, n)
    n_lo = h // n

    def shard_fn(cpad, mpad, jit_ndc, packed):
        idx = jax.lax.axis_index("rays")
        lo0 = (idx * n_lo).astype(jnp.int32)
        ch = jax.lax.dynamic_slice_in_dim(cpad, lo0, n_lo + 3, axis=0)
        mh = jax.lax.dynamic_slice_in_dim(mpad, lo0, n_lo + 2, axis=0)
        return temporal.temporal_upscale_slab(ch, mh, jit_ndc, packed,
                                              lo0, n_lo,
                                              warp_taps=warp_taps)

    # check_vma=False: the slab may run the Pallas warp kernel, whose
    # pallas_call out_shape carries no varying-mesh-axes annotation (new
    # jax rejects that under the default check_vma=True)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P(), P(), P(), P()),
                   out_specs=(P("rays"), P("rays")), check_vma=False)

    def apply(color, motion, jit_ndc, packed):
        # edge-clamp halos once at full-frame level; each shard slices its
        # own halo'd window (the inputs are replicated - 12 MB at the
        # operating point; the display-res work is what shards)
        cpad = jnp.pad(color, ((1, 2), (0, 0), (0, 0)), mode="edge")
        mpad = jnp.pad(motion, ((1, 1), (0, 0), (0, 0)), mode="edge")
        return fn(cpad, mpad, jit_ndc, packed)

    return jax.jit(apply)


def temporal_upscale_sharded(color, motion, jitter_ndc, packed, mesh: Mesh,
                             warp_taps: str = "bilinear_shift"):
    """Temporal 3x super-resolution with DISPLAY rows sharded over the mesh.

    The accumulator's state travels as the packed (H, W) uint32 word
    (``temporal.pack_state`` - bit-identical to the f32 state, which the
    per-frame warp quantizes through anyway): each device warps its
    display-row slab from the replicated packed history and emits its
    packed slab; the next frame's replication is one all-gather over ICI
    (~37 MB at 3840x2400).  Completes the multi-chip frame: render slabs
    (render_frame_sharded) + GI window shards (update_gi_sharded) +
    display-res upscale all scale with the mesh.

    Returns ``(out, packed_next)`` with leading (display-row) axes
    sharded; feed ``packed_next`` back as ``packed`` (the resharding to
    replicated is inserted automatically under jit).
    """
    h, w = color.shape[0], color.shape[1]
    return _temporal_sharded_jit(h, w, mesh, warp_taps)(color, motion,
                                                        jitter_ndc, packed)
