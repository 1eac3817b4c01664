"""Cross-slice (DCN) scaling: a 2-D ('slice', 'chip') mesh tier.

The reference is single-GPU (SURVEY.md §2.3); ``parallel/sharding.py``
adds the within-slice pixel axis and ``parallel/volume.py`` the z-slab
volume ring over ICI.  This module composes them across TPU *slices*
(pods connected by data-center network), following the bandwidth
hierarchy (SURVEY.md §5.8: "cross-slice (only for the 2048^3 config)
over DCN"):

* **DCN carries only embarrassingly-parallel traffic**: the frame's pixel
  rows are banded across slices, so the only cross-slice data movement is
  the per-frame assembly of image bands (and the replicated camera
  scalars riding the jit).  No per-superstep or per-round traffic ever
  crosses DCN.
* **ICI carries the latency-sensitive traffic**: within a slice, either
  nothing (world replicated per chip, rows further split across chips -
  ``render_frame_multislice``) or the ray-handoff ring of the z-slab
  volume shards (``render_frame_multislice_volume`` - each slice holds
  ONE full copy of the world, split across its chips' HBM; different
  slices render different row bands against their own copy).

On real hardware build the mesh with
``jax.experimental.mesh_utils.create_hybrid_device_mesh((chips,),
(n_slices,), devices)`` so the 'slice' axis actually maps onto DCN;
``make_mesh2d`` falls back to reshaping ``jax.devices()`` (correct on any
topology, optimal placement only on multislice ones).  Tested on the
8-virtual-CPU mesh as 2 slices x 4 chips (tests/test_multislice.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.gi import update as gi_update
from rvgrt_tpu.parallel import volume as vol_mod
from rvgrt_tpu.render import pipeline
from rvgrt_tpu.render.pipeline import CameraArrays, FrameOutputs

_I32 = jnp.int32


def make_mesh2d(n_slices: int, chips_per_slice: int | None = None,
                devices=None) -> Mesh:
    """('slice', 'chip') mesh.  Prefers the hybrid DCN-aware layout when
    the runtime exposes one; otherwise reshapes the flat device list
    (slice-major, so consecutive devices - which share ICI on real
    slices - land in the same 'slice' row)."""
    devs = list(jax.devices()) if devices is None else list(devices)
    if chips_per_slice is None:
        assert len(devs) % n_slices == 0, (len(devs), n_slices)
        chips_per_slice = len(devs) // n_slices
    n = n_slices * chips_per_slice
    devs = devs[:n]
    try:  # DCN-aware placement (real multislice topologies only)
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (chips_per_slice,), (n_slices,), devices=devs)
        # hybrid mesh is (slice*?, chip) with DCN leading; normalize
        arr = arr.reshape(n_slices, chips_per_slice)
        return Mesh(arr, ("slice", "chip"))
    except Exception:  # noqa: BLE001 - single-slice/CPU fallback
        import numpy as np
        arr = np.array(devs).reshape(n_slices, chips_per_slice)
        return Mesh(arr, ("slice", "chip"))


@functools.lru_cache(maxsize=None)
def _render_multislice_jit(ecfg: EngineConfig, mesh: Mesh,
                           include_gi: bool):
    """Rows banded over 'slice' (DCN), bands split over 'chip' (ICI);
    world replicated per chip.  Identical slab math to
    ``parallel/sharding.py`` - the hierarchy only decides which axis the
    final image assembly rides."""
    ns, nc = mesh.shape["slice"], mesh.shape["chip"]
    h = ecfg.render.height
    assert h % (2 * ns * nc) == 0, (h, ns, nc)
    slab_h = h // (ns * nc)

    def shard_fn(bits, sdf, gi, atlas, cam, sky_y, table):
        si = jax.lax.axis_index("slice").astype(_I32)
        ci = jax.lax.axis_index("chip").astype(_I32)
        y0 = (si * nc + ci) * slab_h
        return pipeline.render_slab(bits, sdf, gi, atlas, cam, ecfg,
                                    y0=y0, slab_h=slab_h,
                                    include_gi=include_gi,
                                    sky_y=sky_y, table=table)

    rep = P()
    rows = P(("slice", "chip"))
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(rep, rep, rep, rep,
                             CameraArrays(*([rep] * 8)), rep, rep),
                   out_specs=FrameOutputs(rows, rows, rows, rows, rows))
    return jax.jit(fn)


def render_frame_multislice(bits, sdf, gi, atlas, cam: CameraArrays,
                            ecfg: EngineConfig, mesh: Mesh,
                            include_gi: bool = True, sky_y=None,
                            table=None) -> FrameOutputs:
    """Pixel-parallel rendering over a ('slice', 'chip') mesh.

    Returns FrameOutputs with rows sharded over both axes; fetching the
    assembled frame is the only step that touches DCN.
    """
    if sky_y is None:
        from rvgrt_tpu.world import voxel_grid
        sky_y = voxel_grid.sky_limit(bits, ecfg.world)
    if table is None:
        from rvgrt_tpu.trace import wavefront
        table = wavefront.make_trace_table(bits, sdf, ecfg.world)
    fn = _render_multislice_jit(ecfg, mesh, include_gi)
    return fn(bits, sdf, gi, atlas, cam, sky_y, table)


@functools.lru_cache(maxsize=None)
def _temporal_multislice_jit(h: int, w: int, mesh: Mesh,
                             warp_taps: str = "bilinear_shift"):
    """Temporal upscale with display rows banded over BOTH mesh axes.

    Same slab kernel as ``sharding.temporal_upscale_sharded``; the packed
    RGBN history is the assembled-image-class artifact, so its per-frame
    replication is the same traffic the image assembly already sends over
    DCN (one ~37 MB all-gather at 3840x2400)."""
    from rvgrt_tpu.upscale import temporal

    ns, nc = mesh.shape["slice"], mesh.shape["chip"]
    n = ns * nc
    assert h % n == 0, (h, n)
    n_lo = h // n

    def shard_fn(cpad, mpad, jit_ndc, packed):
        si = jax.lax.axis_index("slice").astype(_I32)
        ci = jax.lax.axis_index("chip").astype(_I32)
        lo0 = (si * nc + ci) * n_lo
        ch = jax.lax.dynamic_slice_in_dim(cpad, lo0, n_lo + 3, axis=0)
        mh = jax.lax.dynamic_slice_in_dim(mpad, lo0, n_lo + 2, axis=0)
        return temporal.temporal_upscale_slab(ch, mh, jit_ndc, packed,
                                              lo0, n_lo,
                                              warp_taps=warp_taps)

    rows = P(("slice", "chip"))
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P(), P(), P(), P()),
                   out_specs=(rows, rows))

    def apply(color, motion, jit_ndc, packed):
        cpad = jnp.pad(color, ((1, 2), (0, 0), (0, 0)), mode="edge")
        mpad = jnp.pad(motion, ((1, 1), (0, 0), (0, 0)), mode="edge")
        return fn(cpad, mpad, jit_ndc, packed)

    return jax.jit(apply)


def temporal_upscale_multislice(color, motion, jitter_ndc, packed,
                                mesh: Mesh,
                                warp_taps: str = "bilinear_shift"):
    """3x temporal super-resolution over the ('slice', 'chip') mesh; see
    ``sharding.temporal_upscale_sharded`` for the state contract."""
    h, w = color.shape[0], color.shape[1]
    return _temporal_multislice_jit(h, w, mesh, warp_taps)(
        color, motion, jitter_ndc, packed)


@functools.lru_cache(maxsize=None)
def _render_multislice_volume_jit(ecfg: EngineConfig, mesh: Mesh,
                                  include_gi: bool, have_sky: bool,
                                  rounds: int | None,
                                  handoff_cap: int | None):
    """Volume ring over 'chip' (ICI), row bands over 'slice' (DCN).

    Per-slab tables are sharded over 'chip' and REPLICATED over 'slice':
    each slice owns a complete world copy in its chips' aggregate HBM and
    ray handoffs never leave the slice.
    """
    ns, nc = mesh.shape["slice"], mesh.shape["chip"]
    cfg, rcfg = ecfg.world, ecfg.render
    h = rcfg.height
    assert h % (2 * ns) == 0, (h, ns)
    band_h = h // ns

    def shard_fn(tbl, sdf_rep, gi_rep, atlas_rep, cam_rep, sky_y):
        si = jax.lax.axis_index("slice").astype(_I32)
        y0 = si * band_h

        def trace_fn(ox, oy, oz, dx, dy, dz, t0):
            shape = jnp.broadcast_shapes(
                jnp.shape(ox), jnp.shape(oy), jnp.shape(oz),
                jnp.shape(dx), jnp.shape(dy), jnp.shape(dz),
                jnp.shape(t0))
            flat = [jnp.broadcast_to(jnp.asarray(a, jnp.float32),
                                     shape).reshape(-1)
                    for a in (ox, oy, oz, dx, dy, dz, t0)]
            out = vol_mod.trace_ring(tbl, cfg, rcfg, nc, *flat,
                                     sky_y=sky_y, axis="chip",
                                     rounds=rounds,
                                     handoff_cap=handoff_cap)
            res = vol_mod._ring_result(out, flat[0].shape[0])
            return jax.tree.map(lambda a: a.reshape(shape), res)

        return pipeline.render_slab(
            None, sdf_rep, gi_rep, atlas_rep, cam_rep, ecfg,
            y0=y0, slab_h=band_h, include_gi=include_gi,
            sky_y=sky_y, trace_fn=trace_fn)

    rep = P()
    rows = P("slice")  # replicated over 'chip' (ring psum-merges results)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("chip"), rep, rep, rep,
                  CameraArrays(*([rep] * 8)), rep),
        out_specs=FrameOutputs(rows, rows, rows, rows, rows))
    del have_sky  # cache key only (None vs traced scalar retraces)
    return jax.jit(fn)


def render_frame_multislice_volume(tables, sdf_replicated, gi, atlas,
                                   cam: CameraArrays, ecfg: EngineConfig,
                                   mesh: Mesh, include_gi: bool = True,
                                   sky_y=None, rounds: int | None = None,
                                   handoff_cap: int | None = None
                                   ) -> FrameOutputs:
    """The 2048^3-streaming shape across slices: each slice's chips hold
    the world as z-slabs (ray ring over ICI); slices render disjoint row
    bands (assembly over DCN).  ``tables`` as built by
    ``volume.build_shard_tables`` against the ('slice','chip') mesh with
    axis='chip'."""
    fn = _render_multislice_volume_jit(ecfg, mesh, include_gi,
                                       sky_y is not None, rounds,
                                       handoff_cap)
    return fn(tables, sdf_replicated, gi, atlas, cam, sky_y)


@functools.lru_cache(maxsize=None)
def _update_gi_multislice_jit(ecfg: EngineConfig, mesh: Mesh):
    ns, nc = mesh.shape["slice"], mesh.shape["chip"]
    n_dev = ns * nc
    n = ecfg.gi_window
    assert n % n_dev == 0, (n, n_dev)
    per_dev = n // n_dev

    import dataclasses
    sub_ecfg = dataclasses.replace(ecfg, gi_rays_per_frame=per_dev)

    def shard_fn(gi, bits, sdf, atlas, frame, offset):
        si = jax.lax.axis_index("slice").astype(_I32)
        ci = jax.lax.axis_index("chip").astype(_I32)
        my_off = offset + (si * nc + ci) * per_dev
        updated = gi_update.update_gi(gi, bits, sdf, atlas, sub_ecfg,
                                      frame, my_off)
        return jax.lax.dynamic_slice(updated, (my_off,), (per_dev,))

    rep = P()
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(rep, rep, rep, rep, rep, rep),
                   out_specs=P(("slice", "chip")))

    def apply(gi, bits, sdf, atlas, frame, offset):
        windows = fn(gi, bits, sdf, atlas, frame, offset)
        return jax.lax.dynamic_update_slice(gi, windows, (offset,))

    return jax.jit(apply)


def update_gi_multislice(gi, bits, sdf, atlas, ecfg: EngineConfig, frame,
                         offset, mesh: Mesh):
    """Progressive GI window split over every device of the 2-D mesh; the
    gathered window is written back with one dynamic_update_slice.  The
    all-gather of window shards crosses DCN once per frame - window bytes
    (~1 MB at the reference rate), not world bytes."""
    return _update_gi_multislice_jit(ecfg, mesh)(
        gi, bits, sdf, atlas, jnp.asarray(frame), jnp.asarray(offset))
