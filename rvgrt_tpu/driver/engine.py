"""Engine: world lifecycle + per-frame stepping (the ``State`` equivalent).

Replaces the reference's ``State::Create`` world build (``State.cpp:24-56``:
allocate -> fill -> SDF -> GI init) and the render-loop orchestration
(``main.cpp:104-234``) with a functional engine: the world is a pytree of
device arrays, the per-frame step is a jitted function

    (gi, camera arrays, frame, offset) -> (frame outputs, gi')

No fences or external semaphores exist on TPU - the dataflow ordering of the
jitted program subsumes the reference's D3D12 fence machinery (SURVEY.md
§5.8).  "Present" is a device->host transfer of the color buffer performed
by the caller (or the C++ frame sink, driver/framesink.py).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from rvgrt_tpu.config import EngineConfig
from rvgrt_tpu.gi import update as gi_update
from rvgrt_tpu.render import pipeline
from rvgrt_tpu.scene.camera import Camera, Character, InputState
from rvgrt_tpu.utils.timer import Timer as Timer0
from rvgrt_tpu.world import atlas as atlas_mod
from rvgrt_tpu.world import gi_grid, sdf as sdf_mod, voxel_grid


@dataclass
class World:
    """Device-resident world state (the CArray/CoarseArray/Texturepack set)."""
    bits: jax.Array   # (num_words,) uint32 occupancy
    sdf: jax.Array    # (sdf_cells,) uint8 coarse SDF
    gi: jax.Array     # (gi_cells,) uint32 packed RGBA8 radiance
    atlas: jax.Array  # (256*256,) uint32 packed RGBA8 texture atlas
    # derived: cone-occlusion mip at GI res (alpha-byte-shifted u32);
    # rebuilt from sdf on load, never persisted
    gi_occ: jax.Array | None = None
    # derived: 1 + highest solid voxel y (f32 scalar) for sky early-exit
    sky_y: jax.Array | None = None
    # derived: combined tracer gather table [4x2x4 bricks | packed SDF]
    trace_table: jax.Array | None = None


def _sdf_phase_fn(b, cfg):
    """The whole SDF phase as one program: coarse occupancy reduce ->
    separable distance transform -> far-field mip extension."""
    coarse = voxel_grid.coarse_occupancy(b, cfg)
    s = sdf_mod.build_sdf(coarse, cfg)
    return sdf_mod.extend_sdf_far(s, coarse, cfg)


def build_world(ecfg: EngineConfig, verbose: bool = True,
                init_gi: bool = True,
                phase_times: dict | None = None,
                parallel_compile: bool | None = None) -> World:
    """Deterministic world build (State.cpp:24-56 lifecycle, with phase
    timers like the reference's RAII Timer prints).  ``phase_times``:
    optional dict filled with {phase: seconds} (the bench records it).

    ``parallel_compile`` (default: on for non-CPU backends): AOT-compile
    every jitted phase program CONCURRENTLY in threads while the fine
    voxel grid generates.  The build is compile-bound, not compute-bound
    (PERF.md round-4 census: warm phase runs total ~6 s at 1024^3 while
    each program costs 1-14 s of per-process remote compile/load that the
    persistent cache cannot absorb) - overlapping the compiles collapses
    the serial compile wall to the longest single program.
    """
    cfg = ecfg.world
    if parallel_compile is None:
        parallel_compile = jax.default_backend() != "cpu"

    import contextlib

    @contextlib.contextmanager
    def Timer(name, verbose=verbose, _T=Timer0):  # noqa: N802
        with _T(name, verbose) as t:
            yield t
        if phase_times is not None:
            phase_times[name] = round(t.elapsed_ms / 1e3, 2)

    from rvgrt_tpu.trace import wavefront

    heightfield = init_gi and ecfg.gi_init_mode == "heightfield"
    fns = {
        "sdf": lambda b: _sdf_phase_fn(b, cfg),
        "table": lambda b, s: wavefront.make_trace_table(b, s, cfg),
        "sky": lambda b: voxel_grid.sky_limit(b, cfg),
    }
    if heightfield:
        fns["gi"] = lambda b: gi_update.init_gi_heightfield(b, ecfg)

    compiled = {}
    if parallel_compile:
        import concurrent.futures as cf

        bits_av = jax.ShapeDtypeStruct((cfg.num_words,), jnp.uint32)
        sdf_av = jax.ShapeDtypeStruct((cfg.sdf_num_cells,), jnp.uint8)
        avals = {"sdf": (bits_av,), "table": (bits_av, sdf_av),
                 "sky": (bits_av,), "gi": (bits_av,)}

        def _aot(name):
            return name, jax.jit(fns[name]).lower(*avals[name]).compile()

        pool = cf.ThreadPoolExecutor(max_workers=len(fns) + 1)
        futs = [pool.submit(_aot, k) for k in fns]
        # the atlas depends on nothing - build it concurrently too (PNG
        # decode + small device ops, ~3 s of serial latency otherwise)
        atlas_fut = pool.submit(atlas_mod.default_atlas)
    else:
        futs = []
        atlas_fut = None

    with Timer("building fine voxel grid", verbose):
        bits = voxel_grid.generate(cfg, ecfg.terrain)
        bits.block_until_ready()

    if parallel_compile:
        with Timer("phase compiles (overlapped remainder)", verbose):
            for f in futs:
                k, c = f.result()
                compiled[k] = c
            pool.shutdown(wait=False)

    def run(name, *args):
        if name in compiled:
            return compiled[name](*args)
        return jax.jit(fns[name])(*args)

    with Timer("building coarse SDF", verbose):
        # one program for the whole phase: eager dispatch pays a per-op
        # host->device round trip through the tunnel (measured 50-66 s
        # for this phase at 1024^3; jitted it is device-bound)
        sdf = run("sdf", bits)
        sdf.block_until_ready()
    with Timer("building texture atlas", verbose):
        atlas = (atlas_fut.result() if atlas_fut is not None
                 else atlas_mod.default_atlas())
        atlas.block_until_ready()
    with Timer("building tracer gather table", verbose):
        table = run("table", bits, sdf)
        table.block_until_ready()
    with Timer("computing sky limit", verbose):
        sky_y = run("sky", bits)
        sky_y.block_until_ready()
    if init_gi:
        with Timer("initializing GI", verbose):
            if heightfield:
                gi = run("gi", bits)
            else:
                gi = gi_update.init_gi_strided(bits, sdf, ecfg,
                                               sky_y=sky_y, table=table,
                                               stride=ecfg.gi_init_stride)
            gi.block_until_ready()
    else:
        gi = gi_grid.zeros(cfg)
    # the occlusion mip only feeds the fused cone table (off by default);
    # don't spend the build (or HBM) unless that path is on
    gi_occ = None
    if ecfg.render.gi_fused_cone:
        gi_occ = jax.jit(gi_grid.build_occlusion,
                         static_argnums=1)(sdf, cfg)
    return World(bits=bits, sdf=sdf, gi=gi, atlas=atlas, gi_occ=gi_occ,
                 sky_y=sky_y, trace_table=table)


def camera_arrays(cam: Camera, vp: np.ndarray | None = None,
                  prev_vp: np.ndarray | None = None,
                  jitter=(0.0, 0.0), time_s: float = 0.0) -> pipeline.CameraArrays:
    eye = np.eye(4, dtype=np.float32)
    return pipeline.CameraArrays(
        pos=jnp.asarray(cam.pos), forward=jnp.asarray(cam.forward),
        right=jnp.asarray(cam.right), up=jnp.asarray(cam.up),
        vp=jnp.asarray(vp if vp is not None else eye),
        prev_vp=jnp.asarray(prev_vp if prev_vp is not None else eye),
        jitter=jnp.asarray(jitter, jnp.float32),
        time=jnp.asarray(time_s, jnp.float32))


@functools.partial(jax.jit, static_argnames=("ecfg", "include_gi",
                                             "update_gi"))
def frame_step(bits, sdf, gi, atlas, cam: pipeline.CameraArrays,
               frame: jax.Array, gi_offset: jax.Array,
               ecfg: EngineConfig, include_gi: bool = True,
               update_gi: bool = True, gi_occ=None, sky_y=None,
               table=None):
    """One frame: GI progressive update + full render (renderLoop order,
    main.cpp:119-124: GI update precedes drawCUDA), fused in one jit."""
    if update_gi:
        gi = gi_update.update_gi(gi, bits, sdf, atlas, ecfg, frame,
                                 gi_offset, sky_y=sky_y, table=table)
    out = pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                include_gi=include_gi, gi_occ=gi_occ,
                                sky_y=sky_y, table=table)
    return out, gi


# --- split-dispatch GI frame: three small jits instead of one big one.
# XLA's TPU scheduler is bimodal on the big fused graph (~2x slow mode,
# PERF.md); the GI-less base frame + a separate GI composite reliably land
# the fast schedule (measured 832 -> ~500 ms at 720p/512^3).  Outputs match
# frame_step to float addition-order.
@functools.partial(jax.jit, static_argnames=("ecfg",))
def gi_update_step(gi, bits, sdf, atlas, frame, gi_offset,
                   ecfg: EngineConfig, sky_y=None, table=None):
    return gi_update.update_gi(gi, bits, sdf, atlas, ecfg, frame,
                               gi_offset, sky_y=sky_y, table=table)


@functools.partial(jax.jit, static_argnames=("ecfg",))
def base_frame_step(bits, sdf, gi, atlas, cam: pipeline.CameraArrays,
                    ecfg: EngineConfig, sky_y=None, table=None):
    return pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                 include_gi=False, sky_y=sky_y, table=table,
                                 return_gbuffer=True)


@functools.partial(jax.jit, static_argnames=("ecfg",))
def gi_composite_step(color, gb, gi, sdf, ecfg: EngineConfig, gi_occ=None):
    return pipeline.gi_composite(color, gb, gi, sdf, ecfg, gi_occ=gi_occ)


class Engine:
    """Stateful convenience wrapper: world + character + frame loop."""

    def __init__(self, ecfg: EngineConfig, include_gi: bool = True,
                 verbose: bool = True):
        self.ecfg = ecfg
        self.include_gi = include_gi
        self.world = build_world(ecfg, verbose=verbose, init_gi=include_gi)
        self.character = Character(
            display_width=ecfg.render.display_width,
            display_height=ecfg.render.display_height,
            render_width=ecfg.render.width,
            render_height=ecfg.render.height)
        self.frame_count = 0
        self.gi_offset = 0
        self.start_time = time.time()

    def step(self, inputs: InputState | None = None,
             delta_time: float = 1.0 / 60.0) -> pipeline.FrameOutputs:
        ch = self.character
        ch.update(inputs or InputState(), delta_time, self.frame_count)
        cam = camera_arrays(
            ch.camera, vp=ch.unjittered_view_projection,
            prev_vp=ch.prev_unjittered_view_projection,
            jitter=ch.ray_jitter_ndc(),
            time_s=(time.time() - self.start_time) % 1e6)
        w = self.world
        if self.include_gi and self.ecfg.render.gi_split_dispatch:
            gi = gi_update_step(
                w.gi, w.bits, w.sdf, w.atlas,
                jnp.asarray(self.frame_count, jnp.uint32),
                jnp.asarray(self.gi_offset, jnp.int32), self.ecfg,
                sky_y=w.sky_y, table=w.trace_table)
            out, gb = base_frame_step(w.bits, w.sdf, gi, w.atlas, cam,
                                      self.ecfg, sky_y=w.sky_y,
                                      table=w.trace_table)
            color = gi_composite_step(out.color, gb, gi, w.sdf, self.ecfg,
                                      gi_occ=w.gi_occ)
            out = out._replace(color=color)
        else:
            out, gi = frame_step(
                w.bits, w.sdf, w.gi, w.atlas,
                cam, jnp.asarray(self.frame_count, jnp.uint32),
                jnp.asarray(self.gi_offset, jnp.int32),
                self.ecfg, include_gi=self.include_gi,
                update_gi=self.include_gi, gi_occ=w.gi_occ,
                sky_y=w.sky_y, table=w.trace_table)
        self.world.gi = gi if self.include_gi else self.world.gi
        self.frame_count += 1
        self.gi_offset = gi_update.advance_offset(self.gi_offset, self.ecfg)
        return out

    def render_at(self, jitter_ndc=(0.0, 0.0),
                  time_s: float = 0.0) -> pipeline.FrameOutputs:
        """Re-render the CURRENT pose with a jitter override, advancing
        nothing (no GI update, no frame count).  Lets callers build
        supersampled (SSAA) reference frames - average several jittered
        renders of one pose - the ground truth an upscaler should be
        judged against (a single point-sampled render is itself aliased).
        A fixed ``time_s`` keeps water animation identical across samples.
        """
        ch = self.character
        cam = camera_arrays(
            ch.camera, vp=ch.unjittered_view_projection,
            prev_vp=ch.prev_unjittered_view_projection,
            jitter=jitter_ndc, time_s=time_s)
        w = self.world
        out, gb = base_frame_step(w.bits, w.sdf, w.gi, w.atlas, cam,
                                  self.ecfg, sky_y=w.sky_y,
                                  table=w.trace_table)
        if self.include_gi:
            color = gi_composite_step(out.color, gb, w.gi, w.sdf, self.ecfg,
                                      gi_occ=w.gi_occ)
            out = out._replace(color=color)
        return out
