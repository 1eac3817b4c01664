"""Headline benchmark: FPS + Mrays/s on the reference's own operating point.

Headline config (round 2+): 1024^3 world, render 1280x800 with full shading
(SDF-marched soft shadows + cone-traced GI + water) and temporal 3x upscale
to 3840x2400
- the reference's pipeline shape (1280x800 -> DLSS -> 4K, ``State.hpp:28-32``,
``main.cpp:191``) with GI on (``INCLUDEGI``, ``StateRender.cu:12``).
Prints ONE JSON line on stdout:
  {"metric": ..., "value": Mrays/s, "unit": "Mrays/s", "vs_baseline": FPS/30}

vs_baseline = FPS / 30 (the north-star interactive gate; the reference
publishes no numbers - BASELINE.md).  Extras carry config-4 (1080p native,
GI on) and per-stage ray counts.  All diagnostics go to stderr.

Measurement notes (PERF.md): the tunneled device's first device->host
readback costs 1-6 MINUTES of one-time channel setup (absorbed up front,
before any timing), and every later readback costs ~0.5 s flat - so frames
are dispatched back-to-back (they chain through the GI grid / upscaler
history / a depth accumulator) and synced ONCE at the end.  Per-frame
device times come from dividing the span; block_until_ready through the
tunnel returns early and cannot time anything.

Knobs via env: BENCH_CUBE (10), BENCH_W/BENCH_H (1280x800), BENCH_FRAMES
(16), BENCH_GI (1), BENCH_UPSCALE (1), BENCH_CONFIG4 (1 = also measure
1920x1080 native GI-on in extras), BENCH_SOFT (1 = SDF-marched soft
shadows at stride 2 - the BASELINE config-4 shadow model and 2.2x cheaper
than the hard-shadow trace, PERF.md; 0 = the reference's hard shadows).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.driver import engine as eng_mod
    from rvgrt_tpu.gi import update as gi_update
    from rvgrt_tpu.render import pipeline

    cube = int(os.environ.get("BENCH_CUBE", "10"))
    # BENCH_REF_WORLD=1: the reference's own 4096x512x4096 world
    # (cumath.cuh:19-31) instead of the cube - the literal behavioral
    # target.  Build is minutes-scale (8.6G voxels); opt-in.
    ref_world = os.environ.get("BENCH_REF_WORLD", "0") == "1"
    width = int(os.environ.get("BENCH_W", "1280"))
    height = int(os.environ.get("BENCH_H", "800"))
    # 32 frames: the pipeline fill/drain tax is ~1 frame, so longer
    # windows read the steady state (~3% vs ~6% amortization at 16)
    n_frames = int(os.environ.get("BENCH_FRAMES", "32"))
    include_gi = os.environ.get("BENCH_GI", "1") == "1"
    # BENCH_UPSCALE: "temporal" (default) = analytic temporal
    # super-resolution accumulator; "net" / "1" = learned checkpoint;
    # "0" = native resolution, no upscale
    up_mode = os.environ.get("BENCH_UPSCALE", "temporal")
    if up_mode == "1":
        up_mode = "net"
    upscale = up_mode != "0"
    config4 = os.environ.get("BENCH_CONFIG4", "1") == "1"
    soft = os.environ.get("BENCH_SOFT", "1") == "1"
    fast_trace = os.environ.get("BENCH_FAST_TRACE", "1") == "1"
    # rate-cut primaries under the temporal accumulator: "adaptive"
    # (default) = the motion-adaptive scheduler (render/scheduler.py, the
    # DLSS mode-selection analogue main.cpp:529-543) picks checkerboard
    # under fast camera motion and 4-phase quarter rate when slow/static,
    # per frame, from host-side pose deltas; "1"/"2" = checkerboard
    # always (half the pixels per frame, pipeline.checker_*), "4" =
    # quarter always (pipeline.quarter_*, the DLSS-Ultra-Performance-
    # class rate), "0" = every pixel.  Quality ladder measured in
    # probe_checker_motion (--mode all --script mixed).  Rate cuts
    # require the upscaler in the loop.
    rate_mode = os.environ.get("BENCH_CHECKER", "adaptive")
    adaptive = rate_mode == "adaptive" and up_mode == "temporal"
    checker = rate_mode in ("1", "2") and up_mode == "temporal"
    quarter = rate_mode == "4" and up_mode == "temporal"
    # camera path: "interactive" (default with the adaptive scheduler) =
    # a documented interactive motion profile in thirds - fast pan /
    # slow look / near-static dwell; "pan" = the round-2..4 constant
    # fast pan (0.35 rad/frame).  With a fixed-rate tier the constant
    # pan remains the default for cross-round comparability.
    cam_path = os.environ.get("BENCH_PATH",
                              "interactive" if adaptive else "pan")
    # config-4 (native 1080p) rate tier: "adaptive" (default) = the same
    # motion-adaptive checker/quarter dispatch with the accumulator run
    # at SCALE 1 as native-res temporal reconstruction (TAA + hole fill,
    # upscale/temporal.py init_state(scale=1) - the tuning VERDICT r4 #3
    # asked for); "0" = the round-2..4 pure full-rate native semantics.
    config4_rate = os.environ.get("BENCH_CONFIG4_RATE", "adaptive")
    if up_mode != "temporal":
        config4_rate = "0"
    # slim carry measured cost-NEUTRAL on-chip (probe_r7: 302 -> 301 ms
    # primary) - the superstep is not carry-HBM-bound; default off to
    # keep the incremental reference arithmetic
    slim = os.environ.get("BENCH_SLIM", "0") == "1"
    # fused Pallas superstep (ops/superstep_kernel.py): post-gather state
    # machine as one Mosaic kernel per superstep, tile state in VMEM.
    # probe_r29 within-run: primary 336.5 -> 316.8 ms, checker 203.2 ->
    # 190.4 (1.06x), prepass neutral; BIT-EXACT vs the XLA body (gated
    # per-field in tests).  BENCH_FUSED=0 restores the XLA superstep.
    fused = os.environ.get("BENCH_FUSED", "1") == "1" and not slim
    # GI window cadence: 2 = update the progressive window every other
    # frame (GI update measured 68 ms/window at the r4 probe - the sweep
    # period doubles, the steady state is unchanged)
    gi_cadence = max(int(os.environ.get("BENCH_GI_CADENCE", "2")), 1)
    # GI-composite cadence: 2 = cone-march the indirect-light image every
    # other frame and re-add it in between (probe_checker_motion: +0.50 dB
    # cost vs truth on the moving eval; composite measured 43 ms at the
    # r4 probe).  1 = composite every frame (default: quality first).
    comp_cadence = max(int(os.environ.get("BENCH_COMP_CADENCE", "1")), 1)
    # history-warp implementation: "pallas" = the windowed-DMA TRUE-4-tap
    # bilinear kernel (ops/warp_kernels.py; 406 -> 34 ms at 3840x2400 vs
    # the XLA 4-tap gather, bit-exact, probe_r11); "bilinear_shift" etc.
    # select the XLA paths (temporal._warp_state)
    warp_taps = os.environ.get("BENCH_WARP", "pallas")

    dev = jax.devices()[0]

    # one-time tunnel channel setup: the first D2H readback of a process
    # costs minutes regardless of size; pay it before anything is timed
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 1.0)
    log(f"device: {dev}; first-readback channel setup: "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    float(jnp.zeros((), jnp.float32) + 2.0)
    readback_s = time.time() - t0
    log(f"steady-state scalar readback: {readback_s:.2f}s")

    from rvgrt_tpu.config import LightingConfig

    rcfg = dataclasses.replace(RenderConfig(), width=width, height=height)
    # quarter-res distance/shadow prepass (RenderConfig.prepass_divisor):
    # primary supersteps are start-saturated (probe_r9/r10), so the
    # half-res prepass trace pays ~3x its value; image-gated in
    # tests/test_render.py.  BENCH_PREPASS_DIV=2 restores reference shape.
    # round-4 default: eighth-res prepass + soft-shadow sites DECOUPLED
    # from the prepass grid (every 4th full-res primary hit,
    # RenderConfig.shadow_site_divisor) - the prepass then only provides
    # conservative starts.  probe_r12 within-run: base frame 283.7 ->
    # 260.6 ms, 0 hit mismatches, 42.5 dB vs the round-3 d4+coupled
    # default (itself image-gated against the reference d2 shape).
    # BENCH_PREPASS_DIV=2 + BENCH_SHADOW_SITES=0 restores reference shape.
    rcfg = dataclasses.replace(
        rcfg,
        prepass_divisor=int(os.environ.get("BENCH_PREPASS_DIV",
                                           "8" if soft else "4")),
        shadow_site_divisor=int(os.environ.get("BENCH_SHADOW_SITES",
                                               "4" if soft else "0")))
    # steps_per_check=1 at the checker batch: 283.5 vs 288.8 ms at spc=2
    # (probe_r12, bit-exact cadence knob); BENCH_SPC=2 restores
    rcfg = dataclasses.replace(
        rcfg, steps_per_check=int(os.environ.get("BENCH_SPC", "1")))
    if fast_trace:
        # TPU-tuned tracer cadence (scripts/probe_r6.py, within-run at
        # 1280x800/1024^3): 6 DDA substeps per brick gather (bit-exact),
        # SDF re-probe every 16 DDA steps and a 4-voxel conservative start
        # bias (vs the reference's 8/8) - primary trace 443 -> 330 ms,
        # image delta 1/1M hit flags + 274/1M normals.  BENCH_FAST_TRACE=0
        # restores the reference cadence.
        rcfg = dataclasses.replace(rcfg, dda_substeps=6,
                                   sdf_probe_interval=16, dist_bias=4.0)
    if slim:
        # slim superstep carry (RenderConfig.slim_carry): tMax recomputed
        # instead of carried; hit/normal parity gated in tests
        rcfg = dataclasses.replace(rcfg, slim_carry=True)
    if fused:
        rcfg = dataclasses.replace(rcfg, fused_superstep=True)
    # cone-march site stride: 16 cuts GI-composite gathers 16x vs the
    # default 4.  Quality ladder vs the exact per-pixel march (cube 7,
    # 192x120 - far FEWER world-space sites than this frame's 80x50 at
    # div16): div4 38.9 / div8 37.9 / div16 37.9 / div24 33.4 dB - the
    # geometry-aware joint upsample holds to div16 and degrades at 24
    # (tests/test_render.py gates div16).  BENCH_GI_DIV=4 restores.
    rcfg = dataclasses.replace(
        rcfg, gi_res_divisor=int(os.environ.get("BENCH_GI_DIV", "16")))
    wcfg = WorldConfig() if ref_world else WorldConfig().with_cube(cube)
    ecfg = EngineConfig(
        world=wcfg,
        render=rcfg,
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=soft,
                                     soft_shadow_stride=2),
        # two-phase respite on the GI bounce rays (689 -> 334 ms per
        # window at 2048^3, PERF.md); opt-in - the EngineConfig default
        # keeps reference cadence
        gi_straggler_budget=12,
        # strided GI init (VERDICT r2 #8): trace 1/4 of the init rays,
        # replicate; the progressive sweep refreshes every cell anyway
        gi_init_stride=(2, 2) if os.environ.get("BENCH_GI_INIT_STRIDE",
                                                "1") == "1" else (1, 1),
    )
    world_tag = (f"{wcfg.size_x}x{wcfg.size_y}x{wcfg.size_z}"
                 if ref_world else f"{2**cube}^3")
    log(f"world {world_tag}, {width}x{height}, gi={include_gi}, "
        f"upscale={upscale}, soft_shadows={soft}, fast_trace={fast_trace}")

    # GI init algorithm: the ray-free heightfield prior (horizon mapping,
    # gi/update.init_gi_heightfield) replaces the 40 s traced init at
    # 1024^3 through a slow tunnel; the progressive sweep re-traces every
    # cell within one sweep period (gated vs traced in tests/test_world).
    # BENCH_GI_INIT=traced restores the reference init path.
    if os.environ.get("BENCH_GI_INIT", "heightfield") == "heightfield":
        ecfg = dataclasses.replace(ecfg, gi_init_mode="heightfield")
    t0 = time.time()
    phase_times: dict = {}
    world = eng_mod.build_world(ecfg, verbose=True, init_gi=include_gi,
                                phase_times=phase_times)
    build_s = time.time() - t0
    log(f"world build total: {build_s:.1f}s  phases={phase_times}")

    # ---- camera placement: terrain top at world center, ON DEVICE (a
    # full-grid readback costs ~8 s/128 MB through the tunnel) ----
    from rvgrt_tpu.scene.camera import Camera

    size = ecfg.world.size_x
    cx, cz = size // 2, size // 2

    @jax.jit
    def terrain_top(bits):
        vol = bits.reshape(ecfg.world.size_z, ecfg.world.size_y,
                           ecfg.world.size_x // 32)
        word = vol[cz, :, cx // 32]  # (sy,) words holding column cx
        solid = (word >> jnp.uint32(cx % 32)) & jnp.uint32(1)
        any_s = solid.any()
        top = jnp.where(
            any_s,
            ecfg.world.size_y - 1
            - jnp.argmax(solid[::-1]).astype(jnp.int32), 30)
        return top.astype(jnp.float32)

    top = float(terrain_top(world.bits))
    cam_y = min(top + 12.0, ecfg.world.size_y - 2.0)
    log(f"terrain top at center: {top}, camera y: {cam_y}")

    def cam_at(ang):
        fwd = np.array([math.cos(ang) * 0.87, -0.5, math.sin(ang) * 0.87],
                       np.float32)
        fwd /= np.linalg.norm(fwd)
        wup = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, wup)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        return Camera(pos=np.array([cx, cam_y, cz], np.float32),
                      forward=fwd, right=right.astype(np.float32),
                      up=(up / np.linalg.norm(up)).astype(np.float32))

    def path_cams(frames):
        """Camera poses for ``frames`` timed frames + 2 warmup frames.

        ``pan``: the round-2..4 constant fast pan, ang = 0.35*i (kept
        bit-identical for cross-round comparability).

        ``interactive``: a documented interactive-session profile in
        equal thirds of the TIMED window - fast pan (0.05 rad/frame,
        ~3.4% of screen width: a flick/turn), slow look-around
        (0.004 rad/frame, ~0.27%), near-static dwell (0.0005 rad/frame).
        The 2 warmup frames pan fast so the adaptive scheduler enters
        the timed window in the same tier the first leg uses."""
        cams = []
        yaw = 0.0
        third = max(frames // 3, 1)
        for i in range(frames + 2):
            if cam_path == "pan":
                yaw = 0.35 * i
            elif i > 0:
                j = i - 2  # timed-window index (warmups are j<0)
                if j < third:
                    yaw += 0.05
                elif j < 2 * third:
                    yaw += 0.004
                else:
                    yaw += 0.0005
            cams.append(cam_at(yaw))
        return cams

    up_net = up_params = None
    res_net = res_params = None
    if upscale and up_mode == "residual":
        # learned residual head riding the temporal accumulator
        # (upscale/residual.py, trained by scripts/train_residual.py):
        # the accumulator recurrence is unchanged, the head is a pure
        # post-pass on its output + confidence
        from rvgrt_tpu.driver import checkpoint as ck_mod
        from rvgrt_tpu.upscale import residual as res_mod

        up_mode = "temporal"
        ckpt = os.path.join(os.path.dirname(__file__),
                            "checkpoints", "residual_head.pkl")
        if os.path.exists(ckpt):
            blob = ck_mod.load_params(ckpt)
            res_net = res_mod.ResidualHead(features=blob["features"],
                                           depth_layers=blob["layers"])
            res_params = blob["params"]
            log(f"loaded residual head from {ckpt}")
        else:
            log(f"no {ckpt}; falling back to the plain accumulator")
    if upscale and up_mode == "net":
        from rvgrt_tpu.upscale import model as up_model

        ckpt = os.path.join(os.path.dirname(__file__),
                            "checkpoints", "upscaler.pkl")
        if os.path.exists(ckpt):
            up_net, up_params = up_model.load_checkpoint(ckpt)
            log(f"loaded trained upscaler from {ckpt}")
        else:
            up_net, up_params = up_model.init_params(
                jax.random.PRNGKey(0), height, width)
    elif upscale:
        from rvgrt_tpu.upscale import temporal as up_temporal

        log("upscaler: temporal super-resolution accumulator")

    def build_ops(ec):
        """Per-rate (base, post) jit dicts + gi jit for one operating point.

        Every rate tier is its own compiled graph (the buffer shapes
        differ); the adaptive scheduler dispatches between them per
        frame.  Rates this point never uses are never compiled (the
        dicts are lazy via functools.partial + jax.jit's call-site
        compilation)."""
        is_headline = ec.render.width == width
        rate_tag = ((("adaptive" if adaptive else rate_mode)
                     if (adaptive or checker or quarter) else "0")
                    if is_headline else config4_rate)
        if rate_tag == "adaptive":
            point_rates = ("full", "checker", "quarter")
        elif rate_tag in ("1", "2"):
            point_rates = ("checker",)
        elif rate_tag == "4":
            point_rates = ("quarter",)
        else:
            point_rates = ("full",)
        # temporal reconstruction scale: 3x display upscale at the
        # headline point, 1x (native TAA + rate-cut hole fill) elsewhere
        up_scale = 3 if is_headline else 1
        use_temporal = (upscale and up_mode == "temporal"
                        and (is_headline or point_rates != ("full",)))

        def _base(b, s, g, a, cam, sky, tbl, par, rate):
            return pipeline.render_frame(
                b, s, g, a, cam, ec, include_gi=False, sky_y=sky,
                table=tbl, return_gbuffer=include_gi,
                checker_parity=par if rate == "checker" else None,
                quarter_phase=par if rate == "quarter" else None)

        def _post(out, gb, g, s, cam, hist, par, addend, rate, reuse):
            """-> (frame outputs, next upscaler state, composite addend).

            ``reuse=True``: skip the cone-march composite and re-add the
            PREVIOUS frame's indirect-light image (GI is low-frequency
            and geometry-attached; measured +0.50 dB cost vs truth on
            the moving eval, probe_checker_motion) - the composite-
            cadence perf knob (BENCH_COMP_CADENCE).

            The addend is kept at FULL resolution when the knob is active:
            under checker/quarter interleave the same half-buffer index
            maps to a different world pixel each frame (opposite parity /
            next phase) - and under the adaptive scheduler the buffer
            SHAPE changes with the tier - so the full-res addend is the
            only carry whose shape and meaning are frame-invariant.
            Expand on compute, re-select at the CURRENT rate/phase on
            reuse.  With comp_cadence == 1 the reuse path is dead and a
            (1,1,3) placeholder is carried instead (a real per-rate
            addend would recompile every post graph per predecessor
            shape)."""
            if include_gi:
                if reuse:
                    add = addend
                    if rate == "checker":
                        add = pipeline.checker_select(add, par)
                    elif rate == "quarter":
                        add = pipeline.quarter_select(add, par)
                    out = out._replace(color=jnp.clip(
                        out.color + add, 0.0, 1.0))
                elif comp_cadence > 1:
                    col, addend = pipeline.gi_composite(
                        out.color, gb, g, s, ec, return_addend=True)
                    out = out._replace(color=col)
                    # full-res addend (see docstring)
                    if rate == "checker":
                        addend = pipeline.checker_expand(addend, par)
                    elif rate == "quarter":
                        addend = pipeline.quarter_expand(addend, par)
                else:
                    col = pipeline.gi_composite(out.color, gb, g, s, ec)
                    out = out._replace(color=col)
            valid = None
            if rate == "checker":
                # expand the half-width checkerboard buffers to the full
                # frame; untraced pixels are neighbor-filled and enter the
                # accumulator at 5% weight (history dominates)
                ex = lambda a: pipeline.checker_expand(a, par)  # noqa: E731
                out = out._replace(color=ex(out.color),
                                   motion=ex(out.motion),
                                   depth=ex(out.depth))
                valid = pipeline.checker_valid_mask(ec.render.height,
                                                    ec.render.width, par)
            elif rate == "quarter":
                ex = lambda a: pipeline.quarter_expand(a, par)  # noqa: E731
                out = out._replace(color=ex(out.color),
                                   motion=ex(out.motion),
                                   depth=ex(out.depth))
                valid = pipeline.quarter_valid_mask(ec.render.height,
                                                    ec.render.width, par)
            if upscale and up_mode == "net" and ec.render.width == width:
                hi, _ = up_model.upscale(up_net, up_params, out.color,
                                         out.motion, out.depth,
                                         cam.jitter, hist)
                return out._replace(color=hi), hi, addend
            if use_temporal:
                hi, nstate = up_temporal.temporal_upscale(
                    out.color, out.motion, out.depth, cam.jitter, hist,
                    valid=valid, warp_taps=warp_taps)
                if res_params is not None and ec.render.width == width:
                    hi = res_net.apply(res_params, out.color, out.motion,
                                       out.depth, cam.jitter, hi,
                                       nstate.conf)
                return out._replace(color=hi), nstate, addend
            return out, hist, addend

        def _gi(g, b, s, a, fr, off, sky, tbl):
            return gi_update.update_gi(g, b, s, a, ec, fr, off,
                                       sky_y=sky, table=tbl)

        import functools as _ft

        base_j = {r: jax.jit(_ft.partial(_base, rate=r))
                  for r in point_rates}
        post_j = {r: (jax.jit(_ft.partial(_post, rate=r, reuse=False)),
                      jax.jit(_ft.partial(_post, rate=r, reuse=True)))
                  for r in point_rates}
        return base_j, post_j, jax.jit(_gi), point_rates, (use_temporal,
                                                           up_scale)

    def run_point(ec, label, frames):
        """Measure one operating point; returns (fps, stats dict)."""
        base_j, post_j, gi_j, point_rates, (use_temporal, up_scale) = (
            build_ops(ec))
        from rvgrt_tpu.upscale import model as up_model_l
        if upscale and up_mode == "net" and ec.render.width == width:
            hist0 = jnp.zeros((ec.render.height * up_model_l.SCALE,
                               ec.render.width * up_model_l.SCALE, 3),
                              jnp.float32)
        elif use_temporal:
            hist0 = up_temporal.init_state(ec.render.height,
                                           ec.render.width, scale=up_scale)
        else:
            hist0 = jnp.zeros((1, 1, 3), jnp.float32)

        # real jitter (Character.update semantics): cost-identical to zero
        # jitter (a traced scalar), but the upscalers see true sub-pixel
        # offsets.  With the temporal accumulator in the loop, use the
        # 9-phase full-display-phase-coverage sequence (the reference's
        # 8-phase table never lands on 2 of the 9 display phases of a 3x
        # upscale - measured +0.4 dB static, scripts/eval_upscale.py)
        from rvgrt_tpu.scene.camera import (JITTER_SEQUENCE,
                                            phase_jitter_sequence)

        seq = (phase_jitter_sequence(3)
               if upscale and up_mode == "temporal" else JITTER_SEQUENCE)

        def jit_ndc(i):
            jx, jy = seq[i % len(seq)] * 0.5
            return (float(jx) * 2.0 / ec.render.width,
                    float(jy) * 2.0 / ec.render.height)

        raw_cams = path_cams(frames)
        cams = [eng_mod.camera_arrays(raw_cams[i], jitter=jit_ndc(i))
                for i in range(frames + 2)]

        # per-frame rate schedule.  With the adaptive tier the scheduler
        # runs host-side over consecutive poses (the whole path is known,
        # but the scheduler only ever looks one frame back - the same
        # information an interactive session has); fixed tiers repeat.
        if len(point_rates) > 1:
            from rvgrt_tpu.render.scheduler import AdaptiveRateScheduler

            sched = AdaptiveRateScheduler(ec.render.width,
                                          ec.render.height,
                                          ec.render.fov_degrees)
            rate_seq = ["checker"]
            for i in range(1, frames + 2):
                rate_seq.append(sched.step(raw_cams[i - 1], raw_cams[i]))
        else:
            rate_seq = [point_rates[0]] * (frames + 2)

        # pre-stage every per-frame host scalar on device: a fresh
        # jnp.uint32/int32 per frame is a host->device transfer through
        # the tunnel INSIDE the timed loop (dispatch is async, transfers
        # are not)
        off_seq = []
        o = 0
        for _ in range(frames + 2):
            off_seq.append(o)
            o = gi_update.advance_offset(o, ec)
        off_dev = {v: jax.device_put(jnp.int32(v)) for v in set(off_seq)}
        fr0 = jax.device_put(jnp.uint32(0))
        par_dev = [jax.device_put(jnp.int32(i)) for i in range(4)]

        if comp_cadence > 1:
            # reuse is live: the addend is carried at FULL resolution
            # (see _post) so rate/parity/phase changes re-select correctly
            addend0 = jnp.zeros((ec.render.height, ec.render.width, 3),
                                jnp.float32)
        else:
            # reuse path dead: carry a fixed placeholder (shape-invariant
            # across rate tiers - see the _post docstring)
            addend0 = jnp.zeros((1, 1, 3), jnp.float32)

        def frame(i, cam, gi, offset, hist, acc, addend, rate=None):
            rate = rate_seq[i] if rate is None else rate
            # quarter phases visit the 2x2 quad diagonally so consecutive
            # frames form a checkerboard (pipeline.QUARTER_PHASE_ORDER)
            par = par_dev[pipeline.QUARTER_PHASE_ORDER[i & 3]
                          if rate == "quarter" else (i & 1)]
            # GI cadence: run the progressive window every Nth frame (the
            # reference's contract is the ~512-frame full-grid sweep
            # PERIOD, not the per-frame call; cadence 2 doubles the sweep
            # period - a tagged deviation, BENCH_GI_CADENCE=1 restores)
            if include_gi and i % gi_cadence == 0:
                gi = gi_j(gi, world.bits, world.sdf, world.atlas,
                          fr0, off_dev[offset],
                          world.sky_y, world.trace_table)
            r = base_j[rate](world.bits, world.sdf, gi, world.atlas, cam,
                             world.sky_y, world.trace_table, par)
            out, gb = r if include_gi else (r, None)
            reuse = include_gi and i % comp_cadence != 0
            out, nhist, addend = post_j[rate][1 if reuse else 0](
                out, gb, gi, world.sdf, cam, hist, par, addend)
            # tiny reduction chains every frame into one final readback
            acc = acc + jnp.sum(out.depth)
            return out, gi, nhist, acc, addend

        # warmup / compile (also absorbs any remaining lazy setup)
        acc = jnp.zeros((), jnp.float32)
        gi = world.gi
        offset = 0
        addend = addend0
        t0 = time.time()
        out, gi, hist, acc, addend = frame(0, cams[0], gi, offset, hist0,
                                           acc, addend)
        float(acc)
        log(f"[{label}] compile+first frame: {time.time() - t0:.1f}s")
        # the offset advances only right before a frame that will run its
        # GI window (frame i runs GI iff i % gi_cadence == 0) so the
        # round-robin sweep stays gap-free at any cadence
        if 1 % gi_cadence == 0:
            offset = gi_update.advance_offset(offset, ec)
        t0 = time.time()
        out, gi, hist, acc, addend = frame(1, cams[1], gi, offset, hist,
                                           acc, addend)
        wdepth = out.depth
        hit_frac = float(jnp.mean((wdepth != 1.0).astype(jnp.float32)))
        log(f"[{label}] warm frame {time.time() - t0:.1f}s; "
            f"hit_frac={hit_frac:.3f}")

        # pre-compile every (rate, post-variant) graph the timed schedule
        # will use that the two warmup frames didn't cover, so no compile
        # lands inside the timed window (an adaptive tier switch mid-run
        # would otherwise pay a full remote compile in measured time)
        covered = {(rate_seq[i], include_gi and i % comp_cadence != 0)
                   for i in range(2)}
        for i in range(2, frames + 2):
            key = (rate_seq[i], include_gi and i % comp_cadence != 0)
            if key in covered:
                continue
            covered.add(key)
            t0 = time.time()
            # index picks the post variant: i % comp_cadence != 0 <=> reuse
            i_warm = 1 if key[1] else comp_cadence
            out, gi, hist, acc, addend = frame(i_warm, cams[1], gi, offset,
                                               hist, acc, addend,
                                               rate=key[0])
            float(acc)
            log(f"[{label}] extra warm {key}: {time.time() - t0:.1f}s")

        # timed: dispatch all frames back-to-back, sync once at the end
        t0 = time.time()
        for i in range(frames):
            if (2 + i) % gi_cadence == 0:
                offset = gi_update.advance_offset(offset, ec)
            out, gi, hist, acc, addend = frame(2 + i, cams[2 + i], gi,
                                               offset, hist, acc, addend)
        float(acc)  # one readback closes the pipeline
        dt = time.time() - t0
        fps = frames / dt

        # straggler-cap overflow telemetry (VERDICT r2 #9): count rays
        # that blew the two-phase cap and silently degraded to miss in a
        # representative GI window (the only stage running the respite by
        # default).  Expected 0 - the cap carries a 1.57x measured margin
        overflow = -1
        if include_gi and ec.gi_straggler_budget > 0:
            _, st = jax.jit(
                lambda g, b, s, a, fr, off, sky, tbl: gi_update.update_gi(
                    g, b, s, a, ec, fr, off, sky_y=sky, table=tbl,
                    return_stats=True))(
                gi, world.bits, world.sdf, world.atlas, fr0,
                off_dev[off_seq[0]], world.sky_y, world.trace_table)
            overflow = int(st["straggler_overflow"])
            log(f"[{label}] straggler-cap overflow (1 GI window): "
                f"{overflow}")

        # ---- ray accounting (per frame, from static lane counts) ----
        w_, h_ = ec.render.width, ec.render.height
        # actual prepass grid (RenderConfig.half_width = width //
        # prepass_divisor): at the quarter-res prepass tier the old
        # hardcoded w_//2 overcounted prepass rays 4x
        hw, hh = ec.render.half_width, ec.render.half_height
        q = ec.render.prepass_cascade
        ssd = ec.render.shadow_site_divisor
        shadow_decoupled = ec.lighting.soft_shadows and ssd > 0

        def rays_for(rate, gi_frame):
            # post-rate primary grid: the buffers the frame actually
            # traces (checker = half width, quarter = half width AND
            # height)
            gh = (h_ // 2) if rate == "quarter" else h_
            gw = (w_ // 2) if rate in ("checker", "quarter") else w_
            r = {
                "primary": gh * gw,
                "prepass_primary": hw * hh,
                # shadow-ray population depends on the tier: DECOUPLED
                # soft shadows (shadow_site_divisor > 0, the bench
                # default) march one SDF ray per ssd-th site of the
                # POST-rate primary grid and the prepass runs
                # want_shadow=False (zero prepass shadow rays -
                # render_slab's shadow_decoupled branch); coupled soft
                # shadows march one per STRIDED prepass site; hard
                # shadows trace one hybrid ray per prepass pixel
                "prepass_shadow": (0 if shadow_decoupled else
                                   ((hw // ec.lighting.soft_shadow_stride)
                                    * (hh // ec.lighting.soft_shadow_stride)
                                    if ec.lighting.soft_shadows
                                    else hw * hh)),
                "cascade": (hw // q) * (hh // q) if q > 1 else 0,
            }
            if shadow_decoupled:
                # a[::ssd] keeps ceil(n/ssd) sites per axis
                r["shadow_sites"] = -(-gh // ssd) * -(-gw // ssd)
            if gi_frame:
                # reference rate: 2 rays (sun + bounce) per updated GI
                # cell (GlobalIlluminate, CoarseArray.cu:273-355)
                r["gi_update"] = 2 * ec.gi_window
            return r

        # sum per-frame counts over the timed window (the adaptive tier
        # changes the primary/shadow-site population frame by frame)
        rays_total: dict = {}
        tier_mix: dict = {}
        for i in range(2, frames + 2):
            fr = rays_for(rate_seq[i],
                          include_gi and i % gi_cadence == 0)
            for k, v in fr.items():
                rays_total[k] = rays_total.get(k, 0) + v
            tier_mix[rate_seq[i]] = tier_mix.get(rate_seq[i], 0) + 1
        rays = {k: round(v / frames, 1) for k, v in rays_total.items()}
        total_rays = sum(rays_total.values()) / frames
        mrays = total_rays * fps / 1e6
        log(f"[{label}] {frames} frames in {dt:.2f}s -> {fps:.2f} FPS, "
            f"{mrays:.1f} Mrays/s  tier_mix={tier_mix}  "
            f"mean rays/frame={rays}")
        # primary-only Mrays/s alongside the all-rays number: the
        # numerator above counts prepass + cascade + GI-update rays
        # (documented), which flatters ~1.4x vs primary-only
        return fps, {
            "fps": round(fps, 3),
            "mrays_per_s": round(mrays, 2),
            "mrays_primary_only": round(rays["primary"] * fps / 1e6, 2),
            "hit_frac": round(hit_frac, 4),
            "frames": frames,
            "straggler_overflow": overflow,
            "rays_per_frame_mean": rays,
            "tier_mix": tier_mix,
            "camera_path": cam_path,
        }

    fps, stats = run_point(ecfg, "headline", n_frames)
    mrays = stats["mrays_per_s"]

    extras = {"headline": stats, "device": str(dev),
              "readback_s": round(readback_s, 3),
              "world_build_s": round(build_s, 1),
              "world_build_phases": phase_times,
              "note": ("frames dispatched back-to-back (chained via GI/"
                       "history/accumulator), one closing readback; "
                       "Mrays counts primary+prepass+cascade+GI-update "
                       "rays (water pair excluded: scene-dependent)")}

    if config4:
        ecfg4 = dataclasses.replace(
            ecfg, render=dataclasses.replace(ecfg.render, width=1920,
                                             height=1080))
        try:
            fps4, stats4 = run_point(ecfg4, "config4-1080p",
                                     max(n_frames // 2, 4))
            extras["config4_1080p_native_gi"] = stats4
        except Exception as e:  # noqa: BLE001 - extras must not kill the run
            log(f"config4 extra failed: {e}")

    gi_tag = "on" if include_gi else "off"
    sh_tag = "soft" if soft else "hard"
    op = (f"{width}x{height}+3x upscale to {3 * width}x{3 * height}"
          if upscale else f"{width}x{height}")
    sem_tag = ("TPU-tuned cadence"
               if (fast_trace or soft or checker or quarter or adaptive
                   or slim or rcfg.prepass_divisor != 2)
               else "reference-exact cadence")
    if adaptive:
        sem_tag = ("motion-adaptive primaries (checker/quarter, "
                   f"{cam_path} path), " + sem_tag)
    if checker:
        sem_tag = "checkerboard primaries, " + sem_tag
    if quarter:
        sem_tag = "quarter-rate primaries (4-phase), " + sem_tag
    if include_gi and gi_cadence > 1:
        sem_tag += f", GI window every {gi_cadence} frames"
    if include_gi and comp_cadence > 1:
        sem_tag += f", GI composite every {comp_cadence} frames"
    print(json.dumps({
        "metric": f"Mrays/s at {op} hybrid SDF+DDA trace "
                  f"({world_tag} world, gi={gi_tag} div{rcfg.gi_res_divisor}"
                  f", prepass 1/{rcfg.prepass_divisor}, "
                  f"{sh_tag} shadows, {sem_tag}, "
                  f"single chip, pipelined dispatch)",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(fps / 30.0, 4),
        "extra": extras,
    }))


if __name__ == "__main__":
    main()
