"""Self-supervised upscaler training.

Training data is free: render the same deterministic camera path at low and
at 3x resolution with the same engine (SURVEY.md §7.8) - the high-res render
is ground truth.  Loss = L1 + gradient L1 (edge preservation), optimizer
adam via optax.  The training step is jitted and MXU-friendly (bf16 convs,
f32 loss).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rvgrt_tpu.upscale import model as up_model

_F32 = jnp.float32


class Sample(NamedTuple):
    color: jnp.ndarray    # (h, w, 3) low-res
    motion: jnp.ndarray   # (h, w, 2)
    depth: jnp.ndarray    # (h, w)
    jitter: jnp.ndarray   # (2,)
    history: jnp.ndarray  # (3h, 3w, 3) previous high-res output (or zeros)
    target: jnp.ndarray   # (3h, 3w, 3) high-res ground truth


def _grad_l1(a, b):
    dxa = a[:, 1:] - a[:, :-1]
    dxb = b[:, 1:] - b[:, :-1]
    dya = a[1:] - a[:-1]
    dyb = b[1:] - b[:-1]
    return jnp.mean(jnp.abs(dxa - dxb)) + jnp.mean(jnp.abs(dya - dyb))


def loss_fn(params, net: up_model.UpscalerNet, s: Sample):
    warped = up_model.warp_history(s.history, s.motion)
    out, _ = net.apply(params, s.color, s.motion, s.depth, s.jitter, warped)
    l1 = jnp.mean(jnp.abs(out - s.target))
    return l1 + 0.5 * _grad_l1(out, s.target), out


@functools.partial(jax.jit, static_argnames=("net", "opt"))
def train_step(params, opt_state, net, opt, s: Sample):
    """One update; also returns the net output, for CLOSED-LOOP history.

    Training must feed the net its own previous output as history, not the
    ground-truth previous frame: with teacher-forced GT history the blend
    weight degenerates to a constant (~0.4 measured) because blending GT
    history always helps - which then blends 40% black at history resets
    and compounds drift at inference."""
    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, net, s)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, jax.lax.stop_gradient(out)


def make_optimizer(lr: float = 1e-3, decay_steps: int | None = None):
    """Adam; with ``decay_steps``, cosine-decay the lr to 3% over the run."""
    if decay_steps:
        return optax.adam(optax.cosine_decay_schedule(lr, decay_steps,
                                                      alpha=0.03))
    return optax.adam(lr)


def render_pair_dataset(ecfg, n_frames: int, low_w: int, low_h: int,
                        include_gi: bool = False,
                        segment_len: int = 12,
                        path_seed: int = 0,
                        static: bool = False,
                        ssaa: int = 0,
                        jitter_seq=None) -> Iterator[Sample]:
    """Render (low-res inputs, 3x high-res target) pairs along a
    deterministic flythrough of the configured world.

    The path is cut into segments with varied motion (fly / strafe / turn
    left / turn right / climb) from re-randomized headings so the net sees
    diverse motion-vector and disocclusion statistics, not one constant
    forward-drift; each segment restarts the temporal history (a history
    reset is exactly the first-frame case the net must also handle)."""
    import numpy as np

    from rvgrt_tpu.driver.cli import spawn_above_terrain
    from rvgrt_tpu.driver.engine import Engine
    from rvgrt_tpu.scene.camera import InputState

    lo_cfg = dataclasses.replace(ecfg, render=dataclasses.replace(
        ecfg.render, width=low_w, height=low_h))
    hi_cfg = dataclasses.replace(ecfg, render=dataclasses.replace(
        ecfg.render, width=low_w * up_model.SCALE,
        height=low_h * up_model.SCALE))

    lo = Engine(lo_cfg, include_gi=include_gi, verbose=False)
    hi = Engine(hi_cfg, include_gi=include_gi, verbose=False)
    hi.world = lo.world  # share the device-resident world
    # the TARGET is the unjittered high-res signal: a jittered target
    # sub-pixel-shifts every frame, which punishes history reuse and blurs
    # what the net can learn.  The low-res INPUT keeps its jitter (the
    # DLSS input contract - the known sub-pixel offset is the signal that
    # makes temporal super-resolution possible).
    hi.character.use_jitter = False
    if jitter_seq is not None:
        # e.g. camera.phase_jitter_sequence(3): full display-phase
        # coverage for the temporal super-resolution accumulator
        lo.character.jitter_sequence = jitter_seq
    spawn = spawn_above_terrain(lo)
    hi.character.position = spawn.copy()
    hi.character.pitch = lo.character.pitch
    hi.character.yaw = lo.character.yaw

    moves = [
        InputState(move_z=1.0, mouse_dx=1.0),
        InputState(move_z=1.0, mouse_dx=-3.0),
        InputState(move_x=1.0, mouse_dx=0.5),
        InputState(move_z=1.0, mouse_dy=1.0),
        InputState(move_z=-1.0, mouse_dx=2.0),
    ]
    if static:
        moves = [InputState()]  # hold still: isolates jitter accumulation
    rng = np.random.default_rng(path_seed)
    if path_seed:
        # held-out paths start on their own heading too (the first
        # segment otherwise always flies the spawn heading); ONE draw,
        # assigned to both cameras - drawing per character desyncs the
        # low-res input from its target view
        yaw0 = float(rng.uniform(-3.14, 3.14))
        pitch0 = float(rng.uniform(-3.9, -3.3))
        for ch in (lo.character, hi.character):
            ch.yaw = yaw0
            ch.pitch = pitch0
    zero_hist = jnp.zeros((low_h * up_model.SCALE, low_w * up_model.SCALE,
                           3), _F32)
    history = zero_hist
    for i in range(n_frames):
        if segment_len and i % segment_len == 0 and i:
            # new heading + fresh history each segment; pitch resets into a
            # downward-looking band (the pitch-up move otherwise ratchets
            # toward PITCH_MAX and late segments render featureless sky,
            # which poisons both training and eval)
            lo.character.yaw = float(rng.uniform(-3.14, 3.14))
            lo.character.pitch = float(rng.uniform(-3.9, -3.3))
            hi.character.yaw = lo.character.yaw
            hi.character.pitch = lo.character.pitch
            hi.character.position = lo.character.position.copy()
            history = zero_hist
        inputs = moves[(i // max(segment_len, 1)) % len(moves)]
        out_lo = lo.step(inputs, 1 / 60)
        out_hi = hi.step(inputs, 1 / 60)
        target = out_hi.color
        if ssaa > 0:
            # supersampled reference: mean of `ssaa` jittered renders of
            # the SAME pose.  A single point-sampled render is itself
            # aliased (point-sampled textures, hard shadows); judging an
            # upscaler against it punishes correctly anti-aliased output.
            from rvgrt_tpu.scene.camera import JITTER_SEQUENCE

            import time as _time

            hw_, hh_ = hi.ecfg.render.width, hi.ecfg.render.height
            t_s = (_time.time() - hi.start_time) % 1e6
            acc = None
            for s in range(ssaa):
                jx, jy = JITTER_SEQUENCE[s % 8] * 0.5
                j = (float(jx) * 2.0 / hw_, float(jy) * 2.0 / hh_)
                c = hi.render_at(jitter_ndc=j, time_s=t_s).color
                acc = c if acc is None else acc + c
            target = acc / _F32(ssaa)
        jit = jnp.asarray(lo.character.ray_jitter_ndc(), _F32)
        yield Sample(color=out_lo.color, motion=out_lo.motion,
                     depth=out_lo.depth, jitter=jit, history=history,
                     target=target)
        history = target


def train_closed_loop(net, params, opt, opt_state, segments, steps: int,
                      rng=None, verbose: bool = True):
    """Closed-loop training: walk segments frame-by-frame, feeding the
    net's own (stop-gradient) output back as the next frame's history -
    the inference-time regime, including the zero-history segment start."""
    import numpy as np

    rng = rng or np.random.default_rng(0)
    zero_hist = jnp.zeros_like(segments[0][0].history)
    losses = []
    i = 0
    while i < steps:
        seg = segments[rng.integers(len(segments))]
        hist = zero_hist
        for s in seg:
            if i >= steps:
                break
            s = s._replace(history=hist)
            params, opt_state, loss, out = train_step(params, opt_state,
                                                      net, opt, s)
            hist = out
            losses.append(float(loss))
            if verbose and i % 100 == 0:
                print(f"step {i}: loss {losses[-1]:.4f}", flush=True)
            i += 1
    return params, opt_state, losses


def train(ecfg, steps: int = 200, low_w: int = 128, low_h: int = 96,
          lr: float = 1e-3, seed: int = 0, verbose: bool = True,
          segment_len: int = 12):
    """Train on freshly rendered pairs; returns (net, params, losses)."""
    import numpy as np

    net, params = up_model.init_params(jax.random.PRNGKey(seed), low_h,
                                       low_w)
    opt = make_optimizer(lr, decay_steps=steps)
    opt_state = opt.init(params)
    n_frames = min(max(steps, segment_len), 48)
    data = list(render_pair_dataset(ecfg, n_frames, low_w, low_h,
                                    segment_len=segment_len))
    segments = [data[i:i + segment_len]
                for i in range(0, len(data), segment_len)]
    params, opt_state, losses = train_closed_loop(
        net, params, opt, opt_state, segments, steps,
        rng=np.random.default_rng(seed), verbose=verbose)
    return net, params, losses


def save_params(params, path: str):
    from rvgrt_tpu.driver import checkpoint

    checkpoint.save_params(path, params)


def load_params(path: str):
    from rvgrt_tpu.driver import checkpoint

    return checkpoint.load_params(path)


def psnr(a, b) -> float:
    mse = float(jnp.mean((a - b) ** 2))
    if mse == 0:
        return 99.0
    return float(10.0 * jnp.log10(1.0 / mse))


def evaluate(net, params, samples, closed_loop: bool = True) -> dict:
    """PSNR + temporal stability of the net vs plain bilinear upsampling.

    ``closed_loop`` treats ``samples`` as one ordered segment and rolls the
    net's own output as history starting from zeros - the inference
    regime; otherwise each sample's stored history is used as-is.

    Temporal stability: mean |out_t - warp(out_{t-1}, motion_t)| over the
    segment (reprojected frame-to-frame residual - flicker), reported as a
    RATIO to the same residual of the ground-truth sequence.  1.0 = the
    output changes exactly as much as the true signal under camera motion;
    > 1 = added shimmer, < 1 = over-smoothed/ghosting."""
    net_psnrs, bil_psnrs = [], []
    net_flick, gt_flick = [], []
    hist = jnp.zeros_like(samples[0].history)
    prev_out = prev_gt = None
    for s in samples:
        if closed_loop:
            s = s._replace(history=hist)
        warped = up_model.warp_history(s.history, s.motion)
        out, _ = net.apply(params, s.color, s.motion, s.depth, s.jitter,
                           warped)
        hist = out
        bil = jax.image.resize(s.color, s.target.shape, "bilinear")
        net_psnrs.append(psnr(out, s.target))
        bil_psnrs.append(psnr(bil, s.target))
        if prev_out is not None:
            w_out = up_model.warp_history(prev_out, s.motion)
            w_gt = up_model.warp_history(prev_gt, s.motion)
            net_flick.append(float(jnp.mean(jnp.abs(out - w_out))))
            gt_flick.append(float(jnp.mean(jnp.abs(s.target - w_gt))))
        prev_out, prev_gt = out, s.target
    res = {"psnr_net": sum(net_psnrs) / len(net_psnrs),
           "psnr_bilinear": sum(bil_psnrs) / len(bil_psnrs)}
    if net_flick:
        gt = max(sum(gt_flick) / len(gt_flick), 1e-6)
        res["temporal_ratio"] = (sum(net_flick) / len(net_flick)) / gt
    return res


def main():
    """Train the upscaler on engine-rendered pairs and save params."""
    import argparse
    import time

    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=8)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--low-w", type=int, default=128)
    p.add_argument("--low-h", type=int, default=96)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--gi", action="store_true",
                   help="render training pairs with cone-traced GI on "
                        "(the stage-3/5 shading the net must serve)")
    p.add_argument("--eval-w", type=int, default=0,
                   help="held-out eval at a different low-res width "
                        "(e.g. 1280 = the stage-5 operating point; the "
                        "net is fully convolutional)")
    p.add_argument("--eval-h", type=int, default=0)
    p.add_argument("--eval-frames", type=int, default=24)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--variant", default="up-m",
                   help="model family member (models/upscaler.py)")
    p.add_argument("--out", default="checkpoints/upscaler.pkl")
    args = p.parse_args()

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig

    ecfg = EngineConfig(world=WorldConfig().with_cube(args.cube),
                        render=RenderConfig())
    t0 = time.time()
    data = list(render_pair_dataset(ecfg, args.frames, args.low_w,
                                    args.low_h, include_gi=args.gi))
    print(f"rendered {len(data)} pairs in {time.time() - t0:.0f}s",
          flush=True)

    from rvgrt_tpu.models import upscaler as up_family

    net, params = up_family.init(args.variant, jax.random.PRNGKey(0),
                                 args.low_h, args.low_w)
    opt = make_optimizer(args.lr, decay_steps=args.steps)
    opt_state = opt.init(params)
    seg = 12
    segments = [data[i:i + seg] for i in range(0, len(data), seg)]
    if args.eval_w:
        # held-out frames at the operating point, on a DIFFERENT camera
        # path (path_seed) - held out in both content and resolution;
        # every training segment then stays in the train split
        train_segs = segments
        eval_data = list(render_pair_dataset(
            ecfg, args.eval_frames, args.eval_w, args.eval_h,
            include_gi=args.gi, segment_len=seg, path_seed=101))
        eval_segs = [eval_data[i:i + seg]
                     for i in range(0, len(eval_data), seg)]
    else:
        train_segs, eval_segs = segments[:-2], segments[-2:]
    t0 = time.time()
    import numpy as np

    params, opt_state, _ = train_closed_loop(
        net, params, opt, opt_state, train_segs, args.steps,
        rng=np.random.default_rng(0))
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s",
          flush=True)
    for k, es in enumerate(eval_segs):
        print(f"eval segment {k}:", evaluate(net, params, es), flush=True)
    save_params({"variant": args.variant, "params": jax.device_get(params)},
                args.out)
    print(f"saved {args.out} ({args.variant})", flush=True)


if __name__ == "__main__":
    main()
