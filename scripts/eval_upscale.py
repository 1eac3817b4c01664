"""Compare upscalers on rendered flythrough segments.

Renders held-out (low-res, 3x target) pairs with the real renderer
(upscale/train.render_pair_dataset) and evaluates, closed-loop per
segment:

  * bilinear resize (the floor),
  * the temporal super-resolution accumulator (upscale/temporal.py),
  * optional learned checkpoints (--net path [path ...]).

Reports mean PSNR vs the unjittered high-res target and the temporal
stability ratio (reprojected frame-to-frame residual vs ground truth's:
1.0 = moves like the true signal, >1 = shimmer, <1 = ghosting).

Usage:
  python scripts/eval_upscale.py --cube 8 --low-w 128 --low-h 80 \
      --frames 24 --gi --net checkpoints/upscaler.pkl
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cube", type=int, default=8)
    p.add_argument("--low-w", type=int, default=128)
    p.add_argument("--low-h", type=int, default=80)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--seg", type=int, default=12)
    p.add_argument("--gi", action="store_true")
    p.add_argument("--static", action="store_true",
                   help="hold the camera still (isolates sub-pixel jitter "
                        "accumulation from reprojection quality)")
    p.add_argument("--ssaa", type=int, default=0,
                   help="supersample the reference target with N jittered "
                        "renders per pose (0 = single point-sampled render)")
    p.add_argument("--path-seed", type=int, default=101)
    p.add_argument("--net", nargs="*", default=[],
                   help="learned checkpoints to include")
    p.add_argument("--residual", nargs="*", default=[],
                   help="residual-head checkpoints (ride the temporal "
                        "accumulator as a post-pass, upscale/residual.py)")
    p.add_argument("--taps", nargs="*",
                   default=["bilinear_shift"],
                   help="temporal-accumulator history-warp variants to "
                        "evaluate (bilinear / bilinear_shift / "
                        "catmull_shift / nearest)")
    p.add_argument("--decay", nargs="*", type=float, default=[0.35],
                   help="motion-decay values to evaluate (crossed with "
                        "the first --taps entry)")
    p.add_argument("--depth-reject", action="store_true",
                   help="also evaluate the accumulator with depth-based "
                        "disocclusion rejection (temporal.py depth_reject)")
    p.add_argument("--jitter9", action="store_true",
                   help="drive the renderer with the 9-phase full-"
                        "coverage jitter (camera.phase_jitter_sequence(3)) "
                        "instead of the reference's 8-phase table")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (fast small-scale checks)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.upscale import model as up_model
    from rvgrt_tpu.upscale import temporal
    from rvgrt_tpu.upscale.train import psnr, render_pair_dataset

    ecfg = EngineConfig(world=WorldConfig().with_cube(args.cube),
                        render=RenderConfig())
    t0 = time.time()
    jseq = None
    if args.jitter9:
        from rvgrt_tpu.scene.camera import phase_jitter_sequence
        jseq = phase_jitter_sequence(up_model.SCALE)
    data = list(render_pair_dataset(ecfg, args.frames, args.low_w,
                                    args.low_h, include_gi=args.gi,
                                    segment_len=args.seg,
                                    path_seed=args.path_seed,
                                    static=args.static, ssaa=args.ssaa,
                                    jitter_seq=jseq))
    print(f"rendered {len(data)} pairs in {time.time() - t0:.0f}s",
          flush=True)
    segs = [data[i:i + args.seg] for i in range(0, len(data), args.seg)]

    def flicker(prev_out, prev_gt, out, gt, motion):
        w_out = up_model.warp_history(prev_out, motion)
        w_gt = up_model.warp_history(prev_gt, motion)
        return (float(jnp.mean(jnp.abs(out - w_out))),
                float(jnp.mean(jnp.abs(gt - w_gt))))

    def report(name, run_segment):
        """run_segment(seg) -> list of outputs (closed loop inside)."""
        ps, fl_o, fl_g = [], [], []
        for seg in segs:
            outs = run_segment(seg)
            prev = None
            for s, out in zip(seg, outs):
                ps.append(psnr(out, s.target))
                if prev is not None:
                    o, g = flicker(prev[0], prev[1], out, s.target, s.motion)
                    fl_o.append(o)
                    fl_g.append(g)
                prev = (out, s.target)
        ratio = (sum(fl_o) / len(fl_o)) / max(sum(fl_g) / len(fl_g), 1e-6)
        print(f"{name:28s} psnr {sum(ps)/len(ps):6.2f} dB   "
              f"temporal_ratio {ratio:5.2f}", flush=True)
        return sum(ps) / len(ps)

    def run_bilinear(seg):
        return [jax.image.resize(s.color, s.target.shape, "bilinear")
                for s in seg]

    base = report("bilinear", run_bilinear)

    tp = base
    variants = [(t, args.decay[0], False) for t in args.taps]
    variants += [(args.taps[0], d, False) for d in args.decay[1:]]
    if args.depth_reject:
        variants += [(args.taps[0], args.decay[0], True)]
    for taps, decay, dr in variants:
        t_up = jax.jit(lambda c, m, d, j, s, taps=taps, decay=decay, dr=dr:
                       temporal.temporal_upscale(c, m, d, j, s,
                                                 warp_taps=taps,
                                                 motion_decay=decay,
                                                 depth_reject=dr))

        def run_temporal(seg, t_up=t_up, dr=dr):
            state = temporal.init_state(args.low_h, args.low_w,
                                        depth_reject=dr)
            outs = []
            for s in seg:
                out, state = t_up(s.color, s.motion, s.depth, s.jitter,
                                  state)
                outs.append(out)
            return outs

        tag = f"temporal[{taps} d={decay}{' +depth' if dr else ''}]"
        got = report(tag, run_temporal)
        if (taps, decay, dr) == variants[0]:
            tp = got

    for path in args.residual:
        from rvgrt_tpu.driver import checkpoint as ck
        from rvgrt_tpu.upscale import residual as res_mod

        blob = ck.load_params(path)
        rnet = res_mod.ResidualHead(features=blob["features"],
                                    depth_layers=blob["layers"])
        rparams = blob["params"]
        r_up = jax.jit(lambda c, m, d, j, s: temporal.temporal_upscale(
            c, m, d, j, s))
        r_app = jax.jit(lambda p, c, m, d, j, ao, ac: rnet.apply(
            p, c, m, d, j, ao, ac))

        def run_residual(seg):
            state = temporal.init_state(args.low_h, args.low_w)
            outs = []
            for s in seg:
                acc_out, state = r_up(s.color, s.motion, s.depth, s.jitter,
                                      state)
                outs.append(r_app(rparams, s.color, s.motion, s.depth,
                                  s.jitter, acc_out, state.conf))
            return outs

        report(f"residual[{os.path.basename(path)}]", run_residual)

    for path in args.net:
        net, params = up_model.load_checkpoint(path)
        n_up = jax.jit(lambda c, m, d, j, h: up_model.upscale(
            net, params, c, m, d, j, h)[0])

        def run_net(seg):
            hist = jnp.zeros_like(seg[0].history)
            outs = []
            for s in seg:
                hist = n_up(s.color, s.motion, s.depth, s.jitter, hist)
                outs.append(hist)
            return outs

        report(os.path.basename(path), run_net)

    print(f"temporal vs bilinear: {tp - base:+.2f} dB", flush=True)


if __name__ == "__main__":
    main()
