"""Train the learned residual head on top of the temporal accumulator
(upscale/residual.py) and evaluate it held-out.

The head is a pure post-pass (the accumulator recurrence stays analytic),
so training is plain supervised regression on (accumulator output,
current-frame inputs) -> SSAA reference.  Targets are SSAA-supersampled:
the head must beat the accumulator on ANTI-ALIASED truth, not learn to
re-alias (round-2 lesson on references).

Usage:
  python scripts/train_residual.py --cube 8 --low-w 128 --low-h 96 \
      --frames 72 --steps 800 --ssaa 4 --gi
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
    p.add_argument("--low-h", type=int, default=96)
    p.add_argument("--frames", type=int, default=72)
    p.add_argument("--eval-frames", type=int, default=24)
    p.add_argument("--seg", type=int, default=12)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ssaa", type=int, default=4)
    p.add_argument("--gi", action="store_true", default=True)
    p.add_argument("--features", type=int, default=32)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--eval-seed", type=int, default=202,
                   help="held-out path seed (202 faces terrain; the old "
                        "101 default faces pure sky at cube 8 - "
                        "hit_frac 0.000, a vacuous 70 dB eval)")
    p.add_argument("--out", default="checkpoints/residual_head.pkl")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
    from rvgrt_tpu.scene.camera import phase_jitter_sequence
    from rvgrt_tpu.upscale import residual as res_mod
    from rvgrt_tpu.upscale import train as up_train
    from rvgrt_tpu.upscale.train import render_pair_dataset

    print(f"device={jax.devices()[0]}", flush=True)
    ecfg = EngineConfig(world=WorldConfig().with_cube(args.cube),
                        render=RenderConfig())
    jseq = phase_jitter_sequence(3)

    def segments_of(n_frames, path_seed):
        t0 = time.time()
        data = list(render_pair_dataset(
            ecfg, n_frames, args.low_w, args.low_h, include_gi=args.gi,
            segment_len=args.seg, path_seed=path_seed, ssaa=args.ssaa,
            jitter_seq=jseq))
        print(f"rendered {len(data)} pairs (seed {path_seed}) in "
              f"{time.time() - t0:.0f}s", flush=True)
        segs = [data[i:i + args.seg] for i in range(0, len(data), args.seg)]
        t0 = time.time()
        rsegs = [list(res_mod.accumulate_samples(s)) for s in segs]
        print(f"accumulated in {time.time() - t0:.0f}s", flush=True)
        return rsegs

    train_segs = segments_of(args.frames, path_seed=0)
    eval_segs = segments_of(args.eval_frames, path_seed=args.eval_seed)

    net, params = res_mod.init_params(jax.random.PRNGKey(0), args.low_h,
                                      args.low_w, features=args.features,
                                      depth_layers=args.layers)
    opt = up_train.make_optimizer(args.lr, decay_steps=args.steps)
    opt_state = opt.init(params)

    flat = [s for seg in train_segs for s in seg]
    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        s = flat[rng.integers(len(flat))]
        params, opt_state, loss, _ = res_mod.train_step(
            params, opt_state, net, opt, s)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s",
          flush=True)

    for k, seg in enumerate(eval_segs):
        print(f"eval segment {k}: {res_mod.evaluate(net, params, seg)}",
              flush=True)
    tr = res_mod.evaluate(net, params,
                          [s for seg in train_segs[:2] for s in seg])
    print(f"train-split sanity: {tr}", flush=True)

    from rvgrt_tpu.driver import checkpoint as ck

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    ck.save_params(args.out, {
        "kind": "residual_head", "features": args.features,
        "layers": args.layers, "params": jax.device_get(params)})
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
