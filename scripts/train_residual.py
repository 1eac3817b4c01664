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
    p.add_argument("--loss", choices=["l1g", "mse"], default="l1g",
                   help="l1g = L1 + 0.5*gradient-L1 (default); mse = "
                        "plain MSE (PSNR-aligned - capacity probes)")
    p.add_argument("--f32", action="store_true",
                   help="run the head in float32 instead of bfloat16")
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

    net = res_mod.ResidualHead(features=args.features,
                               depth_layers=args.layers,
                               dtype=jnp.float32 if args.f32
                               else jnp.bfloat16)
    dummy = dict(
        color=jnp.zeros((args.low_h, args.low_w, 3), jnp.float32),
        motion=jnp.zeros((args.low_h, args.low_w, 2), jnp.float32),
        depth=jnp.zeros((args.low_h, args.low_w), jnp.float32),
        jitter=jnp.zeros((2,), jnp.float32),
        acc_out=jnp.zeros((args.low_h * 3, args.low_w * 3, 3), jnp.float32),
        acc_conf=jnp.zeros((args.low_h * 3, args.low_w * 3), jnp.float32))
    params = net.init(jax.random.PRNGKey(0), **dummy)
    opt = up_train.make_optimizer(args.lr, decay_steps=args.steps)
    opt_state = opt.init(params)

    flat = [s for seg in train_segs for s in seg]
    rng = np.random.default_rng(0)

    import functools

    if args.loss == "mse":
        def mse_loss(params, net, s):
            out = net.apply(params, s.color, s.motion, s.depth, s.jitter,
                            s.acc_out, s.acc_conf)
            return jnp.mean((out - s.target) ** 2), out

        @functools.partial(jax.jit, static_argnames=("net", "opt"))
        def step_fn(params, opt_state, net, opt, s):
            (loss, out), grads = jax.value_and_grad(
                mse_loss, has_aux=True)(params, net, s)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax_apply(params, updates), opt_state, loss, out

        import optax

        def optax_apply(params, updates):
            return optax.apply_updates(params, updates)
    else:
        step_fn = res_mod.train_step

    t0 = time.time()
    for i in range(args.steps):
        s = flat[rng.integers(len(flat))]
        params, opt_state, loss, _ = step_fn(
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
