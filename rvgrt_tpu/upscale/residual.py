"""Learned residual head on top of the temporal accumulator.

The north star replaces DLSS (``main.cpp:178-191``) with a learned
upscaler.  Round-2 measured that standalone conv nets top out at bilinear
level (28.2-28.3 dB) while the analytic temporal accumulator
(``upscale/temporal.py``) reaches 30.2 dB at the operating point - so the
learned component is a RESIDUAL HEAD: a small zero-initialized conv net
that sees the accumulator's output + confidence and the current frame's
inputs, and predicts a per-pixel correction.  Its starting output is
exactly the accumulator (training can only improve on the analytic
baseline), and it does NOT feed back into the accumulator state - the
recurrence stays analytic and stable, the net is a pure post-pass, and
training is plain supervised regression (no closed-loop rollout needed).

What the head can fix that the accumulator cannot: resample blur under
sustained motion, variance-clamp residue (ghosting edges), jitter-phase
aliasing in low-confidence regions, and checkerboard neighbor-fill
artifacts - all visible in its inputs (confidence map + current frame vs
accumulated history disagreement).
"""

from __future__ import annotations

import functools
from typing import Any, Iterator, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from rvgrt_tpu.upscale import model as up_model
from rvgrt_tpu.upscale import temporal as up_temporal

_F32 = jnp.float32
SCALE = up_model.SCALE


class ResSample(NamedTuple):
    color: jnp.ndarray    # (h, w, 3) low-res input
    motion: jnp.ndarray   # (h, w, 2)
    depth: jnp.ndarray    # (h, w)
    jitter: jnp.ndarray   # (2,)
    acc_out: jnp.ndarray  # (3h, 3w, 3) temporal accumulator output
    acc_conf: jnp.ndarray  # (3h, 3w) accumulator confidence
    target: jnp.ndarray   # (3h, 3w, 3) SSAA ground truth


def _s2d(cf_or_img: jnp.ndarray) -> jnp.ndarray:
    """(3h, 3w[, c]) display-res -> (h, w, 9[*c]) space-to-depth via
    strided channel-first slices (no small-minor-dim reshapes - they
    tile-pad ~42x on TPU, model.py layout notes)."""
    a = cf_or_img
    if a.ndim == 2:
        a = a[..., None]
    cf = a.transpose(2, 0, 1)
    return jnp.concatenate(
        [cf[:, si::SCALE, sj::SCALE]
         for si in range(SCALE) for sj in range(SCALE)],
        axis=0).transpose(1, 2, 0)


class ResidualHead(nn.Module):
    """Zero-initialized residual over the accumulator output."""

    features: int = 32
    depth_layers: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, color, motion, depth, jitter, acc_out, acc_conf):
        h, w = color.shape[0], color.shape[1]
        jit_map = jnp.broadcast_to(jitter.astype(self.dtype), (h, w, 2))
        x = jnp.concatenate([
            color.astype(self.dtype),
            motion.astype(self.dtype),
            depth[..., None].astype(self.dtype),
            jit_map,
            _s2d(acc_out).astype(self.dtype),            # 27
            _s2d(acc_conf * _F32(1.0 / up_temporal._CONF_MAX)
                 ).astype(self.dtype),                   # 9
        ], axis=-1)[None]
        for i in range(self.depth_layers):
            x = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                        name=f"feat{i}")(x)
            x = nn.relu(x)
        # zero-init shuffle conv: the head's initial output is EXACTLY the
        # accumulator, so training is monotone improvement from 30.2 dB,
        # not recovery from a noisy-residual start (model.py's lesson)
        x = nn.Conv(SCALE * SCALE * 3, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name="shuffle")(x)
        res_cf = up_model.depth_to_space_cf(x[0], SCALE, 3).astype(_F32)
        out_cf = acc_out.transpose(2, 0, 1) + res_cf
        return jnp.clip(out_cf, 0.0, 1.0).transpose(1, 2, 0)


def init_params(key, height: int, width: int, features: int = 32,
                depth_layers: int = 3):
    net = ResidualHead(features=features, depth_layers=depth_layers)
    dummy = dict(
        color=jnp.zeros((height, width, 3), _F32),
        motion=jnp.zeros((height, width, 2), _F32),
        depth=jnp.zeros((height, width), _F32),
        jitter=jnp.zeros((2,), _F32),
        acc_out=jnp.zeros((height * SCALE, width * SCALE, 3), _F32),
        acc_conf=jnp.zeros((height * SCALE, width * SCALE), _F32),
    )
    return net, net.init(key, **dummy)


def apply(net: ResidualHead, params, color, motion, depth, jitter,
          acc_out, acc_conf):
    return net.apply(params, color, motion, depth, jitter, acc_out,
                     acc_conf)


def accumulate_samples(samples, valid=None) -> Iterator[ResSample]:
    """Run the analytic accumulator over an ORDERED segment of
    ``train.Sample``s (zero initial state = segment start) and yield
    residual-head training samples."""
    state = None
    step = jax.jit(functools.partial(up_temporal.temporal_upscale))
    for s in samples:
        if state is None:
            state = up_temporal.init_state(s.color.shape[0],
                                           s.color.shape[1])
        out, state = step(s.color, s.motion, s.depth, s.jitter, state,
                          valid=valid)
        yield ResSample(color=s.color, motion=s.motion, depth=s.depth,
                        jitter=s.jitter, acc_out=out, acc_conf=state.conf,
                        target=s.target)


def _grad_l1(a, b):
    dxa = a[:, 1:] - a[:, :-1]
    dxb = b[:, 1:] - b[:, :-1]
    dya = a[1:] - a[:-1]
    dyb = b[1:] - b[:-1]
    return jnp.mean(jnp.abs(dxa - dxb)) + jnp.mean(jnp.abs(dya - dyb))


def loss_fn(params, net: ResidualHead, s: ResSample):
    out = net.apply(params, s.color, s.motion, s.depth, s.jitter,
                    s.acc_out, s.acc_conf)
    return jnp.mean(jnp.abs(out - s.target)) \
        + 0.5 * _grad_l1(out, s.target), out


@functools.partial(jax.jit, static_argnames=("net", "opt"))
def train_step(params, opt_state, net, opt, s: ResSample):
    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, net, s)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, out


def psnr(a, b) -> float:
    mse = float(jnp.mean((a - b) ** 2))
    return 99.0 if mse == 0 else float(10.0 * jnp.log10(1.0 / mse))


def evaluate(net, params, res_samples) -> dict:
    """Held-out PSNR of head output vs the accumulator it rides on."""
    head_p, acc_p = [], []
    app = jax.jit(lambda p, s: net.apply(p, s.color, s.motion, s.depth,
                                         s.jitter, s.acc_out, s.acc_conf))
    for s in res_samples:
        out = app(params, s)
        head_p.append(psnr(out, s.target))
        acc_p.append(psnr(s.acc_out, s.target))
    return {"psnr_head": sum(head_p) / len(head_p),
            "psnr_accumulator": sum(acc_p) / len(acc_p)}
