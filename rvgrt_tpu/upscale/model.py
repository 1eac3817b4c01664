"""Learned upscaler: the DLSS replacement.

The reference hands its low-res color + motion vectors + depth + jitter to
Streamline DLSS for 3x upscaling (1280x800 -> 3840x2400, ``main.cpp:134-191``,
resource tags at 448-509).  This module is the same contract as a small JAX
conv net:

  inputs:  low-res color (H, W, 3), motion (H, W, 2, NDC delta, y negated),
           depth (H, W), jitter (2,), and the previous *high-res* output
           (temporal history, reprojected with the motion vectors);
  output:  (3H, 3W, 3) color + a per-pixel history blend weight.

Design for the MXU: channels-last convs in bfloat16, 3x upsampling via a
conv to 9*C channels + depth-to-space (pixel shuffle) - all dense matmul
work, no gathers except the history warp (bilinear, 4 taps).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_F32 = jnp.float32

SCALE = 3  # 1280x800 -> 3840x2400


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample (H, W, C) at float pixel coords (clamped); x/y shaped (h, w).

    Gathers run channel-first: a (H, W, 3) gather output takes the
    lanes-of-3 TPU layout (42.7x padding - 4.3 GB per tap at 3840x2400),
    while (3, H, W) keeps the big dims minor."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[None]
    fy = (y - y0)[None]
    cf = img.transpose(2, 0, 1)  # (C, H, W)
    a = cf[:, y0, x0]
    b = cf[:, y0, x1]
    c = cf[:, y1, x0]
    d = cf[:, y1, x1]
    out = (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
           + c * (1 - fx) * fy + d * fx * fy)
    return out.transpose(1, 2, 0)


def _interleave_last(parts, s: int):
    """[p_0..p_{s-1}] each (..., n) -> (..., s*n) with out[..., s*i + k] =
    p_k[..., i].  repeat + masked select only - no (..., n, s) reshape,
    whose size-s minor dim would pad to 128 lanes on TPU."""
    n = parts[0].shape[-1]
    idx = jnp.arange(s * n, dtype=jnp.int32) % s
    out = None
    for k, p in enumerate(parts):
        rep = jnp.repeat(p, s, axis=-1)
        sel = jnp.where(idx == k, rep, 0).astype(p.dtype)
        out = sel if out is None else out + sel
    return out


def depth_to_space_cf(x_hwc: jnp.ndarray, s: int, c_out: int):
    """(h, w, s*s*c_out) conv output -> (c_out, s*h, s*w) channel-first.

    Equivalent to ``x.reshape(h, w, s, s, c) -> transpose -> (s*h, s*w, c)``
    but built from big-minor-dim ops only: that reshape's (s, s) interior
    dims tile-pad ~85x on TPU (6 GB at 3840x2400)."""
    h, w = x_hwc.shape[0], x_hwc.shape[1]
    cf = x_hwc.transpose(2, 0, 1)  # (s*s*c_out, h, w)
    t = cf.reshape(s, s, c_out, h, w)
    # columns: out[.., x*s + sj] = t[si, sj, .., x]
    cols = [_interleave_last([t[si, sj] for sj in range(s)], s)
            for si in range(s)]  # each (c_out, h, s*w)
    # rows: out[.., y*s + si, ..] = cols[si][.., y, ..]
    colsT = [c.transpose(0, 2, 1) for c in cols]  # (c_out, s*w, h)
    rows = _interleave_last(colsT, s)  # (c_out, s*w, s*h)
    return rows.transpose(0, 2, 1)  # (c_out, s*h, s*w)


def _pack_rgb8(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) f32 [0,1] -> (H, W) uint32 (r | g<<8 | b<<16)."""
    q = jnp.clip(jnp.round(img * 255.0), 0.0, 255.0).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)


def _unpack_rgb8_cf(w: jnp.ndarray) -> jnp.ndarray:
    """(H, W) uint32 -> (3, H, W) f32 [0,1] (channel-FIRST: a (H, W, 3)
    stack at display res takes the lanes-of-3 TPU layout, 42.7x padding)."""
    f = _F32(1.0 / 255.0)
    return jnp.stack([(w & 0xFF).astype(_F32) * f,
                      ((w >> 8) & 0xFF).astype(_F32) * f,
                      ((w >> 16) & 0xFF).astype(_F32) * f], axis=0)


def warp_history(history: jnp.ndarray, motion_lowres: jnp.ndarray,
                 mode: str = "bilinear_packed"):
    """Reproject the previous high-res frame using low-res motion vectors.

    Motion is the NDC delta current-previous (y negated, matching the DLSS
    convention the reference feeds - StateRender.cu:241,251): the previous
    position of out-pixel p is p - motion_px.

    ``mode`` trades gather count (the entire cost - XLA TPU gathers are
    ~7.5 ns per element, so 4 taps x 3 channels x 9.2M display pixels was
    0.83 s/frame at 3840x2400, as much as the whole base render):
      * ``bilinear``        - 4 taps x 3 channels (the original; exact)
      * ``bilinear_packed`` - RGB packed into one u32/pixel, 4 taps (3x
        fewer gathers; history quantized to 8 bits - the displayed frame
        is 8-bit anyway, and a <=1/255 input perturbation is far below
        the blend's noise floor)
      * ``nearest_packed``  - 1 tap (12x fewer; <=0.5 px resample shift,
        for perf-first operating points)
    """
    hh, hw = history.shape[0], history.shape[1]
    # resize per component: a (H, W, 2) resize temp takes the lanes-of-2
    # layout (64x padding at display res)
    mvx = jax.image.resize(motion_lowres[..., 0], (hh, hw), "nearest")
    mvy = jax.image.resize(motion_lowres[..., 1], (hh, hw), "nearest")
    # NDC delta -> pixels at high res; NDC y is up, rows grow down, and the
    # buffer already negates y, so both axes map with +0.5 * size.
    xs = jnp.arange(hw, dtype=_F32)[None, :] - mvx * (0.5 * hw)
    ys = jnp.arange(hh, dtype=_F32)[:, None] - mvy * (0.5 * hh)
    xs = jnp.broadcast_to(xs, (hh, hw))
    ys = jnp.broadcast_to(ys, (hh, hw))
    if mode == "bilinear":
        return bilinear_sample(history, xs, ys)
    packed = _pack_rgb8(history)
    x = jnp.clip(xs, 0.0, hw - 1.0)
    y = jnp.clip(ys, 0.0, hh - 1.0)
    if mode == "nearest_packed":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        return _unpack_rgb8_cf(packed[yi, xi]).transpose(1, 2, 0)
    assert mode == "bilinear_packed", mode
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, hw - 1)
    y1 = jnp.minimum(y0 + 1, hh - 1)
    fx = (x - x0)[None]
    fy = (y - y0)[None]
    a = _unpack_rgb8_cf(packed[y0, x0])
    b = _unpack_rgb8_cf(packed[y0, x1])
    c = _unpack_rgb8_cf(packed[y1, x0])
    d = _unpack_rgb8_cf(packed[y1, x1])
    out = (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
           + c * (1 - fx) * fy + d * fx * fy)
    return out.transpose(1, 2, 0)


class UpscalerNet(nn.Module):
    """Small conv net: features at low res, pixel-shuffle 3x, history blend."""

    features: int = 32
    depth_layers: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, color, motion, depth, jitter, warped_history):
        h, w = color.shape[0], color.shape[1]
        jit_map = jnp.broadcast_to(jitter.astype(self.dtype), (h, w, 2))
        # the warped history enters the FEATURE stack (space-to-depth to low
        # res, 3x3x3=27 channels), not just the output blend: the net must
        # see history-vs-current disagreement to predict a useful per-pixel
        # blend weight (disocclusion rejection) and to sharpen the residual.
        # Strided channel-first slices, not a (h, 3, w, 3, 3) reshape (its
        # size-3 minor dims tile-pad ~42x on TPU); channel order (si, sj,
        # rgb) matches the reshape formulation, so params stay compatible.
        wh_cf = warped_history.transpose(2, 0, 1)  # (3, 3h, 3w)
        hist_s2d = jnp.concatenate(
            [wh_cf[:, si::SCALE, sj::SCALE]
             for si in range(SCALE) for sj in range(SCALE)],
            axis=0).transpose(1, 2, 0)  # (h, w, 27)
        x = jnp.concatenate([
            color.astype(self.dtype),
            motion.astype(self.dtype),
            depth[..., None].astype(self.dtype),
            jit_map,
            hist_s2d.astype(self.dtype),
        ], axis=-1)[None]  # add batch dim for conv

        for i in range(self.depth_layers):
            x = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                        name=f"feat{i}")(x)
            x = nn.relu(x)

        # 3x upsample: conv to 9*(C_out) channels -> depth_to_space.
        # Everything at display res stays channel-first: (3H, 3W, small-c)
        # intermediates take lanes-of-c layouts (42x padding) on TPU.
        c_out = 4  # rgb + history blend logit

        def _shuffle_bias(key, shape, dtype=jnp.float32):
            # rgb residual channels start at 0 and the blend logit at -3
            # (alpha ~= 0.05): the net's initial output is exactly the
            # bilinear anchor, so training can only improve on bilinear -
            # a noisy-residual start measurably WORSE than bilinear never
            # recovers at this model size
            b = jnp.zeros(shape, dtype)
            return b.at[3::c_out].set(-3.0)

        x = nn.Conv(SCALE * SCALE * c_out, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=_shuffle_bias,
                    name="shuffle")(x)
        up = depth_to_space_cf(x[0], SCALE, c_out)  # (4, 3h, 3w)

        rgb_cf = up[:3].astype(_F32)
        alpha = nn.sigmoid(up[3].astype(_F32))[None]  # (1, 3h, 3w)

        # base: bilinear upsample of the low-res color as a residual anchor
        # (per channel - a (3H, 3W, 3) resize temp takes the bad layout)
        base_cf = jnp.stack(
            [jax.image.resize(color[..., c], (h * SCALE, w * SCALE),
                              "bilinear") for c in range(3)])
        current_cf = jnp.clip(base_cf + rgb_cf, 0.0, 1.0)
        out_cf = alpha * wh_cf.astype(_F32) + (1.0 - alpha) * current_cf
        return (jnp.clip(out_cf, 0.0, 1.0).transpose(1, 2, 0),
                alpha[0])


def init_params(key, height: int, width: int, features: int = 32):
    net = UpscalerNet(features=features)
    dummy = dict(
        color=jnp.zeros((height, width, 3), _F32),
        motion=jnp.zeros((height, width, 2), _F32),
        depth=jnp.zeros((height, width), _F32),
        jitter=jnp.zeros((2,), _F32),
        warped_history=jnp.zeros((height * SCALE, width * SCALE, 3), _F32),
    )
    params = net.init(key, **dummy)
    return net, params


def upscale(net: UpscalerNet, params, color, motion, depth, jitter,
            history, warp_mode: str = "bilinear_packed"):
    """One DLSS-evaluate equivalent: warp history, run the net."""
    warped = warp_history(history, motion, mode=warp_mode)
    out, alpha = net.apply(params, color, motion, depth, jitter, warped)
    return out, alpha


def load_checkpoint(path: str):
    """(net, params) from a checkpoint file.

    Accepts both raw param pytrees (default up-m architecture) and
    variant-tagged dicts ``{"variant": name, "params": ...}`` written by
    the trainer."""
    import jax

    import jax.numpy as jnp

    from rvgrt_tpu.driver import checkpoint as ck

    blob = ck.load_params(path)
    if isinstance(blob, dict) and "variant" in blob:
        from rvgrt_tpu.models import upscaler as up_family

        net = up_family.build(blob["variant"])
        params = blob["params"]
    else:
        net = UpscalerNet()
        params = blob
    return net, jax.tree.map(jnp.asarray, params)
