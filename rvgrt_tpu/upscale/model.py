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
    """Sample (H, W, C) at float pixel coords (clamped); x/y shaped (h, w)."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def warp_history(history: jnp.ndarray, motion_lowres: jnp.ndarray):
    """Reproject the previous high-res frame using low-res motion vectors.

    Motion is the NDC delta current-previous (y negated, matching the DLSS
    convention the reference feeds - StateRender.cu:241,251): the previous
    position of out-pixel p is p - motion_px.
    """
    hh, hw = history.shape[0], history.shape[1]
    lh, lw = motion_lowres.shape[0], motion_lowres.shape[1]
    mv = jax.image.resize(motion_lowres, (hh, hw, 2), "nearest")
    # NDC delta -> pixels at high res; NDC y is up, rows grow down, and the
    # buffer already negates y, so both axes map with +0.5 * size.
    mvx = mv[..., 0] * (0.5 * hw)
    mvy = mv[..., 1] * (0.5 * hh)
    xs = jnp.arange(hw, dtype=_F32)[None, :] - mvx
    ys = jnp.arange(hh, dtype=_F32)[:, None] - mvy
    return bilinear_sample(history, xs, jnp.broadcast_to(ys, (hh, hw)))


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
        # blend weight (disocclusion rejection) and to sharpen the residual
        hist_s2d = warped_history.reshape(
            h, SCALE, w, SCALE, 3).transpose(0, 2, 1, 3, 4).reshape(
            h, w, SCALE * SCALE * 3)
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

        # 3x upsample: conv to 9*(C_out) channels -> depth_to_space
        c_out = 4  # rgb + history blend logit
        x = nn.Conv(SCALE * SCALE * c_out, (3, 3), dtype=self.dtype,
                    name="shuffle")(x)
        x = x[0]
        x = x.reshape(h, w, SCALE, SCALE, c_out)
        x = x.transpose(0, 2, 1, 3, 4).reshape(h * SCALE, w * SCALE, c_out)

        rgb = x[..., :3].astype(_F32)
        alpha = nn.sigmoid(x[..., 3].astype(_F32))[..., None]

        # base: bilinear upsample of the low-res color as a residual anchor
        base = jax.image.resize(color, (h * SCALE, w * SCALE, 3), "bilinear")
        current = jnp.clip(base + rgb, 0.0, 1.0)
        out = alpha * warped_history + (1.0 - alpha) * current
        return jnp.clip(out, 0.0, 1.0), alpha[..., 0]


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
            history):
    """One DLSS-evaluate equivalent: warp history, run the net."""
    warped = warp_history(history, motion)
    out, alpha = net.apply(params, color, motion, depth, jitter, warped)
    return out, alpha
