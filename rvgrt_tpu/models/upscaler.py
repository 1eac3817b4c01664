"""Upscaler model family: named variants of the learned DLSS replacement.

The reference delegates upscaling to the closed Streamline DLSS binary with
a mode enum (UltraPerformance etc., ``main.cpp:529-543``).  Here the same
role is a model FAMILY: named conv-net variants trading quality for frame
cost, all sharing the DLSS input contract (low-res color + motion + depth +
jitter + warped high-res history -> 3x color + blend weight).

Variants (features x depth, all bf16 / MXU-dense):

========  ========  ======  =====================================
name      features  layers  intent
========  ========  ======  =====================================
up-s       16        2      cheapest; interactive preview
up-m       32        3      default (bench / stage-5 operating point)
up-l       64        4      quality; offline re-render
========  ========  ======  =====================================
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from rvgrt_tpu.upscale import model as _m


class UpscalerSpec(NamedTuple):
    name: str
    features: int
    depth_layers: int


VARIANTS: dict[str, UpscalerSpec] = {
    "up-s": UpscalerSpec("up-s", 16, 2),
    "up-m": UpscalerSpec("up-m", 32, 3),
    "up-l": UpscalerSpec("up-l", 64, 4),
}


def build(name: str = "up-m") -> _m.UpscalerNet:
    spec = VARIANTS[name]
    return _m.UpscalerNet(features=spec.features,
                          depth_layers=spec.depth_layers)


def init(name: str, key: jax.Array, height: int, width: int):
    """(net, params) for a named variant at a given low-res shape."""
    net = build(name)
    import jax.numpy as jnp

    dummy = dict(
        color=jnp.zeros((height, width, 3), jnp.float32),
        motion=jnp.zeros((height, width, 2), jnp.float32),
        depth=jnp.zeros((height, width), jnp.float32),
        jitter=jnp.zeros((2,), jnp.float32),
        warped_history=jnp.zeros((height * _m.SCALE, width * _m.SCALE, 3),
                                 jnp.float32),
    )
    return net, net.init(key, **dummy)
