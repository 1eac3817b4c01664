"""Fused Pallas superstep for the wavefront tracer (VERDICT r4 #2).

One Mosaic kernel runs the tracer's ENTIRE post-gather state machine -
sphere march, SDF probe/jump, and the unrolled DDA brick substeps
(reference hot loop ``raytracing_functions.cu:123-193``) - over a whole
retirement tile resident in VMEM.  Only the combined-table gather stays
in XLA: the Mosaic dynamic-gather census (PERF.md round-3) showed
arbitrary HBM gathers cannot lower into Pallas, so the superstep becomes

    XLA:    widx = f(state)         (elementwise)
            word = table[widx]      (THE gather, ~7.5 ns/element)
    Pallas: state' = g(state, word) (this kernel; was ~12-13 ns/lane
                                     of XLA VPU work, PERF.md:285)

The kernel body does not reimplement the math: it calls the SAME
``wavefront._superstep_pregather`` / ``_superstep_update`` jnp functions
the XLA body uses (Pallas kernels are jnp programs), so the two paths
are bit-exact by construction; gated in ``tests/test_trace.py`` and the
on-chip A/B lives in ``scripts/probe_r29_superstep.py``.

Limits: the slim-carry and volume-sharded (``z_edges``) variants fall
back to the XLA body (``wavefront._trace_impl`` dispatch).  On
non-TPU backends the kernel runs in Pallas interpret mode (CI).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32

#: carried state arrays, in kernel argument order (no ``step`` scalar -
#: the caller advances it in XLA)
STATE_KEYS = ("px", "py", "pz", "ix", "iy", "iz", "flags", "its",
              "tmx", "tmy", "tmz")
_N_DIRS = 9  # dx dy dz ddx ddy ddz stx sty stz


def _kernel(cfg, rcfg, has_sky, *refs):
    from rvgrt_tpu.trace import wavefront as wf

    i = 0
    sky = None
    if has_sky:
        sky = refs[0][0, 0]
        i = 1
    word = refs[i][:]
    state_refs = refs[i + 1:i + 1 + len(STATE_KEYS)]
    dir_refs = refs[i + 1 + len(STATE_KEYS):
                    i + 1 + len(STATE_KEYS) + _N_DIRS]
    out_refs = refs[i + 1 + len(STATE_KEYS) + _N_DIRS:]

    s = {k: r[:] for k, r in zip(STATE_KEYS, state_refs)}
    dirs = tuple(r[:] for r in dir_refs)
    # recompute the retirement masks from flags (cheap, elementwise) so
    # the kernel needs no mask inputs; bit-identical to the XLA body's
    # pregather because it IS the same function
    pre = wf._superstep_pregather(cfg, rcfg, dirs, s, sky_y=sky)
    ns = wf._superstep_update(cfg, rcfg, dirs,
                              (s["tmx"], s["tmy"], s["tmz"]), s, pre,
                              word, z_edges=None, carry_tm=True)
    for r, k in zip(out_refs, STATE_KEYS):
        r[:] = ns[k]


def _lane_shape(shape) -> tuple:
    """2-D (sublanes, lanes) view of an arbitrary tile shape."""
    if len(shape) == 2:
        return shape
    n = math.prod(shape) if shape else 1
    for lanes in (1024, 512, 256, 128):
        if n % lanes == 0:
            return (n // lanes, lanes)
    return (1, n)


def fused_superstep(cfg, rcfg, dirs, s, word, sky_y=None):
    """One superstep's post-gather state update as a Pallas kernel.

    ``dirs`` = (dx, dy, dz, ddx, ddy, ddz, stx, sty, stz) per-lane
    invariants; ``s`` the state dict (STATE_KEYS + ``step``, which is
    passed through untouched); ``word`` the gathered combined-table
    word.  Returns the next state dict like ``_superstep_update``.
    """
    shape = word.shape
    shp2 = _lane_shape(shape)
    re2 = (lambda a: a) if shp2 == shape else (lambda a: a.reshape(shp2))

    has_sky = sky_y is not None
    args = []
    in_specs = []
    if has_sky:
        args.append(jnp.reshape(jnp.asarray(sky_y, _F32), (1, 1)))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    for a in (word, *[s[k] for k in STATE_KEYS], *dirs):
        args.append(re2(a))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_shape = tuple(jax.ShapeDtypeStruct(shp2, s[k].dtype)
                      for k in STATE_KEYS)
    out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in STATE_KEYS)

    def kernel(*refs):
        _kernel(cfg, rcfg, has_sky, *refs)

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        # CI runs on CPU: interpret there, compile on TPU
        interpret=jax.default_backend() == "cpu",
    )(*args)

    ns = {k: (o if shp2 == shape else o.reshape(shape))
          for k, o in zip(STATE_KEYS, outs)}
    if "step" in s:
        ns["step"] = s["step"]
    return ns
