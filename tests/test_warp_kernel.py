"""History-warp kernel gates (ops/warp_kernels.py).

The Pallas kernel itself only lowers for TPU (the oracle-exactness gate
runs on the real chip via scripts/probe_r11.py - recorded bit-exact with
0 overflow lanes at 3840x2400).  What CI gates here on CPU:

* the XLA oracle (``warp_packed_bilinear_xla``) agrees with the
  accumulator's own exact-bilinear tap path (``_warp_state`` taps
  "bilinear") - the kernel's contract is anchored to the production
  semantics, not to a private re-derivation;
* the per-tile window-origin computation covers every source index for
  motion fields within the design range (so the kernel's overflow lanes
  are provably 0 there).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from rvgrt_tpu.ops import warp_kernels as wk
from rvgrt_tpu.upscale import temporal


def test_xla_oracle_matches_warp_state():
    rng = np.random.default_rng(0)
    h, w = 48, 128 * 2
    hist = jnp.asarray(rng.random((h, w, 3), np.float32))
    conf = jnp.asarray(rng.random((h, w), np.float32)
                       * temporal._CONF_MAX)
    state = temporal.TemporalState(history=hist, conf=conf)
    motion = jnp.asarray(
        (rng.random((h // 3, w // 3, 2), np.float32) - 0.5) * 0.02)
    rgb_ref, n_ref = temporal._warp_state(state, motion, taps="bilinear",
                                          motion_decay=0.0)

    # re-derive through the kernel's oracle with the same coords
    # (identical construction to _warp_state's, incl. the nearest resize)
    import jax

    packed = temporal._pack_rgbn(hist, conf)
    mvx = jax.image.resize(motion[..., 0], (h, w), "nearest")
    mvy = jax.image.resize(motion[..., 1], (h, w), "nearest")
    xs = jnp.clip(jnp.arange(w, dtype=jnp.float32)[None, :]
                  - mvx * (0.5 * w), 0.0, w - 1.0)
    ys = jnp.clip(jnp.arange(h, dtype=jnp.float32)[:, None]
                  - mvy * (0.5 * h), 0.0, h - 1.0)
    planes, ovf = wk.warp_packed_bilinear_xla(
        packed, jnp.broadcast_to(xs, (h, w)), jnp.broadcast_to(ys, (h, w)))
    np.testing.assert_allclose(np.asarray(planes[:3]), np.asarray(rgb_ref),
                               atol=1e-5)
    # the off-screen zeroing happens OUTSIDE the gather in _warp_state;
    # apply the same mask before comparing confidences
    xs_raw = jnp.arange(w, dtype=jnp.float32)[None, :] - mvx * (0.5 * w)
    ys_raw = jnp.arange(h, dtype=jnp.float32)[:, None] - mvy * (0.5 * h)
    inside = np.asarray(((xs_raw >= 0) & (xs_raw <= w - 1.0)
                         & (ys_raw >= 0) & (ys_raw <= h - 1.0))
                        .astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(planes[3]) * temporal._CONF_MAX * inside,
        np.asarray(n_ref), atol=1e-3)


def test_window_origins_cover_sources():
    """For any motion within the design range, every (floor(y), floor(x))
    and +1 tap must land inside the aligned per-tile window."""
    rng = np.random.default_rng(1)
    H, W = 8 * 16, 128 * 4
    # motion up to +-20 display px + a 40 px discontinuity band
    xs = np.clip(np.mgrid[0:H, 0:W][1].astype(np.float32)
                 + rng.uniform(-20, 20, (H, W)).astype(np.float32),
                 0, W - 1)
    ys = np.clip(np.mgrid[0:H, 0:W][0].astype(np.float32)
                 + rng.uniform(-12, 12, (H, W)).astype(np.float32),
                 0, H - 1)
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    nty, ntx = H // wk.R, W // wk.C
    by = y0.reshape(nty, wk.R, ntx, wk.C).min(axis=(1, 3))
    bx = x0.reshape(nty, wk.R, ntx, wk.C).min(axis=(1, 3))
    by = np.clip((by // 8) * 8, 0, max(H - wk.WR, 0))
    bx = np.clip((bx // 128) * 128, 0, max(W - wk.WC, 0))
    ly1 = np.minimum(y0 + 1, H - 1).reshape(nty, wk.R, ntx, wk.C) \
        - by[:, None, :, None]
    lx1 = np.minimum(x0 + 1, W - 1).reshape(nty, wk.R, ntx, wk.C) \
        - bx[:, None, :, None]
    assert ly1.max() <= wk.WR - 1 and lx1.max() <= wk.WC - 1
    ly0 = y0.reshape(nty, wk.R, ntx, wk.C) - by[:, None, :, None]
    lx0 = x0.reshape(nty, wk.R, ntx, wk.C) - bx[:, None, :, None]
    assert ly0.min() >= 0 and lx0.min() >= 0


@pytest.mark.full
def test_pallas_kernel_interpret_matches_oracle_slab_and_full():
    """The Pallas kernel itself (interpret mode on CPU) == the XLA oracle,
    at a full-frame shape AND at a row-slab shape (output grid derived
    from xs/ys, window DMAs over the full packed history - the sharded
    path's contract, ADVICE r3 high)."""
    rng = np.random.default_rng(21)
    hh, hw = 64, 512
    packed = jnp.asarray(rng.integers(0, 2 ** 32, (hh, hw),
                                      dtype=np.uint64).astype(np.uint32))
    # smooth source fields (locally coherent, like a real motion field)
    for oh, y_base in ((16, 20.0), (hh, 0.0)):
        xs = jnp.broadcast_to(jnp.asarray(
            (np.arange(hw, dtype=np.float32)[None, :] * 0.97
             + rng.random((oh, 1), np.float32) * 3).clip(0, hw - 1.001)),
            (oh, hw))
        ys = jnp.broadcast_to(jnp.asarray(
            (y_base + np.arange(oh, dtype=np.float32)[:, None] * 0.6
             + rng.random((1, hw), np.float32) * 2).clip(0, hh - 1.001)),
            (oh, hw))
        p_k, ovf = wk.warp_packed_bilinear(packed, xs, ys)
        p_x, _ = wk.warp_packed_bilinear_xla(packed, xs, ys)
        assert int(ovf) == 0
        assert p_k.shape == (4, oh, hw)
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x),
                                   atol=1e-6)
