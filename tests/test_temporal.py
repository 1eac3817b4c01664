"""Temporal super-resolution accumulator (upscale/temporal.py).

The synthetic capture model mirrors the renderer's jitter convention
exactly (pipeline._ray_dirs: low-res pixel i samples NDC i/w*2-1+jitter,
i.e. display coordinate SCALE*(i + jitter_ndc*w/2)), so these tests pin
the sub-pixel alignment math independently of a full render.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvgrt_tpu.scene.camera import JITTER_SEQUENCE
from rvgrt_tpu.upscale import model as up_model
from rvgrt_tpu.upscale import temporal

SCALE = temporal.SCALE
F32 = jnp.float32


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


def _smooth_truth(key, hh, hw, iters: int = 1):
    """Band-limited random display-res ground truth in [0, 1]."""
    g = jax.random.uniform(key, (hh, hw, 3), F32)
    cf = g.transpose(2, 0, 1)
    for _ in range(iters):
        for axis in (1, 2):
            cf = (temporal._shift_cf(cf, -1, axis) + cf
                  + temporal._shift_cf(cf, 1, axis)) / 3.0
    g = cf.transpose(1, 2, 0)
    g = (g - g.min()) / (g.max() - g.min())
    return g


def _capture(g, jitter_ndc, h, w):
    """Low-res frame: sample the continuous scene (bilinear interp of g)
    at display coords SCALE*(i + j_px) - the renderer's sample lattice."""
    jx = float(jitter_ndc[0]) * 0.5 * w
    jy = float(jitter_ndc[1]) * 0.5 * h
    xs = jnp.asarray((np.arange(w) + jx) * SCALE, F32)
    ys = jnp.asarray((np.arange(h) + jy) * SCALE, F32)
    X = jnp.broadcast_to(xs[None, :], (h, w))
    Y = jnp.broadcast_to(ys[:, None], (h, w))
    return up_model.bilinear_sample(g, X, Y)


def _jitter_ndc(frame, h, w):
    """8-phase sequence at half strength in render-NDC units, exactly as
    Character.update + ray_jitter_ndc produce it."""
    jx, jy = JITTER_SEQUENCE[frame % 8] * 0.5
    return jnp.asarray([jx * 2.0 / w, jy * 2.0 / h], F32)


def test_shift_cf():
    a = jnp.arange(5.0)[None, None, :]
    np.testing.assert_allclose(temporal._shift_cf(a, 1, 2)[0, 0],
                               [1, 2, 3, 4, 4])
    np.testing.assert_allclose(temporal._shift_cf(a, -2, 2)[0, 0],
                               [0, 0, 0, 1, 2])
    np.testing.assert_allclose(temporal._shift_cf(a, 2, 2)[0, 0],
                               [2, 3, 4, 4, 4])


def test_jitter_upsample_zero_jitter_interpolates():
    """With zero jitter, phase 0 must reproduce the low-res samples
    exactly (display pixel SCALE*i IS the sample position)."""
    key = jax.random.PRNGKey(0)
    c = jax.random.uniform(key, (6, 8, 3), F32)
    up = temporal.jitter_upsample(c, jnp.zeros(2, F32))  # (3, 18, 24)
    got = up[:, ::SCALE, ::SCALE].transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(c), atol=1e-6)


def test_jitter_upsample_compensates_known_offset():
    """A jittered capture, upsampled jitter-aware, must align with the
    ground truth better than the same capture upsampled jitter-blind."""
    h, w = 16, 20
    g = _smooth_truth(jax.random.PRNGKey(1), h * SCALE, w * SCALE)
    j = _jitter_ndc(6, h, w)  # the largest offset in the sequence
    f = _capture(g, j, h, w)
    aware = temporal.jitter_upsample(f, j).transpose(1, 2, 0)
    blind = temporal.jitter_upsample(f, jnp.zeros(2, F32)).transpose(1, 2, 0)
    # compare away from the border (edge-clamp differences)
    sl = np.s_[SCALE * 2:-SCALE * 2, SCALE * 2:-SCALE * 2]
    p_aware = _psnr(aware[sl], g[sl])
    p_blind = _psnr(blind[sl], g[sl])
    assert p_aware > p_blind + 2.0, (p_aware, p_blind)


def test_accumulation_beats_bilinear_static_camera():
    """16 static-camera frames through the real 8-phase jitter sequence:
    the accumulator must recover detail a single bilinear upsample cannot
    (this is the mechanism that carries the DLSS slot)."""
    h, w = 16, 20
    hh, hw = h * SCALE, w * SCALE
    g = _smooth_truth(jax.random.PRNGKey(2), hh, hw)
    motion = jnp.zeros((h, w, 2), F32)
    depth = jnp.zeros((h, w), F32)
    state = temporal.init_state(h, w)
    out = None
    for t in range(16):
        j = _jitter_ndc(t, h, w)
        f = _capture(g, j, h, w)
        out, state = temporal.temporal_upscale(f, motion, depth, j, state)
    f_last = _capture(g, _jitter_ndc(15, h, w), h, w)
    bil = jax.image.resize(f_last, (hh, hw, 3), "bilinear")
    sl = np.s_[SCALE * 2:-SCALE * 2, SCALE * 2:-SCALE * 2]
    p_acc = _psnr(out[sl], g[sl])
    p_bil = _psnr(bil[sl], g[sl])
    assert p_acc > p_bil + 3.0, (p_acc, p_bil)
    # confidence accumulated
    assert float(state.conf.mean()) > 3.0


def test_cut_ghosts_decay():
    """After a hard content cut with full-confidence stale history, the
    variance-clipping rectification must decay the ghost geometrically:
    error vs the NEW scene decreases every frame and drops well below its
    post-cut value within 6 frames."""
    h, w = 16, 20
    hh, hw = h * SCALE, w * SCALE
    ga = _smooth_truth(jax.random.PRNGKey(3), hh, hw, iters=4)
    gb = jnp.roll(ga, (7, 11), axis=(0, 1))  # same stats, shifted content
    state = temporal.TemporalState(
        history=ga, conf=jnp.full((hh, hw), 8.0, F32))
    motion = jnp.zeros((h, w, 2), F32)
    depth = jnp.zeros((h, w), F32)
    db = []
    for t in range(6):
        j = _jitter_ndc(t, h, w)
        fb = _capture(gb, j, h, w)
        out, state = temporal.temporal_upscale(fb, motion, depth, j, state)
        db.append(float(jnp.mean(jnp.abs(out - gb))))
    assert all(b2 < b1 for b1, b2 in zip(db, db[1:])), db
    assert db[-1] < db[0] * 0.85, db


def test_bilinear_shift_warp_matches_bilinear_under_constant_motion():
    """The 1-gather bilinear_shift warp must equal the 4-tap bilinear warp
    wherever the motion field is locally constant (its validity domain) -
    here: everywhere except the edge-clamp border."""
    h, w = 8, 10
    hh, hw = h * SCALE, w * SCALE
    rgb = jax.random.uniform(jax.random.PRNGKey(6), (hh, hw, 3), F32)
    n = jax.random.uniform(jax.random.PRNGKey(7), (hh, hw), F32) * 10.0
    state = temporal.TemporalState(history=rgb, conf=n)
    # constant sub-pixel motion (NDC units; fractional in display px)
    motion = jnp.broadcast_to(jnp.asarray([2.6 / (0.5 * hw),
                                           -1.3 / (0.5 * hh)], F32),
                              (h, w, 2))
    ref_rgb, ref_n = temporal._warp_state(state, motion, taps="bilinear")
    got_rgb, got_n = temporal._warp_state(state, motion,
                                          taps="bilinear_shift")
    sl = np.s_[4:-4, 4:-4]
    np.testing.assert_allclose(np.asarray(got_rgb[:, 4:-4, 4:-4]),
                               np.asarray(ref_rgb[:, 4:-4, 4:-4]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_n[sl]),
                               np.asarray(ref_n[sl]), atol=1e-4)


def test_packed_state_roundtrip():
    key = jax.random.PRNGKey(4)
    rgb = jax.random.uniform(key, (8, 10, 3), F32)
    n = jax.random.uniform(jax.random.PRNGKey(5), (8, 10), F32) * 12.0
    word = temporal._pack_rgbn(rgb, n)
    rgb2, n2 = temporal._unpack_rgbn_cf(word)
    np.testing.assert_allclose(np.asarray(rgb2.transpose(1, 2, 0)),
                               np.asarray(rgb), atol=1.0 / 255.0 + 1e-6)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n),
                               atol=12.0 / 255.0 + 1e-6)


def test_scale1_jitter_upsample_identity_at_zero_jitter():
    """scale=1 (native-res temporal reconstruction): with zero jitter the
    resample is the identity - the TAA path must not blur a static
    unjittered frame."""
    g = jax.random.uniform(jax.random.PRNGKey(7), (12, 14, 3), F32)
    out = temporal.jitter_upsample(g, jnp.zeros((2,), F32), scale=1)
    np.testing.assert_allclose(np.asarray(out.transpose(1, 2, 0)),
                               np.asarray(g), atol=1e-6)


@pytest.mark.parametrize("mode", ["checker", "quarter"])
def test_scale1_rate_cut_fill_converges_static(mode):
    """Native-res accumulator as the rate-cut hole filler (the tuned
    config-4 tier): a static scene rendered at checker/quarter rate with
    the untraced pixels set to GARBAGE must converge to the true image -
    the validity mask + history must fully suppress the filled pixels
    once every pixel has been visited."""
    from rvgrt_tpu.render import pipeline

    h, w = 16, 20
    g = _smooth_truth(jax.random.PRNGKey(9), h, w)
    motion = jnp.zeros((h, w, 2), F32)
    depth = jnp.zeros((h, w), F32)
    state = temporal.init_state(h, w, scale=1)
    out = None
    for t in range(10):
        if mode == "checker":
            # adversarial fill: untraced pixels carry GARBAGE - the
            # validity mask + history must fully suppress it
            par = jnp.int32(t & 1)
            valid = pipeline.checker_valid_mask(h, w, par)
            frame = jnp.where(valid[..., None], g, 0.5)
        else:
            # production fill (quarter_expand nearest fill): at quarter
            # rate an untraced pixel's 3x3 variance-clamp box is 3/4
            # untraced, so a garbage fill poisons the clamp - the real
            # pipeline never feeds garbage, it feeds the quad's traced
            # value (pipeline.quarter_expand docstring)
            par = jnp.int32(pipeline.QUARTER_PHASE_ORDER[t & 3])
            valid = pipeline.quarter_valid_mask(h, w, par)
            frame = pipeline.quarter_expand(pipeline.quarter_select(g, par),
                                            par)
        out, state = temporal.temporal_upscale(
            frame, motion, depth, jnp.zeros((2,), F32), state, valid=valid)
    assert out.shape == (h, w, 3)
    p = _psnr(out, g)
    assert p > 32.0, p
    # the garbage must not dominate anywhere.  The residual worst-pixel
    # error comes from the variance-clamp box, which is computed over the
    # RAW frame and is therefore garbage-contaminated here; production
    # fills untraced pixels with the 4-neighbor average (checker_expand),
    # so this is the adversarial bound, not the operating one.
    assert float(jnp.abs(out - g).max()) < 0.2
