"""Motion-adaptive rate scheduler (render/scheduler.py).

Host-side policy tests: the motion metric against analytic pose math and
the tier ladder + hysteresis behavior.  The delivered-quality gate for
the tiers themselves lives in scripts/probe_checker_motion.py and the
checker/quarter gates in tests/test_render.py.
"""

import math

import numpy as np

from rvgrt_tpu.render.scheduler import (RATE_CHECKER, RATE_FULL,
                                        RATE_QUARTER, AdaptiveRateConfig,
                                        AdaptiveRateScheduler)

W, H = 1280, 800


def _pose(yaw: float, pos=(0.0, 0.0, 0.0)):
    fwd = np.array([math.sin(yaw), 0.0, math.cos(yaw)], np.float32)
    return np.asarray(pos, np.float32), fwd


def test_rotation_motion_matches_analytic():
    s = AdaptiveRateScheduler(W, H)
    dyaw = 0.02
    p0, f0 = _pose(0.0)
    p1, f1 = _pose(dyaw)
    px = s.motion_pixels(p0, f0, p1, f1)
    fovy = math.radians(60.0)
    fov_x = 2.0 * math.atan(math.tan(0.5 * fovy) * (W / H))
    assert abs(px - dyaw * W / fov_x) < 1e-3


def test_translation_motion_parallax_model():
    cfg = AdaptiveRateConfig(parallax_depth=10.0)
    s = AdaptiveRateScheduler(W, H, cfg=cfg)
    p0, f0 = _pose(0.0)
    p1 = np.array([0.5, 0.0, 0.0], np.float32)  # pure lateral strafe
    px = s.motion_pixels(p0, f0, p1, f0)
    fovy = math.radians(60.0)
    fov_x = 2.0 * math.atan(math.tan(0.5 * fovy) * (W / H))
    focal = (0.5 * W) / math.tan(0.5 * fov_x)
    assert abs(px - 0.5 / 10.0 * focal) < 1e-3


def test_tier_ladder_and_hysteresis():
    cfg = AdaptiveRateConfig(checker_above_frac=0.01, hysteresis=0.25)
    s = AdaptiveRateScheduler(W, H, cfg=cfg)
    thr_px = 0.01 * W
    # starts at checker (empty history); low motion drops to quarter
    assert s.pick(0.0) == RATE_QUARTER
    # below the +25% band: stays quarter even though raw >= threshold
    assert s.pick(thr_px * 1.1) == RATE_QUARTER
    # clears the band: promotes to checker
    assert s.pick(thr_px * 1.3) == RATE_CHECKER
    # inside the dead zone on the way down: stays checker
    assert s.pick(thr_px * 0.9) == RATE_CHECKER
    # clears the -25% band: back to quarter
    assert s.pick(thr_px * 0.7) == RATE_QUARTER


def test_full_tier_opt_in_and_one_step_moves():
    cfg = AdaptiveRateConfig(checker_above_frac=0.01,
                             full_above_frac=0.05, hysteresis=0.0)
    s = AdaptiveRateScheduler(W, H, cfg=cfg)
    # extreme motion from quarter climbs one boundary per call
    assert s.pick(0.0) == RATE_QUARTER
    assert s.pick(0.10 * W) == RATE_CHECKER
    assert s.pick(0.10 * W) == RATE_FULL
    # and descends one step at a time too
    assert s.pick(0.0) == RATE_CHECKER
    assert s.pick(0.0) == RATE_QUARTER
    # default config never emits full
    s2 = AdaptiveRateScheduler(W, H)
    for _ in range(4):
        assert s2.pick(1e9) == RATE_CHECKER


def test_resolution_independent_policy():
    for (w, h) in ((1280, 800), (320, 200)):
        s = AdaptiveRateScheduler(w, h)
        dyaw_fast = 0.05   # rad/frame: a fast pan at any render res
        dyaw_slow = 0.002
        p0, f0 = _pose(0.0)
        for dyaw, want in ((dyaw_fast, RATE_CHECKER),
                           (dyaw_slow, RATE_QUARTER)):
            s2 = AdaptiveRateScheduler(w, h)
            p1, f1 = _pose(dyaw)
            rate = None
            for _ in range(3):  # let hysteresis settle
                rate = s2.pick(s2.motion_pixels(p0, f0, p1, f1))
            assert rate == want, (w, dyaw, rate)
