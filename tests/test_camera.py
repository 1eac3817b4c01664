"""Camera/Character math tests: glm-convention matrices, jitter, dynamics."""

import math

import numpy as np

from rvgrt_tpu.scene import camera as cam_mod
from rvgrt_tpu.scene.camera import Character, InputState


def test_look_at_convention():
    eye = np.array([0.0, 0.0, 5.0], np.float32)
    center = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    m = cam_mod.look_at(eye, center, up)
    # view transform of the eye point = origin
    v = cam_mod.glm_mul(m, np.eye(4, dtype=np.float32))  # sanity: composable
    p = np.array([0.0, 0.0, 5.0, 1.0], np.float32)
    out = [m[0, r] * p[0] + m[1, r] * p[1] + m[2, r] * p[2] + m[3, r] * p[3]
           for r in range(4)]
    np.testing.assert_allclose(out[:3], [0, 0, 0], atol=1e-6)
    # a point in front of the camera (origin) maps to -z in view space (RH)
    p = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    out = [m[0, r] * p[0] + m[1, r] * p[1] + m[2, r] * p[2] + m[3, r] * p[3]
           for r in range(4)]
    assert out[2] < 0


def test_perspective_depth_range():
    pr = cam_mod.perspective(math.radians(60.0), 16 / 9, 0.1, 100.0)
    # near-plane point at z=-near maps to ndc z=-1, far to +1 (GL convention)
    for z, want in ((-0.1, -1.0), (-100.0, 1.0)):
        clip = [pr[0, r] * 0 + pr[1, r] * 0 + pr[2, r] * z + pr[3, r] * 1.0
                for r in range(4)]
        np.testing.assert_allclose(clip[2] / clip[3], want, atol=1e-4)
    assert pr[2, 3] == -1.0  # w = -z_view


def test_vp_roundtrip_hit_point():
    """A point along the camera forward axis projects to NDC center."""
    ch = Character()
    ch.position = np.array([10.0, 20.0, 30.0], np.float32)
    ch.update(InputState(), 1 / 60, 0)
    target = ch.position + ch.direction * 50.0
    m = ch.unjittered_view_projection
    p = np.array([*target, 1.0], np.float32)
    clip = [m[0, r] * p[0] + m[1, r] * p[1] + m[2, r] * p[2] + m[3, r] * p[3]
            for r in range(4)]
    assert clip[3] > 0
    np.testing.assert_allclose([clip[0] / clip[3], clip[1] / clip[3]],
                               [0.0, 0.0], atol=1e-5)


def test_jitter_sequence_cycles():
    ch = Character()
    ch.update(InputState(), 1 / 60, 0)
    j0 = ch.jitter_px
    for f in range(1, 8):
        ch.update(InputState(), 1 / 60, f)
        assert ch.jitter_px != j0
    ch.update(InputState(), 1 / 60, 8)
    assert ch.jitter_px == j0  # 8-frame cycle (Character.cpp:101)


def test_pitch_clamped():
    ch = Character()
    ch.update(InputState(mouse_dy=-1e6), 1 / 60, 0)
    assert ch.pitch == Character.PITCH_MIN
    ch.update(InputState(mouse_dy=1e6), 1 / 60, 1)
    assert ch.pitch == Character.PITCH_MAX


def test_velocity_drag_and_motion():
    ch = Character()
    p0 = ch.position.copy()
    ch.update(InputState(move_z=1.0), 1 / 60, 0)
    assert not np.allclose(ch.position, p0)
    v1 = np.linalg.norm(ch.velocity)
    ch.update(InputState(), 1 / 60, 1)  # no input: drag decays velocity
    assert np.linalg.norm(ch.velocity) < v1


def test_prev_matrices_lag_one_frame():
    ch = Character()
    ch.update(InputState(), 1 / 60, 0)
    vp0 = ch.unjittered_view_projection.copy()
    ch.update(InputState(move_x=1.0), 1 / 60, 1)
    np.testing.assert_array_equal(ch.prev_unjittered_view_projection, vp0)
