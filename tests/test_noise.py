"""Golden tests: vectorized jnp noise vs independent scalar implementation.

The noise defines the world, so these are exact-match (hashes) and
near-exact (float32 noise, tolerance for fma/reassociation differences).
"""

import numpy as np
import pytest

from rvgrt_tpu.core import noise, terrain
from tests.golden import scalar_noise

RNG = np.random.default_rng(1234)


def test_hash3_matches_scalar():
    pts = RNG.integers(-5000, 5000, size=(192, 3)).astype(np.int32)
    got = np.asarray(noise.hash3(pts[:, 0], pts[:, 1], pts[:, 2]))
    want = np.array([scalar_noise.hash3(int(x), int(y), int(z))
                     for x, y, z in pts], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hash2_matches_scalar():
    pts = RNG.integers(-5000, 5000, size=(256, 2)).astype(np.int32)
    got = np.asarray(noise.hash2(pts[:, 0], pts[:, 1]))
    want = np.array([scalar_noise.hash2(int(x), int(y)) for x, y in pts],
                    dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hash3_known_values_stable():
    # Bit-stability snapshot: these values must never change (they define
    # the world).  Computed from the scalar model.
    cases = [(0, 0, 0), (1, 2, 3), (-1, -2, -3), (4095, 511, 4095)]
    got = np.asarray(noise.hash3(
        np.array([c[0] for c in cases], np.int32),
        np.array([c[1] for c in cases], np.int32),
        np.array([c[2] for c in cases], np.int32)))
    want = np.array([scalar_noise.hash3(*c) for c in cases], np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [128])
def test_simplex2d_matches_scalar(n):
    pts = RNG.uniform(-2000, 2000, size=(n, 2)).astype(np.float32)
    got = np.asarray(noise.simplex2d(pts[:, 0], pts[:, 1]))
    want = np.array([scalar_noise.simplex2d(x, y) for x, y in pts], np.float32)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("n", [128])
def test_simplex3d_matches_scalar(n):
    pts = RNG.uniform(-2000, 2000, size=(n, 3)).astype(np.float32)
    got = np.asarray(noise.simplex3d(pts[:, 0], pts[:, 1], pts[:, 2]))
    want = np.array([scalar_noise.simplex3d(x, y, z) for x, y, z in pts],
                    np.float32)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_simplex3d_range():
    pts = RNG.uniform(-100, 100, size=(4096, 3)).astype(np.float32)
    vals = np.asarray(noise.simplex3d(pts[:, 0], pts[:, 1], pts[:, 2]))
    assert np.all(np.abs(vals) < 1.5)
    assert vals.std() > 0.05  # actually produces variation


def test_fbm3d_matches_scalar():
    pts = RNG.uniform(0, 4096, size=(64, 3)).astype(np.float32)
    got = np.asarray(noise.fbm3d(pts[:, 0], pts[:, 1], pts[:, 2],
                                 7, 0.002, 2.1, 0.45))
    want = np.array([scalar_noise.fbm3d(x, y, z, 7, 0.002, 2.1, 0.45)
                     for x, y, z in pts], np.float32)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_evaluate_density_matches_scalar():
    pts = np.stack([
        RNG.uniform(0, 4096, 96),
        RNG.uniform(0, 512, 96),
        RNG.uniform(0, 4096, 96),
    ], axis=1).astype(np.float32)
    got = np.asarray(terrain.evaluate_density(pts[:, 0], pts[:, 1], pts[:, 2]))
    want = np.array([scalar_noise.evaluate_density(x, y, z)
                     for x, y, z in pts], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_evaluate_density_sea_floor():
    d = np.asarray(terrain.evaluate_density(
        np.float32([10.0, 20.0]), np.float32([5.0, 30.0]), np.float32([7.0, 7.0])))
    np.testing.assert_array_equal(d, [100.0, 100.0])


def test_solid_classification_matches_scalar():
    # The actual bit that goes in the world: density > 0.7
    pts = np.stack([
        RNG.uniform(0, 256, 160),
        RNG.uniform(25, 200, 160),
        RNG.uniform(0, 256, 160),
    ], axis=1).astype(np.float32)
    got = np.asarray(terrain.evaluate_density(pts[:, 0], pts[:, 1], pts[:, 2])) > 0.7
    want = np.array([scalar_noise.evaluate_density(x, y, z) > 0.7
                     for x, y, z in pts])
    # Allow a tiny disagreement rate only for densities within float noise of
    # the threshold.
    disagree = got != want
    if disagree.any():
        dens = np.array([scalar_noise.evaluate_density(x, y, z)
                         for x, y, z in pts[disagree]])
        assert np.all(np.abs(dens - 0.7) < 1e-3), (
            f"solid bits disagree away from threshold: {dens}")
