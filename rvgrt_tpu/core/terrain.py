"""Terrain density function - the pure function that *is* the world.

Re-expresses the reference's ``Evaluate(x,y,z)`` (``TerrainGeneration.cuh:
284-356``, the live header version) as a vectorized jnp function: solid sea
floor below y=30, a 2D-simplex biome factor blending plains (amplitude 60)
against mountains (amplitude 400), a 7-octave surface fbm, and two cave
carvers (spaghetti tunnels + cavern regions).  A voxel is solid iff
``density > solid_threshold`` (0.7, ``CArray.cu:27``).

Determinism is the engine's checkpoint format: (config) -> identical world on
every device, every run (reference regenerates at startup, ``State.cpp:44-54``).
"""

from __future__ import annotations

import jax.numpy as jnp

from rvgrt_tpu.config import TerrainConfig
from rvgrt_tpu.core import noise

_F32 = jnp.float32


def evaluate_density(x, y, z, cfg: TerrainConfig = TerrainConfig()):
    """Density at (float) voxel coordinates; broadcasts over array inputs."""
    x = jnp.asarray(x, _F32)
    y = jnp.asarray(y, _F32)
    z = jnp.asarray(z, _F32)

    biome_factor = (noise.simplex2d(x * _F32(cfg.biome_frequency),
                                    z * _F32(cfg.biome_frequency))
                    + _F32(1.0)) * _F32(0.5)
    terrain_amplitude = _F32(cfg.plains_amplitude) + biome_factor * _F32(
        cfg.mountain_amplitude - cfg.plains_amplitude)

    density = _F32(cfg.ground_level) - y
    surface = noise.fbm3d(x, y, z, cfg.surface_octaves, cfg.surface_frequency,
                          cfg.surface_lacunarity, cfg.surface_persistence)
    density = density + surface * terrain_amplitude

    # Cave carving only applies where the point is already solid ground.
    cave_raw = noise.fbm3d(x + _F32(123.456), y, z, cfg.cave_octaves,
                           cfg.cave_frequency, cfg.surface_lacunarity,
                           cfg.surface_persistence)
    cave_norm = (cave_raw + _F32(1.0)) * _F32(0.5)
    is_spaghetti = jnp.abs(cave_raw) < _F32(cfg.spaghetti_threshold)

    cavern_region = (noise.simplex3d(x * _F32(cfg.cavern_region_freq),
                                     y * _F32(cfg.cavern_region_freq),
                                     z * _F32(cfg.cavern_region_freq))
                     + _F32(1.0)) * _F32(0.5)
    is_cavern = (cavern_region > _F32(0.65)) & (cave_norm < _F32(cfg.cavern_threshold))

    carve = (density > _F32(0.0)) & (is_spaghetti | is_cavern)
    density = jnp.where(carve, density - _F32(cfg.cave_carve_value), density)

    # Hard sea floor overrides everything below water_floor_y.
    return jnp.where(y <= _F32(cfg.water_floor_y), _F32(100.0), density)


def is_solid_density(x, y, z, cfg: TerrainConfig = TerrainConfig(),
                     threshold: float = 0.7):
    return evaluate_density(x, y, z, cfg) > _F32(threshold)
