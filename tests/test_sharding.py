"""Pixel-row-sharded rendering + distributed GI update vs the single-device
pipeline, on the 8-virtual-CPU-device mesh (mirrors test_volume.py's
PSNR-gate structure; SURVEY.md §4's multi-chip test recipe).

These are the round-2 scaling workhorses (``parallel/sharding.py``):
``render_frame_sharded`` shards rows over a 1-D ``rays`` mesh with the world
replicated; ``update_gi_sharded`` splits the round-robin GI window across
devices.  Both must reproduce single-device outputs (slab boundaries only
recompute a half-res halo, they exchange nothing - so the images should
match to float-op order).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvgrt_tpu.config import EngineConfig, RenderConfig, WorldConfig
from rvgrt_tpu.driver.engine import camera_arrays
from rvgrt_tpu.gi import update as gi_update
from rvgrt_tpu.parallel import sharding
from rvgrt_tpu.render import pipeline
from rvgrt_tpu.scene.camera import Camera
from rvgrt_tpu.world import atlas as atlas_mod, gi_grid, sdf as sdf_mod
from rvgrt_tpu.world import voxel_grid as vg


@pytest.fixture(scope="module")
def world64():
    cfg = WorldConfig().with_cube(6)
    bits = vg.generate(cfg)
    coarse = vg.coarse_occupancy(bits, cfg)
    sdf = sdf_mod.build_sdf(coarse, cfg)
    atlas = atlas_mod.procedural_atlas()
    return cfg, bits, sdf, atlas


def _camera(cfg):
    pos = np.array([cfg.size_x - 1.0, cfg.size_y * 0.7, cfg.size_z * 0.77],
                   np.float32)
    fwd = np.array([-0.85, -0.5, 0.2], np.float32)
    fwd /= np.linalg.norm(fwd)
    wup = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, wup)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    up /= np.linalg.norm(up)
    return camera_arrays(Camera(pos=pos, forward=fwd,
                                right=right.astype(np.float32),
                                up=up.astype(np.float32)), time_s=0.0)


@pytest.mark.full
def test_render_frame_sharded_matches_single_device(world64):
    cfg, bits, sdf, atlas = world64
    ecfg = EngineConfig(world=cfg,
                        render=dataclasses.replace(RenderConfig(),
                                                   width=32, height=16))
    gi = gi_grid.zeros(cfg)
    cam = _camera(cfg)

    single = pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                   include_gi=True)

    mesh = sharding.make_mesh(8)
    b, s, g, a = sharding.replicate(mesh, bits, sdf, gi, atlas)
    shard = sharding.render_frame_sharded(b, s, g, a, cam, ecfg, mesh,
                                          include_gi=True)

    sa = np.asarray(single.color)
    sb = np.asarray(shard.color)
    assert sb.shape == sa.shape
    assert np.isfinite(sb).all()
    mse = float(np.mean((sa - sb) ** 2))
    psnr = 99.0 if mse == 0 else 10.0 * math.log10(1.0 / mse)
    frac_off = (np.abs(sa - sb).max(axis=-1) > 0.02).mean()
    assert psnr > 40.0, (psnr, frac_off)
    assert frac_off < 0.01, (psnr, frac_off)
    # the G-buffer outputs ride the same hit geometry
    for name in ("motion", "depth", "half_dist", "half_shadow"):
        va = np.asarray(getattr(single, name))
        vb = np.asarray(getattr(shard, name))
        assert vb.shape == va.shape
        assert np.isfinite(vb).all(), name
        ok = np.isclose(va, vb, atol=2e-2)
        assert ok.mean() > 0.99, (name, ok.mean())


@pytest.mark.full
def test_sharded_decoupled_shadow_seam(world64):
    """Sharded decoupled soft-shadow sites (the bench tier's
    ``shadow_site_divisor > 0``) vs the full frame: site phase is globally
    consistent (asserted in render_slab: post-rate slab rows % ssd == 0),
    and the only divergence is the ``_expand_even`` bottom-edge clamp on
    each slab's last ssd-1 rows - image-gated here (ADVICE r4: no test
    covered shadow_site_divisor>0 with sharding)."""
    from rvgrt_tpu.config import LightingConfig

    cfg, bits, sdf, atlas = world64
    ecfg = EngineConfig(
        world=cfg,
        render=dataclasses.replace(RenderConfig(), width=32, height=64,
                                   shadow_site_divisor=4),
        lighting=dataclasses.replace(LightingConfig(), soft_shadows=True,
                                     soft_shadow_stride=2))
    gi = gi_grid.zeros(cfg)
    cam = _camera(cfg)

    single = pipeline.render_frame(bits, sdf, gi, atlas, cam, ecfg,
                                   include_gi=False)
    mesh = sharding.make_mesh(8)
    b, s, g, a = sharding.replicate(mesh, bits, sdf, gi, atlas)
    shard = sharding.render_frame_sharded(b, s, g, a, cam, ecfg, mesh,
                                          include_gi=False)
    sa = np.asarray(single.color)
    sb = np.asarray(shard.color)
    assert sb.shape == sa.shape and np.isfinite(sb).all()
    mse = float(np.mean((sa - sb) ** 2))
    psnr = 99.0 if mse == 0 else 10.0 * math.log10(1.0 / mse)
    frac_off = (np.abs(sa - sb).max(axis=-1) > 0.02).mean()
    assert psnr > 40.0, (psnr, frac_off)
    assert frac_off < 0.02, (psnr, frac_off)
    # rows away from slab seams must match exactly (site phase identical):
    # only the last ssd-1 rows of each 8-row slab may clamp differently
    seam = np.zeros(64, bool)
    for k in range(1, 8):
        seam[8 * k - 3:8 * k] = True
    interior = np.abs(sa[~seam] - sb[~seam]).max()
    assert interior < 1e-5, interior


def test_temporal_upscale_sharded_matches_single_device():
    """Display-row-sharded temporal upscale == full-frame accumulator, two
    closed-loop frames on the 8-virtual-CPU mesh (the packed state is the
    wire format both paths quantize through, so agreement is float-op
    order only)."""
    from rvgrt_tpu.upscale import temporal

    rng = np.random.default_rng(7)
    h, w = 32, 40
    mesh = sharding.make_mesh(8)

    state = temporal.TemporalState(
        history=jnp.asarray(rng.random((3 * h, 3 * w, 3)), jnp.float32),
        conf=jnp.asarray(rng.random((3 * h, 3 * w)) * 8, jnp.float32))
    packed = temporal.pack_state(state)
    packed_sh = packed
    for i in range(2):
        color = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        motion = jnp.asarray(rng.normal(0, 0.02, (h, w, 2)), jnp.float32)
        depth = jnp.ones((h, w), jnp.float32)
        jit = jnp.asarray([(0.3 - i) / w, (0.2 * i - 0.4) / h], jnp.float32)

        out_full, state = temporal.temporal_upscale(color, motion, depth,
                                                    jit, state)
        out_sh, packed_sh = sharding.temporal_upscale_sharded(
            color, motion, jit, packed_sh, mesh)

        a = np.asarray(out_full)
        b = np.asarray(out_sh)
        assert b.shape == a.shape
        assert np.abs(a - b).max() < 1e-5, np.abs(a - b).max()
        # the packed states stay bit-identical (both paths quantize the
        # SAME f32 output), so the loops cannot drift apart
        assert (np.asarray(packed_sh)
                == np.asarray(temporal.pack_state(state))).all()


def test_temporal_upscale_sharded_true_taps_matches_full():
    """Slab warp_taps='bilinear' (the XLA twin of the Pallas kernel the
    production mesh path runs) == full-frame temporal_upscale with the
    true 4-tap warp, closed loop on the 8-virtual-CPU mesh."""
    from rvgrt_tpu.upscale import temporal

    rng = np.random.default_rng(11)
    h, w = 32, 40
    mesh = sharding.make_mesh(8)

    state = temporal.TemporalState(
        history=jnp.asarray(rng.random((3 * h, 3 * w, 3)), jnp.float32),
        conf=jnp.asarray(rng.random((3 * h, 3 * w)) * 8, jnp.float32))
    packed_sh = temporal.pack_state(state)
    for i in range(2):
        color = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        motion = jnp.asarray(rng.normal(0, 0.02, (h, w, 2)), jnp.float32)
        depth = jnp.ones((h, w), jnp.float32)
        jit = jnp.asarray([(0.3 - i) / w, (0.2 * i - 0.4) / h], jnp.float32)

        out_full, state = temporal.temporal_upscale(
            color, motion, depth, jit, state, warp_taps="bilinear")
        out_sh, packed_sh = sharding.temporal_upscale_sharded(
            color, motion, jit, packed_sh, mesh, warp_taps="bilinear")

        a = np.asarray(out_full)
        b = np.asarray(out_sh)
        # the two graph shapes (full-frame vs dynamic-slice slab) let the
        # compiler contract FMAs differently, so f32 outputs differ in the
        # last ulp and the truncating RGBA8 quantizer can flip a byte at
        # k/255 boundaries; closed-loop that compounds to ~1 quantization
        # step (1/255) of output difference.  The production loop runs ONE
        # path consistently (no cross-path drift exists to bound);
        # bit-identity is gated on the bilinear_shift pair above where the
        # graphs are identical.
        assert np.abs(a - b).max() <= 1.5 / 255, np.abs(a - b).max()
        pa = np.asarray(packed_sh)
        pb = np.asarray(temporal.pack_state(state))
        for sh in (0, 8, 16, 24):
            da = (pa >> sh) & 0xFF
            db = (pb >> sh) & 0xFF
            assert np.abs(da.astype(np.int32)
                          - db.astype(np.int32)).max() <= 2


@pytest.mark.full
def test_temporal_upscale_sharded_pallas_taps_matches_full():
    """Slab warp_taps='pallas' (the ACTUAL production mesh kernel, run in
    Pallas interpret mode on CPU) == full-frame temporal_upscale with the
    same kernel, on the 8-virtual-CPU mesh.  Guards the slab-shaped
    output-grid contract of ops/warp_kernels.warp_packed_bilinear (the
    kernel used to derive its grid from the full display and broke for
    any mesh with >1 row shard - ADVICE r3 high)."""
    from rvgrt_tpu.upscale import temporal

    rng = np.random.default_rng(13)
    # display 96x384: wide enough for the kernel's (WR=40, WC=384)
    # window, width a multiple of 128 lanes
    h, w = 32, 128
    mesh = sharding.make_mesh(8)

    state = temporal.TemporalState(
        history=jnp.asarray(rng.random((3 * h, 3 * w, 3)), jnp.float32),
        conf=jnp.asarray(rng.random((3 * h, 3 * w)) * 8, jnp.float32))
    packed_sh = temporal.pack_state(state)
    for i in range(2):
        color = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        motion = jnp.asarray(rng.normal(0, 0.02, (h, w, 2)), jnp.float32)
        depth = jnp.ones((h, w), jnp.float32)
        jit = jnp.asarray([(0.3 - i) / w, (0.2 * i - 0.4) / h], jnp.float32)

        out_full, state = temporal.temporal_upscale(
            color, motion, depth, jit, state, warp_taps="pallas")
        out_sh, packed_sh = sharding.temporal_upscale_sharded(
            color, motion, jit, packed_sh, mesh, warp_taps="pallas")

        a = np.asarray(out_full)
        b = np.asarray(out_sh)
        assert b.shape == a.shape
        # same FMA-contraction caveat as the 'bilinear' twin gate above
        assert np.abs(a - b).max() <= 1.5 / 255, np.abs(a - b).max()


@pytest.mark.full
def test_update_gi_sharded_matches_single_device(world64):
    cfg, bits, sdf, atlas = world64
    # window + offset must respect the advance_offset contract (no wrap:
    # offset + n <= gi_num_cells = 4096 at 64^3)
    ecfg = EngineConfig(world=cfg, gi_rays_per_frame=1024)
    gi0 = gi_update.init_gi(bits, sdf, ecfg)

    frame = jnp.uint32(3)
    offset = jnp.int32(2048)
    single = gi_update.update_gi(gi0, bits, sdf, atlas, ecfg, frame, offset)

    mesh = sharding.make_mesh(8)
    g, b, s, a = sharding.replicate(mesh, gi0, bits, sdf, atlas)
    shard = sharding.update_gi_sharded(g, b, s, a, ecfg, frame, offset, mesh)

    sa = np.asarray(single)
    sb = np.asarray(shard)
    assert sb.shape == sa.shape
    # the RNG is seeded per cell (idx + frame), so the sharded window split
    # must reproduce the single-device update bit-exactly on the packed
    # RGBA8 grid
    mismatch = (sa != sb).mean()
    assert mismatch == 0.0, mismatch

    # and it actually updated something inside the window
    assert (sa != np.asarray(gi0)).any()
