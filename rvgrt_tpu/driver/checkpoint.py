"""Checkpoint / resume.

The reference has none (SURVEY.md §5.4): the world regenerates
deterministically from the pure noise function at every launch
(``State.cpp:44-54``).  Determinism remains our primary "checkpoint" -
(config, seed) -> identical world - and this module adds what the reference
lacked: optional serialization of the world arrays (so big worlds skip the
rebuild), the evolving GI radiance cache (so progressive lighting survives a
restart), engine frame counters, and the learned upscaler parameters.

Format: a single .npz per checkpoint (+ pickle for upscaler pytrees),
written atomically (tmp + rename).
"""

from __future__ import annotations

import json
import os
import pickle
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from rvgrt_tpu.config import EngineConfig

FORMAT_VERSION = 1


def _atomic_write(path: str, write_fn):
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            write_fn(f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def save_world(path: str, world, ecfg: EngineConfig,
               frame_count: int = 0, gi_offset: int = 0) -> None:
    """Serialize the device-resident world + engine counters."""
    meta = dict(
        version=FORMAT_VERSION,
        shift_x=ecfg.world.shift_x,
        shift_y=ecfg.world.shift_y,
        shift_z=ecfg.world.shift_z,
        frame_count=frame_count,
        gi_offset=gi_offset,
    )

    def write(f):
        np.savez_compressed(
            f,
            meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
            bits=np.asarray(world.bits),
            sdf=np.asarray(world.sdf),
            gi=np.asarray(world.gi),
            atlas=np.asarray(world.atlas),
        )

    _atomic_write(path, write)


def load_world(path: str, ecfg: EngineConfig):
    """Load a world checkpoint; validates dimensions against the config.

    Returns (World, frame_count, gi_offset).
    """
    from rvgrt_tpu.driver.engine import World

    with np.load(path) as d:
        meta = json.loads(bytes(d["meta"]).decode())
        assert meta["version"] == FORMAT_VERSION, meta
        for k in ("shift_x", "shift_y", "shift_z"):
            assert meta[k] == getattr(ecfg.world, k), (
                f"checkpoint {k}={meta[k]} != config {getattr(ecfg.world, k)}")
        from rvgrt_tpu.trace import wavefront
        from rvgrt_tpu.world import gi_grid, voxel_grid

        sdf = jnp.asarray(d["sdf"])
        bits = jnp.asarray(d["bits"])
        world = World(
            bits=bits,
            sdf=sdf,
            gi=jnp.asarray(d["gi"]),
            atlas=jnp.asarray(d["atlas"]),
            # derived, not persisted; only the fused cone path consumes it
            gi_occ=(jax.jit(gi_grid.build_occlusion,
                            static_argnums=1)(sdf, ecfg.world)
                    if ecfg.render.gi_fused_cone else None),
            sky_y=jax.jit(voxel_grid.sky_limit,
                          static_argnums=1)(bits, ecfg.world),
            trace_table=jax.jit(wavefront.make_trace_table,
                                static_argnums=2)(bits, sdf, ecfg.world),
        )
        return world, int(meta["frame_count"]), int(meta["gi_offset"])


def save_params(path: str, params) -> None:
    """Upscaler (or any pytree) parameters."""
    host = jax.device_get(params)
    _atomic_write(path, lambda f: pickle.dump(host, f))


def load_params(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
