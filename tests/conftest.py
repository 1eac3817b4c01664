"""Test config: run everything on CPU with 8 virtual devices.

This is the standard way to exercise jax sharding/pmap/shard_map logic
without a TPU pod (SURVEY.md §4).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT enough on hosts whose sitecustomize registers a
# remote-TPU PJRT plugin and then force-sets jax_platforms (observed:
# "axon,cpu" overriding JAX_PLATFORMS=cpu) - re-assert cpu via the config,
# which wins over any startup-time setting as long as no backend has been
# initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the world-gen / SDF / tracer programs are
# compile-heavy on CPU; cache across test runs.  The directory is keyed
# by the HOST CPU's feature set: XLA:CPU executables compiled on a
# machine with different features (e.g. AMX) load with a "could lead to
# SIGILL" warning and have segfaulted the suite mid-run when the repo
# cache migrates between driver hosts.
import hashlib


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


_CACHE = os.path.join("/tmp", f"rvgrt_jax_cache_cpu-{_cpu_fingerprint()}")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
