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

# Persistent compilation cache, host-local under /tmp: the suite is
# compile-heavy on CPU (a fully cold run takes hours; warm ~25 min).
# Two known hazards, both observed 2026-08-19 and both mitigated by the
# /tmp + host-fingerprint keying rather than the repo-shared .jax_cache:
# (a) XLA:CPU executables compiled on a DIFFERENT machine load with a
# "may SIGILL" cpu_aot_loader warning and can crash; (b) XLA:CPU
# executable deserialization segfaulted in several heavily-loaded runs
# (concurrent TPU probe processes on the same 1-CPU host) but reproduces
# in neither isolated module runs nor warm re-runs - a crashed run
# leaves a valid warm cache, so a rerun completes.  If the suite ever
# segfaults inside compilation_cache.get_executable_and_time, delete
# /tmp/rvgrt_jax_cache_cpu-* and rerun.
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
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
