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

# NO persistent compilation cache for the CPU suite (RVGRT_TEST_CACHE=1
# re-enables a host-keyed /tmp cache at your own risk): XLA:CPU
# executable DESERIALIZATION segfaults in this jaxlib - six full-suite
# runs on 2026-08-19 died inside compilation_cache.get_executable_and_
# time / backend_compile_and_load at varying tests (single- and multi-
# device programs, fresh and warm cache directories, loaded and idle
# host), while every cache-less module run stayed green.  Cold compiles
# make a full run slow (~1-2.5 h on a 1-CPU host; modules are fine);
# a segfaulting suite is worse.  The TPU bench/probe paths keep their
# cache - the remote compile service deserializes there, not jaxlib.
if os.environ.get("RVGRT_TEST_CACHE", "0") == "1":
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

        return hashlib.sha1(
            platform.processor().encode()).hexdigest()[:10]

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join("/tmp", f"rvgrt_jax_cache_cpu-{_cpu_fingerprint()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
else:
    jax.config.update("jax_enable_compilation_cache", False)


# Free compiled executables between test modules: full-suite runs (only -
# every module-level run is green) segfault inside the XLA:CPU compiler
# after ~50 tests of accumulated process state, with and without the
# persistent cache, at varying tests.  Hundreds of live multi-device CPU
# executables exhaust some process resource (mapping count is the prime
# suspect); clearing jax's in-memory caches per module resets it at the
# cost of some recompilation.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
