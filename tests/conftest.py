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

# NO persistent compilation cache for the CPU suite: XLA:CPU executable
# deserialization segfaults non-deterministically in this jaxlib - four
# full-suite runs on 2026-08-19 died inside
# compilation_cache.get_executable_and_time / backend_compile_and_load,
# including with a FRESH cache directory written and read back within
# one run (so not stale/foreign/truncated entries; entries compiled on
# other hosts additionally warn "may SIGILL" via cpu_aot_loader).  Cold
# compiles cost a few extra minutes per run; a segfaulting suite costs
# everything.  The TPU bench/probe paths keep their cache (the remote
# compile service does the deserialization there).
jax.config.update("jax_enable_compilation_cache", False)
