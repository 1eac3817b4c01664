"""rvgrt_tpu: TPU-native voxel ray tracer (RVGRT rebuilt for JAX/XLA).

Package import enables JAX's persistent compilation cache (repo-local
``.jax_cache/``) unless the caller already configured one or opted out via
``RVGRT_NO_COMPILE_CACHE=1``.  Rationale: this framework's programs compile
through a remote compile service on the tunneled TPU (9-60 s per distinct
program, SKILL.md); a cold world build pays minutes of pure compile latency
without the cache (measured: stage1 SDF build 112 s cold vs ~2 s warm).
"""

import os as _os


def _enable_compile_cache() -> None:
    if _os.environ.get("RVGRT_NO_COMPILE_CACHE") == "1":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # caller already chose a cache dir
    cache = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


_enable_compile_cache()
