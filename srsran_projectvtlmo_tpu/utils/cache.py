"""Persistent-compilation-cache bring-up.

The target runtime's sitecustomize imports jax at interpreter startup, so
JAX_COMPILATION_CACHE_DIR set by a script's `os.environ.setdefault` arrives
AFTER jax snapshotted its config and the cache silently stays disabled
("get_executable_and_time: cache is disabled/not initialized").  Calling
`enable_compilation_cache()` updates the live config instead — every remote
compile costs 30-60 s of tunnel round trip regardless of its XLA compile
time, so the min-compile-time threshold is set to 0 (cache everything).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at the repo cache dir."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return cache_dir
