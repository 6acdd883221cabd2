"""Persistent XLA compilation cache.

TPU compilation of the integrator is expensive (minutes through a
remote-compile path); the persistent cache makes every process after the
first start in under a second. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "RAYTRACE2_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if jax.default_backend() == "cpu":
        # CPU compiles are fast, and CPU AOT cache entries embed host CPU
        # feature lists that spew mismatch warnings across heterogeneous
        # runs — not worth caching.
        return
    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
