"""Utility helpers (runtime configuration, profiling)."""

from raytrace2_tpu.utils.cache import enable_compilation_cache  # noqa: F401
