"""Persistent XLA compilation cache.

The fused rasterizer + full-step programs take minutes to compile; caching
them on disk makes every subsequent process start instantly. Call
enable() early (before the first jit execution).
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get(
        "SELFCORR_JIT_CACHE", os.path.expanduser("~/.cache/selfcorr_jit"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        print(f"[jit_cache] unavailable: {e}")
