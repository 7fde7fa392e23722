"""Persistent XLA compilation cache.

The fused rasterizer + full-step programs take minutes to compile; caching
them on disk makes every subsequent process start instantly. Call
enable() early (before the first jit execution).

The cache directory is keyed by (backend, host-CPU fingerprint): XLA:CPU
AOT executables embed the COMPILING machine's features, and loading an
entry produced on a different host (e.g. a remote-compile service or a
driver machine with AMX-era CPUs) SIGILL/aborts — observed in this
environment as `cpu_aot_loader.cc` feature-mismatch errors followed by
`Fatal Python error: Aborted`.
"""
from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable(cache_dir: str | None = None) -> None:
    import jax

    base = cache_dir or os.environ.get(
        "SELFCORR_JIT_CACHE", os.path.expanduser("~/.cache/selfcorr_jit"))
    # NOTE: read the configured platform WITHOUT jax.default_backend() —
    # that would initialize a backend before entry points can force one
    # (--platform / dryrun CPU forcing)
    plat = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS", "") or "default"
    backend = plat.split(",")[0]
    path = os.path.join(base, f"{backend}-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        print(f"[jit_cache] unavailable: {e}")
