"""Persistent compilation cache setup.

XLA compiles through a remote-compile service in some TPU environments,
making first-compiles very slow (minutes for large fused programs).  The
JAX persistent compilation cache makes repeat runs (benches, apps, tests)
pay that cost once per program across processes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "VOXELENGINE_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
