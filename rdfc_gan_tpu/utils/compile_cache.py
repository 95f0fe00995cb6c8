"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile; enabling jax's persistent
cache makes every driver/CLI rerun start in seconds. Called by the CLI
drivers and bench before any jit executes.
"""

from __future__ import annotations

import os


def enable_compile_cache(directory: str | None = None):
    import jax

    if directory is None:
        directory = os.environ.get(
            "RDFC_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    return directory
