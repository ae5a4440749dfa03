"""Small JAX runtime helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    On this project's TPU setup, compilation goes through a remote helper
    whose queue serializes jobs; the on-disk cache makes warm starts skip
    the round trip entirely. Safe on CPU too.
    """
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/jax_comp"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options
