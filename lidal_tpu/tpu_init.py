"""Process-level JAX configuration for this framework.

Call :func:`setup` once at entry (CLI/bench/driver).  Enables the persistent
compilation cache (first compile of the big plan-build/model graphs takes
minutes via the tunneled backend; the cache makes later processes start hot) and
applies safe defaults.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "LIDAL_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/lidal_tpu_xla")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
