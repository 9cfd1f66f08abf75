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

    # Multi-host bring-up (reference: single-host NCCL only, train.py:26-28;
    # TPU pods span hosts).  Opt-in via env because jax.distributed.initialize
    # blocks waiting for all processes: set LIDAL_TPU_DISTRIBUTED=1 on every
    # host (coordinator/process env comes from the TPU runtime or the usual
    # JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES variables).
    if os.environ.get("LIDAL_TPU_DISTRIBUTED") == "1":
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized, or single-process run
            print(f"jax.distributed.initialize skipped: {e}")

    cache = cache_dir or os.environ.get(
        "LIDAL_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/lidal_tpu_xla")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
