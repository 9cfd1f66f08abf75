"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) at
interpreter startup, so plain env vars are not enough — we must override via
``jax.config`` before any backend is initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests compare against float32 numpy oracles; keep MXU-style bf16 out of tests.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: model-sized test graphs take minutes to compile
# on CPU; repeated pytest runs hit the cache instead.
_cache = os.path.expanduser("~/.cache/lidal_tpu_xla_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Make the repo root importable regardless of pytest rootdir config.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
