"""Focused SPVCNN e2e probe (bench section 3 alone) for A/B runs.

Usage: ``python tools/probe_spvcnn_e2e.py`` — prints pts/s once.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> None:
    from lidal_tpu.tpu_init import setup

    setup()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xyz, sig, valid = bench._frame_stack(rng, 4)
    frames = (jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid))
    pts = bench._bench_spvcnn(rng, 4, frames)
    print(f"spvcnn_points_per_sec {pts:.1f}")


if __name__ == "__main__":
    main()
