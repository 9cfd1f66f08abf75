"""scatter8_pallas (gather8's banded transposed backward) vs the XLA
scatter-add, at SPVCNN production shapes (tri4: n=8192 c=256; tri2: n=65536
c=128; m = B*cap0 = 524288), plus correctness vs the XLA path on-device."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.pallas_gather8 import scatter8_pallas
from tools.bench_suite import device_time

rng = np.random.default_rng(0)


def tri_like_nbr(m, n, k=8):
    """Near-sorted columns like a flattened tri map: ancestors are blockwise
    monotone with local interleaving; each column perturbs the base walk."""
    base = np.linspace(0, n - 1, m).astype(np.int64)
    cols = []
    for j in range(k):
        idx = base + rng.integers(-6, 7, m)
        bad = (idx < 0) | (idx >= n) | (rng.random(m) < 0.1)
        cols.append(np.where(bad, n, idx))
    return np.stack(cols, 1).astype(np.int32)


def xla_scatter(dy, nbr, w8, n):
    contrib = w8[:, :, None].astype(dy.dtype) * dy[:, None, :]
    return jnp.zeros((n, dy.shape[-1]), dy.dtype).at[nbr].add(contrib, mode="drop")


for n, m, c, label in [(8192, 524288, 256, "tri4"), (65536, 524288, 128, "tri2")]:
    nbr = tri_like_nbr(m, n)
    dy = rng.standard_normal((m, c)).astype(np.float32)
    w8 = rng.random((m, 8)).astype(np.float32)

    # correctness (bf16 staging tolerance)
    got = np.asarray(scatter8_pallas(jnp.asarray(dy), jnp.asarray(nbr), jnp.asarray(w8), n))
    want = np.asarray(xla_scatter(jnp.asarray(dy), jnp.asarray(nbr), jnp.asarray(w8), n))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"{label}: rel err vs XLA f32 = {err:.2e}", flush=True)
    assert err < 2e-2, err

    def pl_fn(i, dy, nbr, w8):
        return scatter8_pallas(dy + (i & 1).astype(dy.dtype) * 1e-30, nbr, w8, n)

    def xla_fn(i, dy, nbr, w8):
        return xla_scatter(dy + (i & 1).astype(dy.dtype) * 1e-30, nbr, w8, n)

    ms_pl = device_time(pl_fn, (dy, nbr, w8), iters=10)
    ms_xla = device_time(xla_fn, (dy, nbr, w8), iters=10)
    print(
        f"scatter8 {label}: n={n} m={m} c={c}  pallas {ms_pl:7.2f} ms   "
        f"xla-scatter {ms_xla:7.2f} ms   ({ms_xla / ms_pl:.1f}x)",
        flush=True,
    )
