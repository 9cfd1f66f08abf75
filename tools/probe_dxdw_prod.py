"""Production-size timing for the combined backward kernel vs its parts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
import lidal_tpu.ops.pallas_conv as pconv
from tools.bench_suite import device_time

rng = np.random.default_rng(0)
N = 524288
K = 27
C = 96


def make_nbr(n, k, rows_per_x=1200):
    base = np.arange(n)
    cols = []
    for kk in range(k):
        xoff = kk // 9 - 1
        shift = xoff * rows_per_x + (kk % 9) - 4
        idx = base + shift + rng.integers(-40, 40, n)
        bad = (idx < 0) | (idx >= n) | (rng.random(n) < 0.12)
        idx = np.where(bad, n, idx)
        idx.sort()
        cols.append(idx)
    return np.stack(cols, 1).astype(np.int32)


nbr = jnp.asarray(make_nbr(N, K))
src = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
w2 = jnp.asarray(rng.standard_normal((K, C, C)).astype(np.float32) * 0.1)
f = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))


def run_fwd(i, src, w2, nbr):
    return pconv.subm_conv_pallas(src + (i & 1) * 1e-6, w2, nbr, groups=3)[:2, :2]


print(
    "subm_conv (fwd) c%d 512k rows: %.2f ms" % (C, device_time(run_fwd, (src, w2, nbr), iters=20)),
    flush=True,
)


def run(i, src, w2, nbr, f):
    dx, dwg = pconv.conv_dx_dw_pallas(src + (i & 1) * 1e-6, w2, nbr, f, groups=3)
    return dx[:2, :2], dwg[:1, :1, :1]


print(
    "conv_dx_dw (bwd) c%d 512k rows: %.2f ms" % (C, device_time(run, (src, w2, nbr, f), iters=20)),
    flush=True,
)
