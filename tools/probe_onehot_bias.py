"""A/B probe: one-hot build with per-tap subtract vs block-biased iota hoist."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.pallas_conv import subm_conv_pallas
from tools.bench_suite import device_time

rng = np.random.default_rng(0)
N = 524288  # B=4 x 131072 rows
K = 27
CIN = COUT = 96


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
feats = jnp.asarray(rng.standard_normal((N, CIN)).astype(np.float32))
w = jnp.asarray(rng.standard_normal((K, CIN, COUT)).astype(np.float32) * 0.1)

# band sanity
from lidal_tpu.ops.pallas_conv import band_bounds

lo, nb = band_bounds(nbr, N, 3)
print("mean blocks/(tile,group):", float(jnp.mean(nb)), flush=True)


def run(i, feats, w, nbr):
    return subm_conv_pallas(feats + (i & 1) * 1e-6, w, nbr, groups=3)[:2, :2]


print(
    "subm_conv_pallas c%d, %dk rows: %.2f ms"
    % (CIN, N // 1024, device_time(run, (feats, w, nbr), iters=20)),
    flush=True,
)
