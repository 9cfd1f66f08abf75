"""Per-conv cost at model shapes, on-device scan timing."""

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


def make_nbr(n, k, rows_per_x):
    base = np.arange(n)
    cols = []
    for kk in range(k):
        xoff = kk // (k // 3) - 1 if k == 27 else kk // 4
        shift = xoff * rows_per_x + (kk % 9) - 4
        idx = base + shift + rng.integers(-40, 40, n)
        bad = (idx < 0) | (idx >= n) | (rng.random(n) < 0.12)
        idx = np.where(bad, n, idx)
        idx.sort()
        cols.append(idx)
    return np.stack(cols, 1).astype(np.int32)


for n, cin, cout, label in [
    (131072, 4, 32, "stem1"),
    (131072, 32, 32, "stem2"),
    (131072, 96, 96, "dec-L0"),
    (49152, 64, 64, "enc-L1"),
    (49152, 96, 96, "dec-L1"),
    (16384, 128, 128, "enc-L2"),
    (6144, 256, 256, "enc-L3"),
    (2048, 256, 256, "enc-L4"),
]:
    nbr = make_nbr(n, 27, max(300, n // 40))
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    w = (rng.standard_normal((27, cin, cout)) * 0.05).astype(np.float32)

    def fn(i, f, w, nb):
        return subm_conv_pallas(f + (i & 1).astype(f.dtype) * 1e-30, w, nb)

    ms = device_time(fn, (feats, w, nbr), iters=20)
    print(f"subm {label:8s} n={n:6d} c{cin:3d}->c{cout:3d}  {ms:7.2f} ms", flush=True)
