"""Clean on-device comparison: XLA bitonic merge vs Pallas merge kernel."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops import merge_lookup as ml
from tools.bench_suite import device_time

rng = np.random.default_rng(0)
n = 131072
tl = np.sort(rng.choice(1 << 20, n, replace=False)).astype(np.int32)
th = (tl >> 6).astype(np.int32)
g = 13
qh = np.stack([th] * g).astype(np.int32)
ql = np.stack([np.minimum(tl + d - 6, (1 << 29)) for d in range(g)]).astype(np.int32)


def bench(name, use_pallas):
    def fn(i, th, tl, qh, ql):
        ml.USE_PALLAS = use_pallas  # read at trace time inside device_time's jit
        s = i & 1
        return ml.lookup_sorted_many(th + s, tl, qh + s, ql, unique_queries=True)

    ms = device_time(fn, (th, tl, qh, ql), iters=30)
    print(f"{name:40s} {ms:8.2f} ms", flush=True)


bench("XLA bitonic 13-stream lookup", False)
bench("Pallas merge 13-stream lookup", True)
ml.USE_PALLAS = None
