"""Bisect the Mosaic compile hang in conv_dx_dw_pallas: small shapes, timed compiles."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
import lidal_tpu.ops.pallas_conv as pconv

rng = np.random.default_rng(0)


def make_nbr(n, m, k, density=0.8):
    nbr = np.full((m, k), n, np.int32)
    for j in range(k):
        cnt = int(m * density)
        rows = np.sort(rng.choice(m, size=cnt, replace=False))
        vals = np.sort(rng.choice(n, size=min(cnt, n), replace=False))
        nbr[rows[: len(vals)], j] = vals
    return nbr


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # force completion via scalar pulls
    for leaf in jax.tree_util.tree_leaves(out):
        float(jnp.asarray(leaf).ravel()[0])
    print(f"{name:40s} compile+run {time.perf_counter() - t0:7.1f} s", flush=True)


for label, (n, m, c, k, groups) in [
    ("tiny 512x512 c8 k8 g2", (512, 512, 8, 8, 2)),
    ("tiny 512x512 c8 k27 g3", (512, 512, 8, 27, 3)),
    ("small 4096 c32 k27 g3", (4096, 4096, 32, 27, 3)),
    ("mid 32768 c96 k27 g3", (32768, 32768, 96, 27, 3)),
]:
    nbr = jnp.asarray(make_nbr(n, m, k))
    src = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.1)
    f = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    timed(label, lambda: pconv.conv_dx_dw_pallas(src, w2, nbr, f, groups=groups))
