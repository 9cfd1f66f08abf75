import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.merge_lookup import lookup_sorted_many
from lidal_tpu.ops.hashing import SENTINEL_KEY

for n in (4096, 32768, 131072):
    g = 4
    rng = np.random.default_rng(0)
    tl = np.sort(rng.choice(1 << 20, n, replace=False)).astype(np.int32)
    th = np.zeros(n, np.int32)
    qh = np.zeros((g, n), np.int32)
    ql = np.stack([np.minimum(tl + d, (1 << 29)) for d in (1, -1, 7, 0)]).astype(np.int32)
    t0 = time.perf_counter()
    out = jax.jit(lookup_sorted_many)(
        jnp.asarray(th), jnp.asarray(tl), jnp.asarray(qh), jnp.asarray(ql)
    )
    out.block_until_ready()
    print(f"n={n} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    # oracle
    want = np.searchsorted(tl, ql.reshape(-1)).reshape(ql.shape)
    hit = np.take(tl, np.minimum(want, n - 1)) == ql
    want = np.where(hit, want, n)
    got = np.asarray(out)
    assert (got == want).all(), (got != want).sum()
    print("   correctness OK", flush=True)
