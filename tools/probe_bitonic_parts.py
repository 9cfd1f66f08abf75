import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops import merge_lookup as ml


def t_pull(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    x = fn_j(*args)
    float(jnp.asarray(x).ravel()[0])
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + fn_j(*args).ravel()[0].astype(jnp.float32)
        float(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)


g, lp = 13, 262144
rng = np.random.default_rng(0)
eh = jnp.asarray(rng.integers(0, 1 << 28, (g, lp)).astype(np.int32))
el = jnp.asarray(rng.integers(0, 1 << 28, (g, lp)).astype(np.int32))

t_pull("bitonic_merge 18 stages [13, 262144]", lambda a, b: ml._bitonic_merge(a, b)[0], eh, el)


def stages_only_large(a, b):
    r = lp // 128
    a3, b3 = a.reshape(g, r, 128), b.reshape(g, r, 128)
    s = lp >> 1
    while s >= 128:
        a3, b3 = ml._cmpx(a3, b3, axis=1, bit=s // 128)
        s >>= 1
    return a3


t_pull("  large strides only (11 stages)", stages_only_large, eh, el)


def small_after_transpose(a, b):
    r = lp // 128
    a3 = a.reshape(g, r, 128).swapaxes(1, 2)
    b3 = b.reshape(g, r, 128).swapaxes(1, 2)
    s = 64
    while s >= 1:
        a3, b3 = ml._cmpx(a3, b3, axis=1, bit=s)
        s >>= 1
    return a3.swapaxes(1, 2)


t_pull("  transpose+7 small+transpose", small_after_transpose, eh, el)
t_pull("  two transposes only", lambda a: a.reshape(g, lp // 128, 128).swapaxes(1, 2).swapaxes(1, 2) + 1, eh)
t_pull("  one _cmpx large stage", lambda a, b: ml._cmpx(a.reshape(g, -1, 128), b.reshape(g, -1, 128), 1, 4)[0], eh, el)


def tail(a, b):
    is_t = b & 1
    tpre = jnp.cumsum(is_t, axis=1) - is_t
    iota = jnp.arange(lp, dtype=jnp.int32)[None, :]
    qrank = iota - tpre
    m = lp // 2
    okq = (is_t == 0) & (qrank < m)
    row = jnp.arange(g, dtype=jnp.int32)[:, None] * m
    flat_tgt = jnp.where(okq, row + qrank, g * m)
    out = (
        jnp.zeros((g * m,), jnp.int32)
        .at[flat_tgt.reshape(-1)]
        .set(jnp.where(okq, tpre, 0).reshape(-1), mode="drop")
    )
    return out


t_pull("  cumsum+rank+scatter tail", tail, eh, el)
