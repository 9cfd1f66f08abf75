"""Bisect Mosaic compile time of the merge kernel: r ladder x feature subsets."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.pallas_merge import _stage, _roll


def make_kernel(r, mode):
    lp = r * 128

    def _kernel(eh_ref, el_ref, val_ref, tgt_ref):
        eh = eh_ref[0]
        el = el_ref[0]
        if mode >= 1:  # stages
            s = lp >> 1
            while s >= 128:
                eh, el = _stage(eh, el, axis=0, bit=s // 128)
                s >>= 1
            while s >= 1:
                eh, el = _stage(eh, el, axis=1, bit=s)
                s >>= 1
        if mode >= 2:  # prefix
            is_t = (el & 1).astype(jnp.float32)
            tri = jnp.triu(jnp.ones((128, 128), jnp.float32), k=1)
            in_row = jnp.dot(is_t, tri, preferred_element_type=jnp.float32)
            row_tot = jnp.sum(is_t, axis=1, keepdims=True)
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            pre = row_tot
            k = 1
            while k < r:
                pre = pre + jnp.where(row_idx >= k, _roll(pre, k, 0), 0.0)
                k <<= 1
            eh = eh + (in_row + pre).astype(jnp.int32)
        val_ref[0] = eh
        tgt_ref[0] = el

    return _kernel


def timeit(fn, *a, iters=20):
    import time as _t
    x = fn(*a); jnp.asarray(x[0]).ravel()[0].item()
    for rep in range(2):
        t0 = _t.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + fn(*a)[0].ravel()[0].astype(jnp.float32)
        float(acc)
        dt = (_t.perf_counter() - t0) / iters * 1e3
    return dt


for r in (2048,):
    for mode in (0, 1, 2):
        g_n = 13
        x = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, (g_n, r, 128)).astype(np.int32))
        t0 = time.perf_counter()
        call = pl.pallas_call(
            make_kernel(r, mode),
            grid=(g_n,),
            in_specs=[
                pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((g_n, r, 128), jnp.int32),
                jax.ShapeDtypeStruct((g_n, r, 128), jnp.int32),
            ),
            input_output_aliases={0: 0, 1: 1},
        )
        fn0 = jax.jit(lambda a, b, _c=call: _c(a, b))
        dt = timeit(fn0, x, x)
        print(f"r={r} mode={mode} g=13 per-call {dt:.2f} ms", flush=True)

# timing of the real kernel at full scale
import time as _t
from lidal_tpu.ops.pallas_merge import merge_rank_pallas

g, r = 13, 2048
x = jnp.asarray(np.random.default_rng(1).integers(0, 1 << 20, (g, r, 128)).astype(np.int32))
y = jnp.asarray(np.random.default_rng(2).integers(0, 1 << 20, (g, r, 128)).astype(np.int32))
fn = jax.jit(lambda a, b: merge_rank_pallas(a, b, n=131072, m=131072, with_found=True))
out = fn(x, y); float(out.ravel()[0])
for rep in range(2):
    t0 = _t.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(20):
        acc = acc + fn(x, y).ravel()[0].astype(jnp.float32)
    float(acc)
    dt = (_t.perf_counter() - t0) / 20 * 1e3
print(f"merge_rank_pallas kernel only g=13 r=2048: {dt:.2f} ms", flush=True)
