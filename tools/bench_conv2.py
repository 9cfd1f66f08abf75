import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops import conv as conv_mod
from lidal_tpu.ops.pallas_conv import subm_conv_pallas


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


rng = np.random.default_rng(0)
N = 131072
K = 27


def make_nbr(n, k, rows_per_x=3000):
    # banded sorted columns: neighbor ~ i + offset-dependent shift, sentinel ~12%
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
for cin, cout in [(32, 32), (96, 96), (128, 128), (256, 256)]:
    feats = jnp.asarray(rng.standard_normal((N, cin)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((K, cin, cout)) * 0.05).astype(np.float32))
    got = np.asarray(jax.jit(subm_conv_pallas)(feats, w, nbr))
    conv_mod.USE_PALLAS = False
    want = np.asarray(jax.jit(conv_mod.subm_conv)(feats, w, nbr))
    conv_mod.USE_PALLAS = None
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"c{cin}->c{cout} rel err {err:.2e}", flush=True)
    assert err < 2e-2, err
    t_pull(f"pallas subm c{cin}->c{cout}", subm_conv_pallas, feats, w, nbr)

# small-voxel levels (down-sampled): check non-multiple... caps are 256-multiples
for n2, cin, cout in [(49152, 64, 64), (16384, 128, 128), (6144, 256, 256)]:
    nbr2 = jnp.asarray(make_nbr(n2, K, rows_per_x=max(200, n2 // 48)))
    feats = jnp.asarray(rng.standard_normal((n2, cin)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((K, cin, cout)) * 0.05).astype(np.float32))
    t_pull(f"pallas subm n={n2} c{cin}", subm_conv_pallas, feats, w, nbr2)
