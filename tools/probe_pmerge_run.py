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

rng = np.random.default_rng(0)
n = 131072
tl = np.sort(rng.choice(1 << 20, n, replace=False)).astype(np.int32)
th = (tl >> 6).astype(np.int32)
g = 13
qh, ql = [], []
for d in range(g):
    ql.append(np.minimum(tl + d - 6, (1 << 29)))
    qh.append(th.copy())
qh = np.stack(qh).astype(np.int32)
ql = np.stack(ql).astype(np.int32)
args = [jnp.asarray(v) for v in (th, tl, qh, ql)]

t0 = time.perf_counter()
ml.USE_PALLAS = True
got_p = np.asarray(jax.jit(lambda *a: ml.lookup_sorted_many(*a, unique_queries=True))(*args))
print("pallas compile+run", time.perf_counter() - t0, flush=True)
ml.USE_PALLAS = False
got_x = np.asarray(jax.jit(lambda *a: ml.lookup_sorted_many(*a, unique_queries=True))(*args))
ml.USE_PALLAS = None
print("pallas == xla:", np.array_equal(got_p, got_x), int((got_p != got_x).sum()), flush=True)

ml.USE_PALLAS = True
lb_p = np.asarray(jax.jit(ml.lower_bound_sorted_many)(*args))
ml.USE_PALLAS = False
lb_x = np.asarray(jax.jit(ml.lower_bound_sorted_many)(*args))
ml.USE_PALLAS = None
print("lower_bound pallas == xla:", np.array_equal(lb_p, lb_x), flush=True)


def t_pull(name, fn, *a, iters=20):
    fn_j = jax.jit(fn)
    x = fn_j(*a)
    float(jnp.asarray(x).ravel()[0])
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + fn_j(*a).ravel()[0].astype(jnp.float32)
        float(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:9.2f} ms", flush=True)


ml.USE_PALLAS = True
t_pull("pallas 13-stream lookup n=m=131072", lambda *a: ml.lookup_sorted_many(*a, unique_queries=True), *args)
ml.USE_PALLAS = None
