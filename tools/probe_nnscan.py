import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from lidal_tpu.tpu_init import setup
setup()
from lidal_tpu.active import nn_match
import lidal_tpu.active.nn_match as nm
from tools.bench_suite import device_time

rng = np.random.default_rng(0)
P = 131072
n_pts = 120000
def frame(offset):
    r = 2 + 78 * rng.random(n_pts) ** 1.5
    th = rng.uniform(0, 2*np.pi, n_pts)
    return np.stack([r*np.cos(th) + offset, r*np.sin(th), 0.05*rng.standard_normal(n_pts)], 1).astype(np.float32)

gxyz = np.zeros((P, 3), np.float32); gxyz[:n_pts] = frame(0.3)
gval = np.zeros(P, bool); gval[:n_pts] = True
qxyz = np.zeros((P, 3), np.float32); qxyz[:n_pts] = frame(0.0)
qval = np.zeros(P, bool); qval[:n_pts] = True

grid = nn_match.build_grid(jnp.asarray(gxyz), jnp.asarray(gval), 0.1)
pq = jax.jit(nn_match.prepare_queries, static_argnums=2)(jnp.asarray(qxyz), jnp.asarray(qval), 0.1)

t0 = time.perf_counter()
d1, s1, f1, _ = jax.jit(nm.nn_query_prepared)(grid, pq)
d1.block_until_ready()
print("kernel compile+run", time.perf_counter() - t0, flush=True)

orig = nm._use_scan_kernel
nm._use_scan_kernel = lambda p, c: False
d2, s2, f2, _ = jax.jit(nm.nn_query_prepared)(grid, pq)
d2.block_until_ready()
nm._use_scan_kernel = orig
d1, s1, f1, d2, s2, f2 = map(np.asarray, (d1, s1, f1, d2, s2, f2))
print("found equal:", (f1 == f2).all(), flush=True)
print("dist equal:", np.array_equal(d1, d2), "max diff", float(np.abs(np.nan_to_num(d1-d2)).max()), flush=True)
print("src equal:", (s1 == s2).all(), int((s1 != s2).sum()), flush=True)
print("match frac:", float(f1.mean()), flush=True)

def fn(i, qx, qv):
    pq2 = nn_match.prepare_queries(qx + (i & 1).astype(qx.dtype) * 1e-30, qv, 0.1)
    d, s, f, _ = nm.nn_query_prepared(grid, pq2)
    return d
print(f"nn_query (prep+bounds+scan): {device_time(fn, (qxyz, qval), iters=10):.2f} ms", flush=True)
