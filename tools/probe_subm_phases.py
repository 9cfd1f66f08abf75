import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.voxelize import unique_voxels
from lidal_tpu.ops.hashing import SENTINEL_KEY, pack_keys
from lidal_tpu.ops.kernel_map import OFFSETS3, CENTER3
from lidal_tpu.ops import merge_lookup as ml


def t_pull(name, fn, *args, iters=10):
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
    print(f"{name:46s} {dt:9.2f} ms", flush=True)


rng = np.random.default_rng(0)
N = 131072
n_pts = 200000
r = 2 + 78 * rng.random(n_pts) ** 1.5
th = rng.uniform(0, 2 * np.pi, n_pts)
xyz = np.stack([r * np.cos(th), r * np.sin(th), 0.05 * rng.standard_normal(n_pts)], 1) * 20 + 4096
pad = np.zeros((262144, 3), np.int32)
pad[:n_pts] = xyz.astype(np.int32)
valid = np.zeros(262144, bool)
valid[:n_pts] = True
uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(pad), jnp.asarray(valid), N)


def queries(coords, valid):
    key_hi, key_lo = pack_keys(coords, valid)
    offs = [o for o in OFFSETS3 if o != (0, 0, 0)]
    half = offs[:CENTER3]
    d_hi = jnp.asarray([(dx << 14) + dy for dx, dy, _ in half], jnp.int32)
    d_lo = jnp.asarray([dz for _, _, dz in half], jnp.int32)
    q_hi = jnp.where(valid[None, :], key_hi[None, :] + d_hi[:, None], SENTINEL_KEY)
    q_lo = jnp.where(valid[None, :], key_lo[None, :] + d_lo[:, None], SENTINEL_KEY)
    return key_hi, key_lo, q_hi, q_lo


def p1_positions(coords, valid):
    kh, kl, qh, ql = queries(coords, valid)
    return ml._merge_positions(kh, kl, qh, ql)


def p2_lookup(coords, valid):
    kh, kl, qh, ql = queries(coords, valid)
    return ml.lookup_sorted_many(kh, kl, qh, ql)


def p3_full(coords, valid):
    from lidal_tpu.ops.kernel_map import build_subm_nbr

    return build_subm_nbr(coords, valid)[:, :3]


# also: merge only, with precomputed queries (excludes query build)
kh, kl, qh, ql = jax.jit(queries)(uv.coords, uv.valid)
t_pull("merge positions (precomputed queries)", ml._merge_positions, kh, kl, qh, ql)
t_pull("p1 queries+positions", p1_positions, uv.coords, uv.valid)
t_pull("p2 + found gathers", p2_lookup, uv.coords, uv.valid)
t_pull("p3 full build_subm_nbr", p3_full, uv.coords, uv.valid)
