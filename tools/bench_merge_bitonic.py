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
from lidal_tpu.ops.kernel_map import build_subm_nbr, build_unet_plan_frame
from lidal_tpu.ops.merge_lookup import lookup_sorted_many
from lidal_tpu.ops.hashing import SENTINEL_KEY


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
    print(f"{name:44s} {dt:9.2f} ms", flush=True)


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

# correctness vs numpy searchsorted oracle on the 13-stream rulebook queries
th_np = np.asarray(uv.key_hi).astype(np.int64)
tl_np = np.asarray(uv.key_lo).astype(np.int64)
tkey = (th_np << 32) | (tl_np & 0xFFFFFFFF)
deltas = [(1 << 14) + 1, 1, -1, (1 << 14), -(1 << 14), 3 << 14]
qh = []
ql = []
for d_hi, d_lo in [(1, 1), (0, 1), (0, -1), (1, 0), (-1, 0), (3, 0)]:
    h = np.where(valid[:N], th_np[:N] + (d_hi << 14), SENTINEL_KEY)
    l = np.where(valid[:N], tl_np[:N] + d_lo, SENTINEL_KEY)
    qh.append(h)
    ql.append(l)
qh = np.stack(qh).astype(np.int32)
ql = np.stack(ql).astype(np.int32)
got = np.asarray(
    jax.jit(lookup_sorted_many)(uv.key_hi, uv.key_lo, jnp.asarray(qh), jnp.asarray(ql))
)
qkey = (qh.astype(np.int64) << 32) | (ql.astype(np.int64) & 0xFFFFFFFF)
n_valid = int(np.asarray(uv.valid).sum())
tk = tkey[:n_valid]
want = np.searchsorted(tk, qkey.reshape(-1)).reshape(qkey.shape)
hit = (want < n_valid) & (np.take(tk, np.minimum(want, n_valid - 1)) == qkey) & (
    qh != SENTINEL_KEY
)
want = np.where(hit, want, N)
assert (got == want).all(), (got != want).sum()
print("correctness: OK", flush=True)

t_pull("build_subm_nbr (bitonic 13)", lambda c, v: build_subm_nbr(c, v)[:, :3], uv.coords, uv.valid)
caps = (131072, 49152, 16384, 6144, 2048)
t_pull(
    "build_unet_plan_frame",
    lambda c, v: build_unet_plan_frame(c, v, caps).levels[0].nbr3[:, :3],
    uv.coords,
    uv.valid,
    iters=5,
)
