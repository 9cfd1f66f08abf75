"""Decompose the 13-stream lookup cost with on-device scan timing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops import merge_lookup as ml
from lidal_tpu.ops.pallas_merge import merge_rank_pallas
from lidal_tpu.ops.kernel_map import build_subm_nbr
from lidal_tpu.ops.voxelize import unique_voxels
from tools.bench_suite import device_time

rng = np.random.default_rng(0)
n = 131072
tl = np.sort(rng.choice(1 << 20, n, replace=False)).astype(np.int32)
th = (tl >> 6).astype(np.int32)
g = 13
qh = np.stack([th] * g).astype(np.int32)
ql = np.stack([np.minimum(tl + d - 6, (1 << 29)) for d in range(g)]).astype(np.int32)
m = n
lp = 1 << (2 * n - 1).bit_length()
r = lp // 128

eh = np.concatenate([np.stack([th] * g), qh[:, ::-1]], axis=1).reshape(g, r, 128)
el = np.concatenate([np.stack([(tl << 1) | 1] * g), (ql << 1)[:, ::-1]], axis=1).reshape(
    g, r, 128
)


def p(name, ms):
    print(f"{name:46s} {ms:8.2f} ms", flush=True)


# 1. pallas kernel alone (no scatter, no query build)
p(
    "pallas merge kernel only",
    device_time(
        lambda i, a, b: merge_rank_pallas(a + (i & 1), b + ((i & 1) << 1), n=n, m=m, with_found=True),
        (eh, el),
        iters=30,
    ),
)

# 2. eh/el construction + kernel (no scatter): replicate _merge_rank preamble
SENT = 2**31 - 1


def build_and_kernel(i, th, tl, qh, ql):
    s = i & 1
    th = th + s
    qh = qh + s
    t_sent = th == SENT
    tl2 = jnp.where(t_sent, SENT, (tl << 1) | 1)
    q_sent = qh == SENT
    ql2 = jnp.where(q_sent, SENT - 1, ql << 1)
    ehh = jnp.concatenate([jnp.broadcast_to(th[None], (g, n)), qh[:, ::-1]], axis=1)
    ell = jnp.concatenate([jnp.broadcast_to(tl2[None], (g, n)), ql2[:, ::-1]], axis=1)
    return merge_rank_pallas(
        ehh.reshape(g, r, 128), ell.reshape(g, r, 128), n=n, m=m, with_found=True
    )[0]


p("build eh/el + kernel", device_time(build_and_kernel, (th, tl, qh, ql), iters=30))


# 3. full lookup (build + kernel + scatter)
def full(i, th, tl, qh, ql):
    ml.USE_PALLAS = True
    s = i & 1
    return ml.lookup_sorted_many(th + s, tl, qh + s, ql, unique_queries=True)


p("full lookup_sorted_many (pallas)", device_time(full, (th, tl, qh, ql), iters=30))


# 4. full build_subm_nbr (lookup + mirrors + assembly)
coords = np.zeros((n, 3), np.int32)
coords[:, 0] = (tl >> 12) & 0x3FFF
coords[:, 1] = (tl >> 6) & 0x3F
coords[:, 2] = tl & 0x3F
uv = jax.jit(unique_voxels, static_argnums=2)(
    jnp.asarray(coords), jnp.ones(n, bool), n
)


def subm(i, c, v):
    ml.USE_PALLAS = True
    return build_subm_nbr(c + (i & 1), v)[:, :3]


p("full build_subm_nbr (pallas)", device_time(subm, (uv.coords, uv.valid), iters=10))
ml.USE_PALLAS = None
