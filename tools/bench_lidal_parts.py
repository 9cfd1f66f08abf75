"""Decompose LiDAL per-frame scoring cost (24 neighbors) with on-device timing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.active import lidal, nn_match
from tools.bench_suite import device_time

rng = np.random.default_rng(0)
P, C, NEI = 131072, 19, 24
n_pts = 120000


def frame(offset):
    r = 2 + 78 * rng.random(n_pts) ** 1.5
    th = rng.uniform(0, 2 * np.pi, n_pts)
    return np.stack(
        [r * np.cos(th) + offset, r * np.sin(th), 0.05 * rng.standard_normal(n_pts)], 1
    ).astype(np.float32)


q_xyz = np.zeros((P, 3), np.float32)
q_xyz[:n_pts] = frame(0.0)
q_prob = np.zeros((P, C), np.float32)
q_prob[:n_pts] = rng.dirichlet(np.ones(C), n_pts).astype(np.float32)
nei_probs, nei_grids = [], []
for i in range(NEI):
    nprob = np.zeros((P, C), np.float32)
    nprob[:n_pts] = rng.dirichlet(np.ones(C), n_pts).astype(np.float32)
    nei_probs.append(jnp.asarray(nprob))
    nei_grids.append(lidal.make_neighbor_grid(frame(0.8 * (i - NEI // 2)), cap=P))
grids = nn_match.stack_grids(nei_grids)
nei = jnp.stack(nei_probs)
nei = jnp.take_along_axis(nei, grids.src_idx[:, :, None], axis=1)  # grid-sorted
q_prob_j, q_xyz_j = jnp.asarray(q_prob), jnp.asarray(q_xyz)
q_valid = jnp.ones((P,), bool)
weights = jnp.ones((NEI,), jnp.float32)


def p(name, ms):
    print(f"{name:44s} {ms:8.1f} ms", flush=True)


def perturb(i, x):
    return x + (i & 1).astype(x.dtype) * 1e-30


gt = tuple(grids)  # HashGrid fields: key_hi, key_lo, planar, src_idx, valid

# full frame score
p(
    "score_frame_device (24 nei)",
    device_time(
        lambda i, qp, qx, nei_, w, *g: lidal._score_frame_device(
            qp, perturb(i, qx), q_valid, nei_, nn_match.HashGrid(*g), w
        )[0],
        (q_prob_j, q_xyz_j, nei, weights) + gt,
        iters=3,
    ),
)

# prepare_queries only (cell sort + tile corner keys)
p(
    "prepare_queries (once/frame)",
    device_time(
        lambda i, qx: nn_match.prepare_queries(perturb(i, qx), q_valid, lidal.DIS_THRESH).q_t,
        (q_xyz_j,),
        iters=10,
    ),
)

pq = jax.jit(nn_match.prepare_queries, static_argnums=2)(q_xyz_j, q_valid, lidal.DIS_THRESH)
pqt = tuple(pq)


# band bounds for all 24 neighbors (2 binary searches per tile per neighbor)
def bounds24(i, *args):
    g = nn_match.HashGrid(*args[: len(gt)])
    pq2 = nn_match.PreparedQueries(*args[len(gt) :])
    pq2 = pq2._replace(kmin_hi=pq2.kmin_hi + (i & 1))
    blo, nb = nn_match.band_bounds(g, pq2)
    return blo[0, 0] + nb[0, 0]


p("band_bounds x24", device_time(bounds24, gt + pqt, iters=10))


# band kernel for all 24 neighbors (one launch)
def band24(i, qx, *g):
    pq2 = nn_match.prepare_queries(perturb(i, qx), q_valid, lidal.DIS_THRESH)
    d2, row = nn_match.nn_query_band(nn_match.HashGrid(*g), pq2)
    return d2[0, 0] + row[0, 0].astype(jnp.float32)


p("nn_query_band x24 (incl prep+bounds)", device_time(band24, (q_xyz_j,) + gt, iters=3))


# KL + prob gather accumulation only (fake nn results)
def kl24(i, qp, nei_):
    nn_row = jnp.arange(P, dtype=jnp.int32)

    def body(c, nprob):
        npb = nprob[nn_row]
        qe = qp + lidal.EPSILON + (i & 1).astype(qp.dtype) * 1e-30
        ne = npb + lidal.EPSILON
        kl = jnp.sum(qe * (jnp.log(qe) - jnp.log(ne)) - qe + ne, axis=-1)
        return c + kl[0], None

    acc, _ = jax.lax.scan(body, jnp.zeros(()), nei_)
    return acc


p("prob-gather + KL x24 (scan)", device_time(kl24, (q_prob_j, nei), iters=3))
