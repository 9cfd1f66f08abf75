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
from lidal_tpu.ops.merge_lookup import lower_bound_sorted_many
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
nei = jnp.stack(nei_probs)
grids = lidal.stack_grids(nei_grids)
q_prob_j, q_xyz_j = jnp.asarray(q_prob), jnp.asarray(q_xyz)
q_valid = jnp.ones((P,), bool)


def p(name, ms):
    print(f"{name:44s} {ms:8.1f} ms", flush=True)


def perturb(i, x):
    return x + (i & 1).astype(x.dtype) * 1e-30


gt = tuple(grids)  # HashGrid fields: key_hi, key_lo, xyz, src_idx, valid

# full frame score
p(
    "score_frame_device (24 nei)",
    device_time(
        lambda i, qp, qx, nei_, *g: lidal._score_frame_device(
            qp, perturb(i, qx), q_valid, nei_, nn_match.HashGrid(*g)
        )[0],
        (q_prob_j, q_xyz_j, nei) + gt,
        iters=3,
    ),
)

# prepare_queries only
p(
    "prepare_queries (once/frame)",
    device_time(
        lambda i, qx: nn_match.prepare_queries(perturb(i, qx), q_valid, lidal.DIS_THRESH).s_xyz,
        (q_xyz_j,),
        iters=10,
    ),
)

pq = jax.jit(nn_match.prepare_queries, static_argnums=2)(q_xyz_j, q_valid, lidal.DIS_THRESH)


# bounds for 24 neighbors (scan like the scorer)
def bounds24(i, ph, pl_lo, *g):
    qh2 = jnp.concatenate([ph + (i & 1), ph + (i & 1)], axis=0)
    ql2 = jnp.concatenate([pl_lo, pl_lo + 3], axis=0)

    def body(c, gg):
        b = lower_bound_sorted_many(gg.key_hi, gg.key_lo, qh2, ql2)
        return c + b[0, 0], None

    acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), nn_match.HashGrid(*g))
    return acc


p("bounds only x24 (scan)", device_time(bounds24, (pq.ph, pq.pl_lo) + gt, iters=3))


# full nn_query x24
def nn24(i, qx, *g):
    pq2 = nn_match.prepare_queries(perturb(i, qx), q_valid, lidal.DIS_THRESH)

    def body(c, gg):
        d, s_, f, o = nn_match.nn_query_prepared(gg, pq2)
        return c + d[0], None

    acc, _ = jax.lax.scan(body, jnp.zeros(()), nn_match.HashGrid(*g))
    return acc


p("nn_query x24 (scan, incl prep)", device_time(nn24, (q_xyz_j,) + gt, iters=3))


# KL + prob gather accumulation only (fake nn results)
def kl24(i, qp, nei_):
    nn_src = jnp.arange(P, dtype=jnp.int32)

    def body(c, nprob):
        npb = nprob[nn_src]
        qe = qp + lidal.EPSILON + (i & 1).astype(qp.dtype) * 1e-30
        ne = npb + lidal.EPSILON
        kl = jnp.sum(qe * jnp.log(qe / ne) - qe + ne, axis=-1)
        return c + kl[0], None

    acc, _ = jax.lax.scan(body, jnp.zeros(()), nei_)
    return acc


p("prob-gather + KL x24 (scan)", device_time(kl24, (q_prob_j, nei), iters=3))
