"""Decompose unique_voxels cost: sort vs each scatter vs merge-based
alternatives, at production L0 shape (131k rows), batched B=4 via map_frames."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.batching import map_frames
from lidal_tpu.ops.hashing import SENTINEL_KEY, pack_keys, sort_with_keys
from lidal_tpu.ops.voxelize import unique_voxels
from tools.bench_suite import device_time

B, N, CAP = 4, 131072, 131072
rng = np.random.default_rng(0)
# surface-like coords: ~119k unique at L0 scale
r = 2 + 78 * rng.random((B, N)) ** 1.5
th = rng.uniform(0, 2 * np.pi, (B, N))
xyz = np.stack([r * np.cos(th), r * np.sin(th), 0.05 * rng.standard_normal((B, N))], -1)
coords = np.floor(xyz * 20.0).astype(np.int32)
coords -= coords.min(axis=(0, 1))
valid = np.ones((B, N), bool)


def consume(*xs):
    return sum(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x) for x in xs)


def run_full(i, coords, valid):
    def f(c, v):
        uv = unique_voxels(c + (i & 1), v, CAP)
        return consume(uv.coords, uv.first_src, uv.inverse, uv.counts, uv.valid)

    return map_frames(f, coords, valid).sum()


def run_sort(i, coords, valid):
    def f(c, v):
        hi, lo = pack_keys(c + (i & 1), v)
        idx = jnp.arange(N, dtype=jnp.int32)
        s_hi, s_lo, s_idx = sort_with_keys(hi, lo, idx)
        return consume(s_hi, s_lo, s_idx)

    return map_frames(f, coords, valid).sum()


def _sorted_pieces(c, v):
    hi, lo = pack_keys(c, v)
    idx = jnp.arange(N, dtype=jnp.int32)
    s_hi, s_lo, s_idx = sort_with_keys(hi, lo, idx)
    s_valid = s_hi != SENTINEL_KEY
    prev_hi = jnp.concatenate([jnp.array([SENTINEL_KEY]), s_hi[:-1]])
    prev_lo = jnp.concatenate([jnp.array([SENTINEL_KEY]), s_lo[:-1]])
    first = ((s_hi != prev_hi) | (s_lo != prev_lo)) & s_valid
    group = jnp.cumsum(first.astype(jnp.int32)) - 1
    return s_idx, s_valid, first, group


def run_sort_cumsum(i, coords, valid):
    def f(c, v):
        s_idx, s_valid, first, group = _sorted_pieces(c + (i & 1), v)
        return consume(s_idx, first, group)

    return map_frames(f, coords, valid).sum()


def run_scatter_first(i, coords, valid):
    def f(c, v):
        s_idx, s_valid, first, group = _sorted_pieces(c + (i & 1), v)
        in_cap = group < CAP
        tgt_first = jnp.where(first & in_cap, group, CAP)
        first_src = jnp.zeros(CAP, jnp.int32).at[tgt_first].set(s_idx, mode="drop")
        return consume(first_src)

    return map_frames(f, coords, valid).sum()


def run_scatter_inverse(i, coords, valid):
    def f(c, v):
        s_idx, s_valid, first, group = _sorted_pieces(c + (i & 1), v)
        in_cap = group < CAP
        pt_group = jnp.where(s_valid & in_cap, group, CAP)
        inverse = jnp.zeros(N, jnp.int32).at[s_idx].set(pt_group.astype(jnp.int32))
        return consume(inverse)

    return map_frames(f, coords, valid).sum()


def run_scatter_counts(i, coords, valid):
    def f(c, v):
        s_idx, s_valid, first, group = _sorted_pieces(c + (i & 1), v)
        in_cap = group < CAP
        counts = (
            jnp.zeros(CAP, jnp.int32).at[jnp.where(s_valid & in_cap, group, CAP)].add(1, mode="drop")
        )
        return consume(counts)

    return map_frames(f, coords, valid).sum()


def run_second_sort(i, coords, valid):
    """Alternative inverse: invert the permutation with a second 2-key sort."""

    def f(c, v):
        s_idx, s_valid, first, group = _sorted_pieces(c + (i & 1), v)
        in_cap = group < CAP
        pt_group = jnp.where(s_valid & in_cap, group, CAP).astype(jnp.int32)
        _, inverse = jax.lax.sort((s_idx, pt_group), num_keys=1)
        return consume(inverse)

    return map_frames(f, coords, valid).sum()


args = (jnp.asarray(coords), jnp.asarray(valid))
for name, fn in [
    ("full unique_voxels", run_full),
    ("sort only", run_sort),
    ("sort + first/cumsum", run_sort_cumsum),
    ("... + first_src scatter", run_scatter_first),
    ("... + inverse scatter", run_scatter_inverse),
    ("... + counts scatter-add", run_scatter_counts),
    ("... + inverse via 2nd sort", run_second_sort),
]:
    ms = device_time(fn, args, iters=10)
    print(f"{name:28s} {ms:7.2f} ms/batch", flush=True)
