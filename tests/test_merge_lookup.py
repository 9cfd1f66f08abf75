"""Merge-path sorted lookup: bit-parity with binary-search lookup."""

import jax.numpy as jnp
import numpy as np
import pytest

from lidal_tpu.ops.hashing import SENTINEL_KEY, lookup, pack_keys
from lidal_tpu.ops.merge_lookup import lookup_sorted
from lidal_tpu.ops.voxelize import unique_voxels
from lidal_tpu.ops.kernel_map import build_subm_nbr, OFFSETS3


def _table(rng, n, cap, extent):
    coords = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
    return unique_voxels(jnp.asarray(coords), jnp.ones(n, bool), cap)


@pytest.mark.parametrize("tile", [8, 32, 128])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lookup_sorted_matches_binary_search(seed, tile):
    rng = np.random.default_rng(seed)
    uv = _table(rng, 600, 512, extent=12)
    # sorted query stream: the table keys shifted by a constant (like a rulebook
    # offset), some hitting, some missing, invalid tail sentinels
    for delta in [(0, 0, 1), (1, 0, 0), (-1, 1, 0), (0, -1, -1)]:
        d_hi = jnp.int32((delta[0] << 14) + delta[1])
        d_lo = jnp.int32(delta[2])
        q_hi = jnp.where(uv.valid, uv.key_hi + d_hi, SENTINEL_KEY)
        q_lo = jnp.where(uv.valid, uv.key_lo + d_lo, SENTINEL_KEY)
        ref = np.asarray(lookup(uv.key_hi, uv.key_lo, q_hi, q_lo))
        got = np.asarray(lookup_sorted(uv.key_hi, uv.key_lo, q_hi, q_lo, tile=tile))
        np.testing.assert_array_equal(got, ref)


def test_lookup_sorted_arbitrary_sorted_queries():
    rng = np.random.default_rng(3)
    uv = _table(rng, 500, 512, extent=10)
    # arbitrary sorted query set (not a constant shift): random coords, sorted
    qc = rng.integers(-1, 12, size=(700, 3)).astype(np.int32)
    qv = np.ones(700, bool)
    q_hi, q_lo = pack_keys(jnp.asarray(qc), jnp.asarray(qv))
    order = np.lexsort((np.asarray(q_lo), np.asarray(q_hi)))
    q_hi = jnp.asarray(np.asarray(q_hi)[order])
    q_lo = jnp.asarray(np.asarray(q_lo)[order])
    ref = np.asarray(lookup(uv.key_hi, uv.key_lo, q_hi, q_lo))
    got = np.asarray(lookup_sorted(uv.key_hi, uv.key_lo, q_hi, q_lo, tile=64))
    np.testing.assert_array_equal(got, ref)


def test_lookup_sorted_all_sentinel_and_tiny():
    uv = _table(np.random.default_rng(4), 20, 32, extent=4)
    s = jnp.full((16,), SENTINEL_KEY)
    out = np.asarray(lookup_sorted(uv.key_hi, uv.key_lo, s, s))
    assert (out == 32).all()


def test_build_subm_nbr_still_matches_dict_oracle():
    rng = np.random.default_rng(5)
    cap = 256
    uv = _table(rng, 300, cap, extent=8)
    nu = int(uv.num_unique)
    coords = np.asarray(uv.coords)[:nu]
    nbr = np.asarray(build_subm_nbr(uv.coords, uv.valid))
    table = {tuple(c): i for i, c in enumerate(coords)}
    for i in range(nu):
        for k, off in enumerate(OFFSETS3):
            q = tuple(coords[i] + np.array(off))
            assert nbr[i, k] == table.get(q, cap), (i, k, off)
    assert (nbr[nu:] == cap).all()
