"""Unit tests: coordinate keys, sorted lookup, unique voxelization vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidal_tpu.ops.hashing import SENTINEL_KEY, lookup, pack_keys
from lidal_tpu.ops.voxelize import append_zero_row, unique_voxels, voxelize_mean


def _rand_coords(rng, n, lo=-1, hi=200, dup_frac=0.5):
    base = rng.integers(lo, hi, size=(max(1, int(n * (1 - dup_frac))), 3))
    picks = rng.integers(0, base.shape[0], size=n)
    return base[picks].astype(np.int32)


def test_pack_keys_order_matches_np_unique_row_order():
    rng = np.random.default_rng(0)
    coords = _rand_coords(rng, 500)
    valid = np.ones(500, bool)
    hi, lo = pack_keys(jnp.asarray(coords), jnp.asarray(valid))
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    got = coords[order]
    expect = coords[np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))]
    np.testing.assert_array_equal(got, expect)


def test_unique_voxels_matches_np_unique():
    rng = np.random.default_rng(1)
    n, cap = 700, 512
    coords = _rand_coords(rng, n, hi=30)  # dense → many dups
    valid = rng.random(n) > 0.1
    res = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.asarray(valid), cap)

    vc = coords[valid]
    uq, uq_idx, uq_inv = np.unique(vc, axis=0, return_index=True, return_inverse=True)
    nu = uq.shape[0]
    assert int(res.num_unique) == nu
    assert nu <= cap
    np.testing.assert_array_equal(np.asarray(res.coords)[:nu], uq)
    assert not np.asarray(res.valid)[nu:].any()
    # first_src parity: translate uq_idx (index into valid-compacted array) to original
    valid_pos = np.where(valid)[0]
    np.testing.assert_array_equal(np.asarray(res.first_src)[:nu], valid_pos[uq_idx])
    # inverse parity on valid points; invalid points must map to the sentinel slot
    inv = np.asarray(res.inverse)
    np.testing.assert_array_equal(inv[valid], uq_inv)
    assert (inv[~valid] == cap).all()
    # counts
    expected_counts = np.bincount(uq_inv, minlength=nu)
    np.testing.assert_array_equal(np.asarray(res.counts)[:nu], expected_counts)


def test_unique_voxels_overflow_drops_and_reports():
    rng = np.random.default_rng(2)
    coords = _rand_coords(rng, 300, hi=100, dup_frac=0.0)
    valid = np.ones(300, bool)
    cap = 64
    res = unique_voxels(jnp.asarray(coords), jnp.asarray(valid), cap)
    nu_true = np.unique(coords, axis=0).shape[0]
    assert int(res.num_unique) == nu_true
    assert int(res.valid.sum()) == cap
    inv = np.asarray(res.inverse)
    # overflowed points carry the sentinel
    assert ((inv == cap) | (inv < cap)).all()
    assert (inv == cap).sum() > 0


def test_lookup_hits_and_misses():
    rng = np.random.default_rng(3)
    n, cap = 200, 256
    coords = _rand_coords(rng, n, hi=50)
    valid = np.ones(n, bool)
    res = unique_voxels(jnp.asarray(coords), jnp.asarray(valid), cap)

    # queries: every table coord (hit) + shifted coords (mostly misses)
    q_hit = np.asarray(res.coords)[: int(res.num_unique)]
    q_miss = q_hit + np.array([1000, 0, 0])
    q = np.concatenate([q_hit, q_miss])
    qv = np.ones(len(q), bool)
    q_hi, q_lo = pack_keys(jnp.asarray(q), jnp.asarray(qv))
    idx = lookup(res.key_hi, res.key_lo, q_hi, q_lo)
    idx = np.asarray(idx)
    nh = len(q_hit)
    np.testing.assert_array_equal(idx[:nh], np.arange(nh))
    assert (idx[nh:] == cap).all()

    # sentinel queries are never found
    s_hi = jnp.full((4,), SENTINEL_KEY)
    assert (np.asarray(lookup(res.key_hi, res.key_lo, s_hi, s_hi)) == cap).all()


def test_voxelize_mean_matches_segment_mean():
    rng = np.random.default_rng(4)
    n, cap, c = 400, 512, 5
    coords = _rand_coords(rng, n, hi=12)
    valid = rng.random(n) > 0.2
    feats = rng.normal(size=(n, c)).astype(np.float32)
    res = unique_voxels(jnp.asarray(coords), jnp.asarray(valid), cap)
    out = voxelize_mean(jnp.asarray(feats), res.inverse, res.counts)

    nu = int(res.num_unique)
    inv = np.asarray(res.inverse)
    expect = np.zeros((cap, c), np.float32)
    for v in range(nu):
        m = (inv == v) & valid
        expect[v] = feats[m].mean(0)
    np.testing.assert_allclose(np.asarray(out)[:nu], expect[:nu], rtol=1e-5, atol=1e-5)
    # empty voxels stay zero
    assert (np.asarray(out)[nu:] == 0).all()


def test_devoxelize_roundtrip_via_zero_row():
    rng = np.random.default_rng(5)
    n, cap = 100, 64
    coords = _rand_coords(rng, n, hi=6)
    valid = rng.random(n) > 0.3
    res = unique_voxels(jnp.asarray(coords), jnp.asarray(valid), cap)
    vf = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32))
    pf = np.asarray(append_zero_row(vf)[res.inverse])
    inv = np.asarray(res.inverse)
    np.testing.assert_allclose(pf[valid], np.asarray(vf)[inv[valid]])
    assert (pf[~valid] == 0).all()


@pytest.mark.parametrize("cap", [1, 2, 7, 64])
def test_lookup_tiny_tables(cap):
    coords = np.array([[0, 0, 0], [1, 2, 3], [5, 5, 5], [1, 2, 3], [9, 0, 1], [3, 3, 3], [2, 2, 2]], np.int32)
    valid = np.ones(len(coords), bool)
    res = unique_voxels(jnp.asarray(coords), jnp.asarray(valid), cap)
    nu = min(int(res.num_unique), cap)
    q_hi, q_lo = pack_keys(res.coords, res.valid)
    idx = np.asarray(lookup(res.key_hi, res.key_lo, q_hi, q_lo))
    np.testing.assert_array_equal(idx[:nu], np.arange(nu))
