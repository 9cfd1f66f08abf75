"""Coordinate keys and sorted-table lookups for sparse voxel grids.

This is the TPU-native replacement for torchsparse's coordinate hash tables
(``F.sphash`` / ``F.sphashquery``, reference ``network/utils.py:17-19``) and for the
``np.unique(coords, axis=0)`` voxel dedup (reference ``dataset/sk_dataset.py:167``).

Design notes (TPU-first):

* TPUs have no cheap int64, so a voxel coordinate ``(x, y, z)`` is packed into a
  *pair* of int32 keys ``(hi, lo)`` ordered lexicographically.  ``jax.lax.sort``
  sorts multiple operands with ``num_keys`` leading keys, which gives us exact
  64-bit-key semantics out of two 32-bit lanes.
* Key order is x-major (x, then y, then z) so that sorting keys reproduces
  ``np.unique(coords_v, axis=0)`` row order bit-for-bit — selection-ranking parity
  with the reference depends on matching its voxel enumeration.
* Lookups against a sorted table are branch-free vectorized binary searches
  (``ceil(log2(cap))`` gather steps), fully jittable with static shapes.

Supported coordinate range: x, y in ``[-1, 16382]``; z in ``[-1, 2**31 - 3]``.
The reference uses a ``full_scale = 8192`` grid (``dataset/sk_dataset.py:56``), and
kernel-map queries only ever offset coordinates by ±1 voxel, so this range has 2x
headroom on x/y.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

# Sorts after every real key; also used as the "not found" table index marker's key.
SENTINEL_KEY = jnp.int32(2**31 - 1)

_SHIFT = 14  # bits reserved for (y + 1) in the hi key


def pack_keys(coords: jnp.ndarray, valid: jnp.ndarray):
    """Pack integer voxel coords [..., 3] into an x-major (hi, lo) int32 key pair.

    Invalid rows get ``(SENTINEL_KEY, SENTINEL_KEY)`` so they sort to the end.
    """
    c = coords.astype(jnp.int32) + 1  # shift so that -1 (kernel-offset underflow) packs
    hi = (c[..., 0] << _SHIFT) | c[..., 1]
    lo = c[..., 2]
    hi = jnp.where(valid, hi, SENTINEL_KEY)
    lo = jnp.where(valid, lo, SENTINEL_KEY)
    return hi, lo


def key_less(a_hi, a_lo, b_hi, b_lo):
    """Lexicographic (hi, lo) < comparison."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def sort_with_keys(hi, lo, *vals, num_extra_keys: int = 0):
    """Sort all operands by (hi, lo [, first num_extra_keys of vals]) ascending.

    ``jax.lax.sort`` is stable, so equal keys preserve input order.
    """
    out = lax.sort((hi, lo) + tuple(vals), num_keys=2 + num_extra_keys)
    return out


def lookup(table_hi: jnp.ndarray, table_lo: jnp.ndarray, q_hi: jnp.ndarray, q_lo: jnp.ndarray):
    """Find each query key in a sorted, sentinel-padded key table.

    Equivalent of torchsparse ``F.sphashquery`` (reference ``network/utils.py:19``).

    Args:
      table_hi/table_lo: [cap] sorted ascending; invalid tail rows = SENTINEL_KEY.
      q_hi/q_lo: queries of any shape.

    Returns:
      int32 indices into the table, or ``cap`` (one past the end) where the query is
      absent or is itself a sentinel.  Callers append a zero row at index ``cap``.
    """
    cap = table_hi.shape[0]
    steps = max(1, math.ceil(math.log2(cap + 1)))
    lo_b = jnp.zeros(q_hi.shape, dtype=jnp.int32)
    hi_b = jnp.full(q_hi.shape, cap, dtype=jnp.int32)
    for _ in range(steps):
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.minimum(mid, cap - 1)
        m_hi = table_hi[mid_c]
        m_lo = table_lo[mid_c]
        less = key_less(m_hi, m_lo, q_hi, q_lo)
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
    pos = jnp.minimum(lo_b, cap - 1)
    found = (table_hi[pos] == q_hi) & (table_lo[pos] == q_lo) & (q_hi != SENTINEL_KEY)
    return jnp.where(found, lo_b, cap).astype(jnp.int32)
