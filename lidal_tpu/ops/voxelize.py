"""Voxelization: coordinate dedup and point-feature pooling, fixed capacity.

TPU-native equivalents of:

* ``np.unique(coords_v, axis=0, return_index=True, return_inverse=True)``
  (reference ``dataset/sk_dataset.py:167-169``) — :func:`unique_voxels`.
* torchsparse ``F.spvoxelize`` + ``F.spcount`` feature averaging
  (reference ``network/utils.py:20-25``) — :func:`voxelize_mean`.

Both are jittable with static shapes; unique voxels are emitted in sorted
(x, y, z)-lexicographic order, matching ``np.unique`` row order exactly, and the
"first occurrence" representative matches NumPy's stable-sort semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from lidal_tpu.ops.hashing import SENTINEL_KEY, pack_keys, sort_with_keys


class UniqueVoxels(NamedTuple):
    """Result of :func:`unique_voxels` with output capacity ``cap_out``.

    Attributes:
      coords: [cap_out, 3] int32 unique voxel coords, sorted lexicographically;
        rows past ``num_unique`` are zeros.
      key_hi/key_lo: [cap_out] packed keys of ``coords`` (sentinel past the end) —
        this *is* the sorted lookup table for this voxel set.
      valid: [cap_out] bool.
      first_src: [cap_out] int32 index into the input of the first (lowest-index)
        point of each voxel (``np.unique(..., return_index=True)`` parity).
      inverse: [n_points] int32 point -> voxel index (``return_inverse`` parity);
        points whose voxel overflowed ``cap_out`` (or invalid points) map to
        ``cap_out`` (a sentinel slot).
      counts: [cap_out] int32 number of valid points per voxel.
      num_unique: [] int32 true unique count (may exceed ``cap_out``; overflow is
        dropped — monitor this).
    """

    coords: jnp.ndarray
    key_hi: jnp.ndarray
    key_lo: jnp.ndarray
    valid: jnp.ndarray
    first_src: jnp.ndarray
    inverse: jnp.ndarray
    counts: jnp.ndarray
    num_unique: jnp.ndarray


def unique_voxels(coords: jnp.ndarray, valid: jnp.ndarray, cap_out: int) -> UniqueVoxels:
    """Deduplicate integer voxel coords [n, 3] under a validity mask.

    Scatter-free: on TPU each [n]-sized scatter costs ~5x a stable 1-key sort of
    the same size (measured: +2.4/+2.4/+4.6 ms per scatter vs +0.5 ms per sort at
    n = 131072, tools/probe_unique_parts.py), so ``first_src``/``counts`` come from
    one compaction sort of group starts and ``inverse`` from a permutation-inverting
    sort.
    """
    n = coords.shape[0]
    hi, lo = pack_keys(coords, valid)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_hi, s_lo, s_idx = sort_with_keys(hi, lo, idx)
    s_valid = s_hi != SENTINEL_KEY

    prev_hi = jnp.concatenate([jnp.array([SENTINEL_KEY]), s_hi[:-1]])
    prev_lo = jnp.concatenate([jnp.array([SENTINEL_KEY]), s_lo[:-1]])
    first = ((s_hi != prev_hi) | (s_lo != prev_lo)) & s_valid

    # NOTE: plain cumsum here — the matmul-based ops.prefix variant blows up
    # XLA compile time (~2 min) when fused into this graph.
    group = jnp.cumsum(first.astype(jnp.int32)) - 1  # sorted-pos -> voxel id
    num_unique = first.sum().astype(jnp.int32)
    n_valid = s_valid.sum().astype(jnp.int32)

    # Compact the sorted positions of group starts to the front (stable, so they
    # stay in ascending-group order).  starts[g] = sorted position where voxel g
    # begins; slots past num_unique are pinned to n_valid so diffs vanish.
    comp_pos = lax.sort((jnp.where(first, 0, 1).astype(jnp.int32), idx), num_keys=1)[1]
    m = min(cap_out + 1, n)
    starts = jnp.where(jnp.arange(m) < num_unique, comp_pos[:m], n_valid)
    if m < cap_out + 1:  # cap_out >= n: pad (no overflow possible in this regime)
        starts = jnp.concatenate([starts, jnp.broadcast_to(n_valid, (cap_out + 1 - m,))])
    counts = (starts[1:] - starts[:cap_out]).astype(jnp.int32)

    out_valid = jnp.arange(cap_out) < jnp.minimum(num_unique, cap_out)
    # s_idx at a group's start = lowest original index of that voxel (stable sort),
    # i.e. np.unique(..., return_index=True) semantics.
    first_src = jnp.where(out_valid, s_idx[jnp.minimum(starts[:cap_out], n - 1)], 0)
    out_coords = jnp.where(out_valid[:, None], coords[first_src], 0).astype(jnp.int32)
    key_hi, key_lo = pack_keys(out_coords, out_valid)

    # point -> voxel id (original order); overflow/invalid -> cap_out sentinel.
    # s_idx is a permutation of arange(n), so sorting by it inverts the main sort.
    in_cap = group < cap_out
    pt_group = jnp.where(s_valid & in_cap, group, cap_out).astype(jnp.int32)
    inverse = lax.sort((s_idx, pt_group), num_keys=1)[1]

    return UniqueVoxels(out_coords, key_hi, key_lo, out_valid, first_src, inverse, counts, num_unique)


def voxelize_mean(point_feats: jnp.ndarray, inverse: jnp.ndarray, counts: jnp.ndarray):
    """Average point features into their voxels (torchsparse ``F.spvoxelize`` over
    ``idx_query``/``counts``, reference ``network/utils.py:20-25``).

    Args:
      point_feats: [n, c] float features; rows of invalid points may be anything —
        their ``inverse`` must be the sentinel ``cap_out``.
      inverse: [n] int32 point -> voxel (sentinel = counts.shape[0]).
      counts: [cap_out] int32 per-voxel valid point counts.

    Returns:
      [cap_out, c] mean features (zero where the voxel is empty).
    """
    cap_out = counts.shape[0]
    sums = jnp.zeros((cap_out, point_feats.shape[-1]), point_feats.dtype).at[inverse].add(
        point_feats, mode="drop"
    )
    denom = jnp.maximum(counts, 1).astype(point_feats.dtype)[:, None]
    return sums / denom


def devoxelize_nearest(voxel_feats_ext: jnp.ndarray, inverse: jnp.ndarray):
    """Project voxel features back to points by the voxelization map.

    ``voxel_feats_ext`` must have an extra zero row at index ``cap_out`` (the
    sentinel slot); this mirrors the ``logits_v[inverse_indices]`` projection of the
    reference (``evaluate.py:104-107``).
    """
    return voxel_feats_ext[inverse]


def append_zero_row(feats: jnp.ndarray) -> jnp.ndarray:
    """Append a zero sentinel row so sentinel indices gather zeros."""
    return jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
