"""Kernel-map ("rulebook") construction for sparse 3D convolution.

TPU-native replacement for torchsparse's CUDA kernel-map builder (consumed via
``spnn.Conv3d`` in the reference, ``network/utils.py:105-172``).  The reference
caches kernel maps per (coords, stride) inside ``SparseTensor.kmaps``; here the
entire multi-level structure is built once per batch as a static-shape "plan"
pytree, after which every conv in the network is a pure gather + matmul.

Three map kinds cover every conv in MinkUNet/SPVCNN (reference
``network/minkunet.py:22-87``, ``network/spvcnn.py:21-83``):

* **subm** (kernel 3, stride 1): output coords == input coords.  ``nbr[i, k]`` is
  the input index whose coord is ``coord_i + offset_k`` (or a sentinel).  A conv is
  then ``concat_k X[nbr[:, k]] @ W`` — a single MXU matmul after an im2col gather.
* **down** (kernel 2, stride 2): output coords are ``unique(coords >> 1)``;
  ``child[o, d]`` indexes the fine voxel at ``2*coord_o + delta_d``.
* **up** (kernel 2, stride 2, transposed): each fine voxel has exactly one coarse
  parent; ``parent[f]`` + ``pdelta[f]`` (which of the 8 kernel taps applies).

The down/up maps are two views of one pairing, so a transposed conv's backward
reuses the down map and vice versa — gathers in both directions, no scatter in the
hot path, fully deterministic (required for bitwise-reproducible selection).
"""

from __future__ import annotations

import itertools

import jax
from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from lidal_tpu.ops.hashing import pack_keys
from lidal_tpu.ops.voxelize import unique_voxels

# Kernel-3 offsets in x-major product order; OFFSETS3[K3 - 1 - k] == -OFFSETS3[k],
# which the conv backward relies on.
OFFSETS3 = tuple(itertools.product((-1, 0, 1), repeat=3))
K3 = len(OFFSETS3)  # 27
CENTER3 = 13  # index of (0, 0, 0)

# Kernel-2 offsets, d = (dx<<2)|(dy<<1)|dz. Matches torchsparse
# ``get_kernel_offsets(2, ...)`` semantics of {0,1}^3 taps (reference network/utils.py:69).
OFFSETS2 = tuple(itertools.product((0, 1), repeat=3))
K2 = len(OFFSETS2)  # 8


class LevelPlan(NamedTuple):
    """One resolution level: sorted unique voxel table + its kernel-3 rulebook."""

    coords: jnp.ndarray  # [cap, 3] int32, unit coords at this level
    valid: jnp.ndarray  # [cap] bool
    nbr3: jnp.ndarray  # [cap, 27] int32 into this level (sentinel = cap)
    num_valid: jnp.ndarray  # [] int32
    overflow: jnp.ndarray  # [] int32: unique voxels dropped past the capacity


class DownPlan(NamedTuple):
    """Pairing between a fine level l and coarse level l+1."""

    child: jnp.ndarray  # [cap_coarse, 8] int32 into fine (sentinel = cap_fine)
    parent: jnp.ndarray  # [cap_fine] int32 into coarse (sentinel = cap_coarse)
    pdelta: jnp.ndarray  # [cap_fine] int32 in [0, 8)


class UNetPlan(NamedTuple):
    levels: Tuple[LevelPlan, ...]
    downs: Tuple[DownPlan, ...]


def build_subm_nbr(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Kernel-3 stride-1 rulebook over a sorted unique voxel table.

    Per offset, the query stream ``keys + packed(offset)`` stays sorted (the
    key packing is carry-free), so each of the 26 lookups is a merge of two
    sorted lists — ``lookup_sorted`` instead of per-query binary search.

    Args:
      coords: [cap, 3] sorted unique voxel coords (as produced by
        :func:`lidal_tpu.ops.voxelize.unique_voxels`).
      valid: [cap] bool.

    Returns:
      [cap, 27] int32 neighbor indices; sentinel ``cap`` where absent/invalid.
    """
    from lidal_tpu.ops.hashing import SENTINEL_KEY
    from lidal_tpu.ops.merge_lookup import lookup_sorted_many

    cap = coords.shape[0]
    key_hi, key_lo = pack_keys(coords, valid)
    # All 26 non-center offsets as direct merge streams.  (Round 1 looked up 13
    # and scatter-inverted the mirrors; with the scatter-free merge kernel the
    # 13 extra streams are cheaper than 13 [cap]-sized scatters.)
    offs = [o for o in OFFSETS3 if o != (0, 0, 0)]
    d_hi = jnp.asarray([(dx << 14) + dy for dx, dy, _ in offs], jnp.int32)  # [26]
    d_lo = jnp.asarray([dz for _, _, dz in offs], jnp.int32)
    q_hi = jnp.where(valid[None, :], key_hi[None, :] + d_hi[:, None], SENTINEL_KEY)
    q_lo = jnp.where(valid[None, :], key_lo[None, :] + d_lo[:, None], SENTINEL_KEY)
    # one fused 26-stream merge (NOT vmap of single lookups: vmapping would turn
    # the batched merge into generic slow-path gathers)
    nbr26 = lookup_sorted_many(key_hi, key_lo, q_hi, q_lo, unique_queries=True)  # [26, cap]
    own = jnp.arange(cap, dtype=jnp.int32)
    center = jnp.where(valid, own, cap)
    nbr = jnp.concatenate([nbr26[:CENTER3], center[None, :], nbr26[CENTER3:]], axis=0)
    return nbr.T  # [cap, 27]


def build_down(coords_fine: jnp.ndarray, valid_fine: jnp.ndarray, cap_coarse: int):
    """Build the coarse level (``unique(coords >> 1)``) and the down/up pairing."""
    cap_fine = coords_fine.shape[0]
    uvc = unique_voxels(coords_fine >> 1, valid_fine, cap_coarse)
    parent = uvc.inverse  # [cap_fine], sentinel cap_coarse
    low_bits = coords_fine & 1
    pdelta = (low_bits[:, 0] << 2) | (low_bits[:, 1] << 1) | low_bits[:, 2]
    pdelta = jnp.where(valid_fine, pdelta, 0).astype(jnp.int32)
    fine_ids = jnp.arange(cap_fine, dtype=jnp.int32)
    child = jnp.full((cap_coarse + 1, K2), cap_fine, jnp.int32)
    tgt_row = jnp.where(valid_fine, parent, cap_coarse)
    child = child.at[tgt_row, pdelta].set(jnp.where(valid_fine, fine_ids, cap_fine))
    child = child[:cap_coarse]
    down = DownPlan(child=child, parent=parent.astype(jnp.int32), pdelta=pdelta)
    return uvc, down


def build_subm_nbr_batched(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Batched :func:`build_subm_nbr`: coords [B, cap, 3] -> nbr [B, cap, 27].

    All B x 26 offset streams fuse into ONE merge call (one Pallas launch — a
    launch costs ~0.6 ms on the tunneled backend, so per-frame mapping of the
    rulebook build was paying B x levels x 0.6 ms per batch)."""
    from lidal_tpu.ops.hashing import SENTINEL_KEY
    from lidal_tpu.ops.merge_lookup import lookup_sorted_grouped

    b, cap, _ = coords.shape
    key_hi, key_lo = pack_keys(coords, valid)  # [B, cap]
    offs = [o for o in OFFSETS3 if o != (0, 0, 0)]
    d_hi = jnp.asarray([(dx << 14) + dy for dx, dy, _ in offs], jnp.int32)  # [26]
    d_lo = jnp.asarray([dz for _, _, dz in offs], jnp.int32)
    q_hi = jnp.where(valid[:, None, :], key_hi[:, None, :] + d_hi[None, :, None], SENTINEL_KEY)
    q_lo = jnp.where(valid[:, None, :], key_lo[:, None, :] + d_lo[None, :, None], SENTINEL_KEY)
    t_hi = jnp.broadcast_to(key_hi[:, None, :], (b, len(offs), cap)).reshape(-1, cap)
    t_lo = jnp.broadcast_to(key_lo[:, None, :], (b, len(offs), cap)).reshape(-1, cap)
    nbr26 = lookup_sorted_grouped(
        t_hi, t_lo, q_hi.reshape(-1, cap), q_lo.reshape(-1, cap), unique_queries=True
    ).reshape(b, len(offs), cap)
    own = jnp.arange(cap, dtype=jnp.int32)
    center = jnp.where(valid, own[None, :], cap)
    nbr = jnp.concatenate([nbr26[:, :CENTER3], center[:, None, :], nbr26[:, CENTER3:]], axis=1)
    return nbr.transpose(0, 2, 1)  # [B, cap, 27]


def build_unet_plan_frame(
    coords0: jnp.ndarray, valid0: jnp.ndarray, caps: Sequence[int]
) -> UNetPlan:
    """Build the full multi-level plan for ONE frame.

    ``coords0``/``valid0`` must already be a *sorted unique* voxel set at level 0
    (the output of :func:`unique_voxels`); ``caps[0]`` must equal its capacity.
    """
    assert coords0.shape[0] == caps[0], (coords0.shape, caps)
    plan = build_unet_plan(coords0[None], valid0[None], caps)
    return jax.tree_util.tree_map(lambda x: x[0], plan)


def build_unet_plan(coords0: jnp.ndarray, valid0: jnp.ndarray, caps: Sequence[int]) -> UNetPlan:
    """Batched plan builder: the rulebook build fuses all frames x offsets into
    one merge per level; the coarsening (sort-based dedup) maps per frame.

    Args:
      coords0: [B, cap0, 3]; valid0: [B, cap0].
    """
    from lidal_tpu.ops.batching import map_frames

    levels = []
    downs = []
    b = coords0.shape[0]
    cur_coords, cur_valid = coords0, valid0
    # level 0 is pre-deduplicated by the caller; its overflow (if any) is
    # accounted by the pipeline from the point-voxelization result
    cur_overflow = jnp.zeros((b,), jnp.int32)
    for l, cap in enumerate(caps):
        nbr3 = build_subm_nbr_batched(cur_coords, cur_valid)
        num_valid = cur_valid.sum(axis=1).astype(jnp.int32)
        levels.append(
            LevelPlan(
                coords=cur_coords,
                valid=cur_valid,
                nbr3=nbr3,
                num_valid=num_valid,
                overflow=cur_overflow,
            )
        )
        if l + 1 < len(caps):
            uvc, down = map_frames(
                lambda c, v, cc=caps[l + 1]: build_down(c, v, cc), cur_coords, cur_valid
            )
            downs.append(down)
            cur_coords, cur_valid = uvc.coords, uvc.valid
            cur_overflow = (uvc.num_unique - uvc.valid.sum(axis=1)).astype(jnp.int32)
    return UNetPlan(levels=tuple(levels), downs=tuple(downs))
