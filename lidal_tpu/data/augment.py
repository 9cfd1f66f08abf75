"""On-device augmentation + voxelization.

Reproduces the reference's per-frame pipeline (``dataset/sk_dataset.py:143-169``)
with jax.random instead of numpy RNG (distributionally identical, sequence not
bitwise — augmentation is stochastic by design):

1. random affine ``I + 0.1 * N(0,1)^{3x3}`` with random x-flip and a random
   z-rotation (applied from the right: ``coords @ (A @ Rz)``),
2. point features = [augmented xyz (pre-scale), intensity],
3. scale by 20 (0.05 m voxels), random-translate into the ``[0, 8192)^3`` grid,
4. truncate to int voxel coords and dedup keeping the first point's feature.

Runs under jit and vmaps over frames/views — the 8-view score batching of
``score/prob_inference.py:107-118`` becomes a vmapped leading axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidal_tpu.ops.voxelize import UniqueVoxels, unique_voxels


class VoxelizedFrame(NamedTuple):
    uv: UniqueVoxels  # voxel table (coords/valid/first_src/inverse/counts)
    feats: jnp.ndarray  # [cap0, 4] voxel features (first point's [xyz_aug, sig])
    point_valid: jnp.ndarray  # [P] bool — input mask & in-grid & not overflowed


def augment_and_voxelize(
    key: jax.Array,
    xyz: jnp.ndarray,  # [P, 3] float32 raw sensor coords (padded)
    sig: jnp.ndarray,  # [P] float32 intensity
    valid: jnp.ndarray,  # [P] bool
    cap0: int,
    scale: float = 20.0,
    full_scale: int = 8192,
    augment: bool = True,
) -> VoxelizedFrame:
    p = xyz.shape[0]
    if augment:
        k_aff, k_flip, k_rot, k_t1, k_t2 = jax.random.split(key, 5)
        trans = jnp.eye(3) + jax.random.normal(k_aff, (3, 3)) * 0.1
        flip = jax.random.randint(k_flip, (), 0, 2) * 2 - 1
        trans = trans.at[0, 0].multiply(flip.astype(trans.dtype))
        theta = jax.random.uniform(k_rot) * 2.0 * jnp.pi
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.stack(
            [
                jnp.stack([c, s, 0.0 * c]),
                jnp.stack([-s, c, 0.0 * c]),
                jnp.array([0.0, 0.0, 1.0]),
            ]
        )
        m = trans @ rot
        xyz_aug = xyz @ m
    else:
        k_t1 = k_t2 = key
        xyz_aug = xyz

    feats_p = jnp.concatenate([xyz_aug, sig[:, None]], axis=1).astype(jnp.float32)

    coords = xyz_aug * scale
    big = jnp.float32(1e30)
    cmin = jnp.min(jnp.where(valid[:, None], coords, big), axis=0)
    cmax = jnp.max(jnp.where(valid[:, None], coords, -big), axis=0)
    span = jnp.float32(full_scale) - (cmax - cmin)
    if augment:
        r1 = jax.random.uniform(k_t1, (3,))
        r2 = jax.random.uniform(k_t2, (3,))
    else:
        r1 = r2 = jnp.full((3,), 0.5)
    offset = (
        -cmin
        + jnp.clip(span - 0.001, 0.0, None) * r1
        + jnp.clip(span + 0.001, None, 0.0) * r2
    )
    coords = coords + offset

    # The reference asserts all points land in-grid (sk_dataset.py:160-161); we mask
    # out-of-grid points instead (can only happen when a frame spans > 409 m).
    in_grid = (coords.min(axis=1) >= 0) & (coords.max(axis=1) < full_scale)
    pvalid = valid & in_grid

    coords_v = coords.astype(jnp.int32)  # trunc == floor for non-negative
    uv = unique_voxels(coords_v, pvalid, cap0)
    feats_v = jnp.where(uv.valid[:, None], feats_p[uv.first_src], 0.0)
    point_valid = pvalid & (uv.inverse < cap0)
    return VoxelizedFrame(uv=uv, feats=feats_v, point_valid=point_valid)
