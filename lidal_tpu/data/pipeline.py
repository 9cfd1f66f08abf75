"""Batch preparation: augment -> voxelize -> plan, all jitted on device.

Replaces the reference's CPU DataLoader workers + collate (``sk_dataset.py:188-242``):
instead of concatenating ragged frames with a batch-index column, frames keep a
fixed per-frame capacity and the batch is a leading axis — the natural layout for
sharding over a device mesh and for the MXU (uniform shapes, no recompiles).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from lidal_tpu.data.augment import augment_and_voxelize
from lidal_tpu.ops.devoxelize import PointPlan, build_point_plan
from lidal_tpu.ops.kernel_map import UNetPlan, build_unet_plan

IGNORE_LABEL = 255


class TrainBatch(NamedTuple):
    feats: jnp.ndarray  # [B, cap0, 4]
    labels: jnp.ndarray  # [B, cap0] int32 (IGNORE_LABEL on invalid/ignored)
    plan: UNetPlan
    pplan: Optional[PointPlan]
    overflow: jnp.ndarray  # [B, levels] int32 unique voxels dropped per level


def plan_overflow(plan: UNetPlan, uv_num_unique, uv_valid) -> jnp.ndarray:
    """[B, levels] dropped-voxel counts; level 0 from the point voxelization.

    The reference gets exactness for free from torch dynamic shapes
    (``sk_dataset.py:163-169``); static capacities must be MONITORED instead —
    drivers log nonzero counts and the e2e tests assert zero."""
    lvl0 = (uv_num_unique - uv_valid.sum(axis=1)).astype(jnp.int32)
    rest = [lv.overflow for lv in plan.levels[1:]]
    return jnp.stack([lvl0] + rest, axis=1)


class EvalBatch(NamedTuple):
    feats: jnp.ndarray  # [B, cap0, 4]
    plan: UNetPlan
    pplan: Optional[PointPlan]
    inverse: jnp.ndarray  # [B, P] point -> voxel (sentinel cap0)
    point_valid: jnp.ndarray  # [B, P]
    overflow: jnp.ndarray  # [B, levels] int32 unique voxels dropped per level


@partial(jax.jit, static_argnames=("level_caps", "scale", "full_scale", "with_points", "augment"))
def prepare_train_batch(
    keys: jax.Array,  # [B] PRNG keys
    xyz: jnp.ndarray,  # [B, P, 3]
    sig: jnp.ndarray,  # [B, P]
    valid: jnp.ndarray,  # [B, P]
    labels_p: jnp.ndarray,  # [B, P] int32 (already remapped; IGNORE on pad)
    level_caps: Tuple[int, ...],
    scale: float = 20.0,
    full_scale: int = 8192,
    with_points: bool = False,
    augment: bool = True,
) -> TrainBatch:
    vf = jax.vmap(
        lambda k, x, s, v: augment_and_voxelize(
            k, x, s, v, level_caps[0], scale, full_scale, augment
        )
    )(keys, xyz, sig, valid)
    plan = build_unet_plan(vf.uv.coords, vf.uv.valid, level_caps)
    pplan = build_point_plan(plan) if with_points else None
    # Voxel label = first point's label (np.unique keep-first, sk_dataset.py:167-171).
    labels_v = jnp.take_along_axis(labels_p, vf.uv.first_src, axis=1)
    labels_v = jnp.where(vf.uv.valid, labels_v, IGNORE_LABEL).astype(jnp.int32)
    return TrainBatch(
        feats=vf.feats,
        labels=labels_v,
        plan=plan,
        pplan=pplan,
        overflow=plan_overflow(plan, vf.uv.num_unique, vf.uv.valid),
    )


@partial(jax.jit, static_argnames=("level_caps", "scale", "full_scale", "with_points", "augment"))
def prepare_eval_batch(
    keys: jax.Array,
    xyz: jnp.ndarray,
    sig: jnp.ndarray,
    valid: jnp.ndarray,
    level_caps: Tuple[int, ...],
    scale: float = 20.0,
    full_scale: int = 8192,
    with_points: bool = False,
    augment: bool = True,
) -> EvalBatch:
    """Eval/score batches keep the point->voxel inverse for projecting voxel logits
    back to points (reference ``evaluate.py:104-107``).  Note the reference applies
    random augmentation in val/score modes too (``sk_dataset.py:143-161`` has no
    mode branch) — multi-view inference depends on it."""
    vf = jax.vmap(
        lambda k, x, s, v: augment_and_voxelize(
            k, x, s, v, level_caps[0], scale, full_scale, augment
        )
    )(keys, xyz, sig, valid)
    plan = build_unet_plan(vf.uv.coords, vf.uv.valid, level_caps)
    pplan = build_point_plan(plan) if with_points else None
    return EvalBatch(
        feats=vf.feats,
        plan=plan,
        pplan=pplan,
        inverse=vf.uv.inverse,
        point_valid=vf.point_valid,
        overflow=plan_overflow(plan, vf.uv.num_unique, vf.uv.valid),
    )


def pad_points(xyz, sig, labels, point_cap: int):
    """Host-side: pad/trim one frame's raw arrays to the fixed point capacity.

    Returns numpy arrays (xyz [P,3] f32, sig [P] f32, valid [P] bool,
    labels [P] int32 with IGNORE on padding; labels may be None).
    """
    import numpy as np

    n = min(len(xyz), point_cap)
    oxyz = np.zeros((point_cap, 3), np.float32)
    osig = np.zeros((point_cap,), np.float32)
    ovalid = np.zeros((point_cap,), bool)
    olab = np.full((point_cap,), IGNORE_LABEL, np.int32)
    oxyz[:n] = xyz[:n]
    osig[:n] = sig[:n]
    ovalid[:n] = True
    if labels is not None:
        olab[:n] = labels[:n]
    return oxyz, osig, ovalid, olab
