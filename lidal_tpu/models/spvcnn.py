"""SPVCNN: sparse point-voxel CNN (reference ``network/spvcnn.py:9-155``), TPU-native.

Same U-Net trunk as MinkUNet plus a point branch: trilinear devoxelize at strides
16 and 4, MLP point transforms with residual fusion, point->voxel re-injection with
dropout before up1/up3, and a point-level classifier.  Returns
``(logits, 96-d point features)``.

See ``ops/devoxelize.py`` for why the "points" here are the level-0 voxels
(identity ``initial_voxelize``, SURVEY.md quirk 6).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lidal_tpu.models.layers import (
    ConvBlock,
    DownBlock,
    MaskedBatchNorm,
    ResidualBlock,
    TorchLinear,
    UpBlock,
)
from lidal_tpu.models.minkunet import CS
from lidal_tpu.ops.devoxelize import (
    PointPlan,
    devoxelize_trilinear_batched,
    point_to_voxel_avg_batched,
)
from lidal_tpu.ops.kernel_map import UNetPlan


class PerFrameDropout(nn.Module):
    """Dropout whose mask is drawn per FRAME from an explicit [B]-keys array.

    The reference's DDP draws per-rank masks (torch per-process RNG), so a
    run's masks depend on how frames land on devices.  Deriving each frame's
    mask from its own key makes the data-parallel step bit-identical to the
    single-device step for any device count — the same layout-invariance the
    sync-BN choice buys (docs/PARITY.md item 1); the per-frame augment keys
    shard with the frames, so they are the natural key source."""

    rate: float

    @nn.compact
    def __call__(self, x, frame_keys, train: bool):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        mask = jax.vmap(lambda k, xf: jax.random.bernoulli(k, keep, xf.shape))(frame_keys, x)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class PointTransform(nn.Module):
    """Linear -> BatchNorm1d -> ReLU on point features (reference spvcnn.py:85-101)."""

    features: int
    axis: str | None = None

    @nn.compact
    def __call__(self, x, valid, train: bool):
        x = TorchLinear(self.features)(x)
        x = MaskedBatchNorm(axis=self.axis)(x, valid, train)
        return jax.nn.relu(x)


class SPVCNN(nn.Module):
    num_classes: int
    cs: Tuple[int, ...] = CS
    dropout_rate: float = 0.3
    bn_axis: str | None = None  # mesh axis for sync-BN under data parallelism

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        plan: UNetPlan,
        pplan: PointPlan,
        train: bool = False,
        dropout_keys: jnp.ndarray | None = None,  # [B] per-frame keys; see PerFrameDropout
    ):
        cs = self.cs
        ax = self.bn_axis
        lv = plan.levels
        dn = plan.downs
        valid0 = lv[0].valid

        tri = devoxelize_trilinear_batched

        # Stem at level 0; z0 = voxel_to_point at stride 1 == identity (spvcnn.py:116-120).
        x0 = ConvBlock(cs[0], ax)(feats, lv[0], train)
        x0 = ConvBlock(cs[0], ax)(x0, lv[0], train)
        z0 = x0

        def stage(x, i, c_out, level):
            x = DownBlock(self.cs[i], ax)(x, dn[i], level, train)
            x = ResidualBlock(c_out, ax)(x, level, train)
            x = ResidualBlock(c_out, ax)(x, level, train)
            return x

        # point_to_voxel(x0, z0) is identity at stride 1 (spvcnn.py:122).
        x1 = stage(z0, 0, cs[1], lv[1])
        x2 = stage(x1, 1, cs[2], lv[2])
        x3 = stage(x2, 2, cs[3], lv[3])
        x4 = stage(x3, 3, cs[4], lv[4])

        # z1 = voxel_to_point(x4) + point_transforms[0](z0)  (spvcnn.py:127-128)
        z1 = tri(x4, pplan.tri4) + PointTransform(cs[4], ax)(z0, valid0, train)

        def up(x, skip, i, c_out, level):
            x = UpBlock(c_out, ax)(x, dn[i], level, train)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResidualBlock(c_out, ax)(x, level, train)
            x = ResidualBlock(c_out, ax)(x, level, train)
            return x

        def drop(x, site):
            if dropout_keys is not None:
                fkeys = jax.vmap(lambda k: jax.random.fold_in(k, site))(dropout_keys)
                return PerFrameDropout(self.dropout_rate)(x, fkeys, train)
            return nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        # y1 = point_to_voxel(x4, z1) -> dropout -> up1 (spvcnn.py:130-134)
        y1 = point_to_voxel_avg_batched(z1, dn, pplan.avg4, levels=4)
        y1 = drop(y1, 1)
        y1 = up(y1, x3, 3, cs[5], lv[3])
        y2 = up(y1, x2, 2, cs[6], lv[2])

        # z2 = voxel_to_point(y2) + point_transforms[1](z1)  (spvcnn.py:139-140)
        z2 = tri(y2, pplan.tri2) + PointTransform(cs[6], ax)(z1, valid0, train)

        # y3 = point_to_voxel(y2, z2) -> dropout -> up3 (spvcnn.py:142-146)
        y3 = point_to_voxel_avg_batched(z2, dn, pplan.avg2, levels=2)
        y3 = drop(y3, 2)
        y3 = up(y3, x1, 1, cs[7], lv[1])
        y4 = up(y3, x0, 0, cs[8], lv[0])

        # z3 = voxel_to_point(y4) (identity at stride 1) + point_transforms[2](z2)
        z3 = y4 + PointTransform(cs[8], ax)(z2, valid0, train)

        logits = TorchLinear(self.num_classes)(z3)
        logits = logits * valid0[..., None]
        return logits, z3
