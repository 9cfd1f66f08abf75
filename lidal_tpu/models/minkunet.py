"""MinkUNet: sparse 3D U-Net (reference ``network/minkunet.py:14-122``), TPU-native.

Channel plan cs = [32, 32, 64, 128, 256, 256, 128, 96, 96] (reference
``network/minkunet.py:19``).  Encoder: stem (2x conv3) + 4 stages of
{down ks=2 s=2, 2 residual blocks}; decoder: 4 stages of {transposed ks=2 s=2,
skip-concat, 2 residual blocks}; linear classifier.  Returns
``(logits, 96-d penultimate features)`` — the feature head feeds CSET/ReDAL
(reference ``score/prob_inference.py:97,116-118``).
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn
import jax.numpy as jnp

from lidal_tpu.models.layers import (
    ConvBlock,
    DownBlock,
    ResidualBlock,
    TorchLinear,
    UpBlock,
)
from lidal_tpu.ops.kernel_map import UNetPlan

CS = (32, 32, 64, 128, 256, 256, 128, 96, 96)


class MinkUNet(nn.Module):
    num_classes: int
    cs: Tuple[int, ...] = CS
    bn_axis: str | None = None  # mesh axis for sync-BN under data parallelism

    @nn.compact
    def __call__(self, feats: jnp.ndarray, plan: UNetPlan, train: bool = False):
        cs = self.cs
        ax = self.bn_axis
        lv = plan.levels
        dn = plan.downs

        # Stem: two conv3-BN-ReLU at level 0 (reference minkunet.py:22-26).
        x0 = ConvBlock(cs[0], ax)(feats, lv[0], train)
        x0 = ConvBlock(cs[0], ax)(x0, lv[0], train)

        def stage(x, i, c_out, level):
            x = DownBlock(self.cs[i], ax)(x, dn[i], level, train)
            x = ResidualBlock(c_out, ax)(x, level, train)
            x = ResidualBlock(c_out, ax)(x, level, train)
            return x

        x1 = stage(x0, 0, cs[1], lv[1])
        x2 = stage(x1, 1, cs[2], lv[2])
        x3 = stage(x2, 2, cs[3], lv[3])
        x4 = stage(x3, 3, cs[4], lv[4])

        def up(x, skip, i, c_out, level):
            x = UpBlock(c_out, ax)(x, dn[i], level, train)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResidualBlock(c_out, ax)(x, level, train)
            x = ResidualBlock(c_out, ax)(x, level, train)
            return x

        y1 = up(x4, x3, 3, cs[5], lv[3])
        y2 = up(y1, x2, 2, cs[6], lv[2])
        y3 = up(y2, x1, 1, cs[7], lv[1])
        y4 = up(y3, x0, 0, cs[8], lv[0])

        logits = TorchLinear(self.num_classes)(y4)
        logits = logits * lv[0].valid[..., None]
        return logits, y4
