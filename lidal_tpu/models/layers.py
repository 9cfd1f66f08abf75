"""Sparse network building blocks.

Functional equivalents of the reference's torchsparse blocks
(``BasicConvolutionBlock`` / ``BasicDeconvolutionBlock`` / ``ResidualBlock``,
reference ``network/utils.py:105-172``), built on the gather-GEMM conv ops.

All blocks operate on batched fixed-capacity arrays ``[B, cap, C]`` plus the plan
pytree from ``ops.kernel_map``; convs flatten the frame axis into ONE kernel
call (per-frame mapping paid a ~0.6 ms Pallas launch per frame per conv) while
BatchNorm reduces over the whole masked batch (matching torch ``BatchNorm1d``
over the concatenated voxel axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from lidal_tpu.ops.conv import (
    down_conv_batched,
    down_conv_bn_batched,
    subm_conv_batched,
    subm_conv_bn_batched,
    up_conv_batched,
    up_conv_bn_batched,
)
from lidal_tpu.ops.kernel_map import DownPlan, LevelPlan


def conv_kernel_init(k: int):
    """Uniform(-b, b) with b = 1/sqrt(K * cin) — torch kaiming_uniform(a=sqrt(5))
    fan-in convention for conv weights."""

    def init(key, shape, dtype=jnp.float32):
        _, cin, _ = shape
        b = 1.0 / jnp.sqrt(jnp.asarray(k * cin, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -b, b)

    return init


class SubMConv3(nn.Module):
    """Kernel-3 stride-1 submanifold conv (spnn.Conv3d ks=3 s=1).

    ``epilogue = (scale, shift, relu)`` fuses the inference-mode BN affine
    (+ ReLU + validity mask) into the conv kernel's output store."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, level: LevelPlan, epilogue=None) -> jnp.ndarray:
        k = level.nbr3.shape[-1]
        w = self.param("w", conv_kernel_init(k), (k, x.shape[-1], self.features))
        if epilogue is not None:
            a, b, relu = epilogue
            return subm_conv_bn_batched(x, w, level.nbr3, a, b, relu)
        return subm_conv_batched(x, w, level.nbr3)


class Conv1x1(nn.Module):
    """Kernel-1 conv == per-voxel linear, no bias (spnn.Conv3d ks=1)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("w", conv_kernel_init(1), (1, x.shape[-1], self.features))
        return x @ w[0]


class DownConv2(nn.Module):
    """Kernel-2 stride-2 conv (spnn.Conv3d ks=2 s=2)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, down: DownPlan, epilogue=None) -> jnp.ndarray:
        w = self.param("w", conv_kernel_init(8), (8, x.shape[-1], self.features))
        if epilogue is not None:
            a, b, relu = epilogue
            return down_conv_bn_batched(x, w, down.child, a, b, relu)
        return down_conv_batched(x, w, down.child, down.parent, down.pdelta)


class UpConv2(nn.Module):
    """Kernel-2 stride-2 transposed conv (spnn.Conv3d ks=2 s=2 transposed=True)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, down: DownPlan, epilogue=None) -> jnp.ndarray:
        w = self.param("w", conv_kernel_init(8), (8, x.shape[-1], self.features))
        if epilogue is not None:
            a, b, relu = epilogue
            return up_conv_bn_batched(x, w, down.parent, down.pdelta, a, b, relu)
        return up_conv_batched(x, w, down.child, down.parent, down.pdelta)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid voxels of the whole batch.

    Matches torch semantics: biased variance for normalization, unbiased for the
    running estimate, ``running = (1 - momentum) * running + momentum * batch``.
    With ``axis`` set (data-parallel shard_map), batch statistics psum over the
    mesh axis — sync-BN, so a sharded step equals the single-device step
    exactly; the reference's per-GPU BN (DDP without SyncBatchNorm) is a
    documented divergence.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    axis: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray | None,
        valid: jnp.ndarray,
        train: bool,
        fused_affine: bool = False,
        feat: int | None = None,
    ) -> jnp.ndarray:
        """Normal mode: normalize ``x``.  ``fused_affine`` (inference only):
        return the folded per-channel ``(scale, shift)`` so the caller can fuse
        BN into the preceding conv kernel's epilogue; ``feat`` supplies the
        channel count (x may be None).  Both modes create identical variables."""
        feat = x.shape[-1] if x is not None else feat
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        if fused_affine:
            assert not train, "fused BN affine is an inference-only path"
            a = scale * jax.lax.rsqrt(ra_var.value + self.eps)
            return a, bias - ra_mean.value * a

        if train:
            m = valid.astype(jnp.float32)[..., None]
            cnt = m.sum()
            xs = (x.astype(jnp.float32) * m).sum(tuple(range(x.ndim - 1)))
            if self.axis is not None:
                cnt = jax.lax.psum(cnt, self.axis)
                xs = jax.lax.psum(xs, self.axis)
            cnt = jnp.maximum(cnt, 1.0)
            xf = x.astype(jnp.float32)
            mean = xs / cnt
            v_local = (jnp.square(xf - mean) * m).sum(tuple(range(x.ndim - 1)))
            if self.axis is not None:
                v_local = jax.lax.psum(v_local, self.axis)
            var = v_local / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return (y * valid[..., None]).astype(x.dtype)


class ConvBlock(nn.Module):
    """conv ks=3 s=1 -> BN -> ReLU (reference BasicConvolutionBlock with ks=3).

    Inference fuses BN + ReLU into the conv kernel's epilogue (one HBM pass)."""

    features: int
    axis: str | None = None

    @nn.compact
    def __call__(self, x, level: LevelPlan, train: bool):
        conv = SubMConv3(self.features)
        bn = MaskedBatchNorm(axis=self.axis)
        if not train:
            a, b = bn(None, level.valid, train, fused_affine=True, feat=self.features)
            return conv(x, level, epilogue=(a, b, True))
        return jax.nn.relu(bn(conv(x, level), level.valid, train))


class DownBlock(nn.Module):
    """conv ks=2 s=2 -> BN -> ReLU (reference BasicConvolutionBlock ks=2 stride=2)."""

    features: int
    axis: str | None = None

    @nn.compact
    def __call__(self, x, down: DownPlan, out_level: LevelPlan, train: bool):
        conv = DownConv2(self.features)
        bn = MaskedBatchNorm(axis=self.axis)
        if not train:
            a, b = bn(None, out_level.valid, train, fused_affine=True, feat=self.features)
            return conv(x, down, epilogue=(a, b, True))
        return jax.nn.relu(bn(conv(x, down), out_level.valid, train))


class UpBlock(nn.Module):
    """transposed conv ks=2 s=2 -> BN -> ReLU (reference BasicDeconvolutionBlock)."""

    features: int
    axis: str | None = None

    @nn.compact
    def __call__(self, x, down: DownPlan, out_level: LevelPlan, train: bool):
        conv = UpConv2(self.features)
        bn = MaskedBatchNorm(axis=self.axis)
        if not train:
            a, b = bn(None, out_level.valid, train, fused_affine=True, feat=self.features)
            return conv(x, down, epilogue=(a, b, True))
        return jax.nn.relu(bn(conv(x, down), out_level.valid, train))


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + (identity | 1x1 conv-BN) -> ReLU
    (reference ResidualBlock, network/utils.py:142-172; always stride 1 here).

    Inference fuses both conv+BN pairs (the first also fuses its ReLU); the
    1x1 shortcut's affine stays in XLA, which fuses it into the matmul."""

    features: int
    axis: str | None = None

    @nn.compact
    def __call__(self, x, level: LevelPlan, train: bool):
        conv1 = SubMConv3(self.features)
        bn1 = MaskedBatchNorm(axis=self.axis)
        conv2 = SubMConv3(self.features)
        bn2 = MaskedBatchNorm(axis=self.axis)
        if not train:
            a1, b1 = bn1(None, level.valid, train, fused_affine=True, feat=self.features)
            y = conv1(x, level, epilogue=(a1, b1, True))
            a2, b2 = bn2(None, level.valid, train, fused_affine=True, feat=self.features)
            y = conv2(y, level, epilogue=(a2, b2, False))
        else:
            y = jax.nn.relu(bn1(conv1(x, level), level.valid, train))
            y = bn2(conv2(y, level), level.valid, train)
        if x.shape[-1] == self.features:
            sc = x
        else:
            sc = Conv1x1(self.features)(x)
            sc = MaskedBatchNorm(axis=self.axis)(sc, level.valid, train)
        return jax.nn.relu(y + sc)


class TorchLinear(nn.Module):
    """nn.Linear with torch's default uniform(-1/sqrt(fan_in)) init for both w and b."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        b = 1.0 / jnp.sqrt(jnp.asarray(cin, jnp.float32))
        w = self.param(
            "w", lambda k, s: jax.random.uniform(k, s, jnp.float32, -b, b), (cin, self.features)
        )
        y = x @ w
        if self.use_bias:
            bias = self.param(
                "b", lambda k, s: jax.random.uniform(k, s, jnp.float32, -b, b), (self.features,)
            )
            y = y + bias
        return y
