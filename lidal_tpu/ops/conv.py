"""Sparse 3D convolution as gather + GEMM, with gather-based custom VJPs.

TPU-native replacement for torchsparse's gather-GEMM-scatter CUDA engine
(``spnn.Conv3d``, consumed throughout reference ``network/*``).  Key design:

* **Gather-only formulation.** Every map kind (see ``kernel_map.py``) is stored as
  "for each *output* voxel, which input voxel feeds kernel tap k" — so the forward
  is ``im2col-gather -> one MXU matmul`` and never scatters.  The backward w.r.t.
  inputs uses the *mirrored/paired* map, which is again a pure gather.  This keeps
  both passes deterministic (bitwise-reproducible selection rankings) and MXU-bound.
* **im2col to a single matmul.** 27 tiny ``[N,Cin]x[Cin,Cout]`` matmuls would run
  the 128x128 MXU at <=Cin/128 utilization; one ``[N, K*Cin] @ [K*Cin, Cout]``
  matmul keeps the contraction dimension large.
* Invalid output rows have all-sentinel maps, gather the appended zero row, and
  therefore emit exact zeros; no masking is needed inside the conv itself.

Weight layout: ``[K, Cin, Cout]`` with tap order defined by
``kernel_map.OFFSETS3`` / ``OFFSETS2`` (x-major products), for which tap ``K-1-k``
is the mirror (negation) of tap ``k``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lidal_tpu.ops.gather import take_rows
from lidal_tpu.ops.voxelize import append_zero_row

Array = jnp.ndarray


def _gather_im2col(feats: Array, nbr: Array) -> Array:
    """feats [capin, cin], nbr [capout, K] -> [capout, K*cin] (sentinel -> zeros).

    Each offset column of ``nbr`` is sorted and unique (merge positions of two
    sorted key streams, plus a sentinel tail), so the gathers take XLA's
    ``indices_are_sorted``/``unique_indices`` fast path per column.
    """
    fx = append_zero_row(feats)
    k = nbr.shape[1]
    cols = [take_rows(fx, nbr[:, j], sorted_unique=True) for j in range(k)]
    return jnp.stack(cols, axis=1).reshape(nbr.shape[0], -1)


# --------------------------------------------------------------------------------------
# Submanifold conv: odd kernel with mirrored tap order, stride 1,
# output coords == input coords (all the ks=3 stride=1 convs of the reference nets).
# --------------------------------------------------------------------------------------


# tri-state override for the Pallas forward: None = auto (TPU + aligned shapes)
USE_PALLAS: bool | None = None


def _pallas_ok(feats: Array, nbr: Array, groups: int) -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    if jax.default_backend() != "tpu":
        return False
    n = feats.shape[0]
    m, k = nbr.shape
    return n % 256 == 0 and m % 256 == 0 and k % groups == 0


def _conv_via_pallas(feats: Array, w: Array, nbr: Array, groups: int) -> Array:
    from lidal_tpu.ops.pallas_conv import subm_conv_pallas

    return subm_conv_pallas(feats, w, nbr, groups=groups).astype(feats.dtype)


def _up_nbr(parent: Array, pdelta: Array, k: int, cap_coarse: int) -> Array:
    """Expand (parent, pdelta) into a per-tap column map [cap_fine, K]:
    column d holds parent[f] where pdelta[f] == d, else the sentinel.  Columns
    stay sorted (parent is non-decreasing), so the banded kernel applies."""
    taps = jnp.arange(k, dtype=jnp.int32)[None, :]
    ok = (pdelta[:, None] == taps) & (parent[:, None] < cap_coarse)
    return jnp.where(ok, parent[:, None], cap_coarse).astype(jnp.int32)


@jax.custom_vjp
def subm_conv(feats: Array, w: Array, nbr: Array) -> Array:
    """out[i] = sum_k feats[nbr[i, k]] @ w[k].

    feats: [cap, cin]; w: [K, cin, cout]; nbr: [cap, K] (sentinel = cap).

    Forward dispatches to the Pallas banded gather-GEMM kernel on TPU (3-6x the
    XLA im2col path, bf16 MXU); the backward is always the gather-based XLA
    path (deterministic f32 custom VJP).
    """
    if _pallas_ok(feats, nbr, 3):
        return _conv_via_pallas(feats, w, nbr, groups=3)
    k, cin, cout = w.shape
    g = _gather_im2col(feats, nbr)
    return g @ w.reshape(k * cin, cout)


def _subm_conv_fwd(feats, w, nbr):
    return subm_conv(feats, w, nbr), (feats, w, nbr)


def _subm_conv_bwd(res, dy):
    feats, w, nbr = res
    k, cin, cout = w.shape
    # dX[j] = sum_k dY[nbr[j, K-1-k]] @ W[k]^T
    #       = sum_k' dY[nbr[j, k']] @ W[K-1-k']^T   (k' = K-1-k)
    w_flip_t = jnp.flip(w, axis=0).swapaxes(1, 2)  # [K, cout, cin]
    if _pallas_ok(dy, nbr, 3):
        # One banded pass for BOTH grads.  dW via the mirror identity
        # (nbr[i,k] == j  <=>  nbr[j,K-1-k] == i on the shared coord set):
        # dW[k] = sum_i X[nbr[i,k]]^T dY[i] = sum_j X[j]^T dY[nbr[j,K-1-k]].
        from lidal_tpu.ops.pallas_conv import conv_dx_dw_pallas

        dfeats, dwg = conv_dx_dw_pallas(dy, w_flip_t, nbr, feats, groups=3)
        dfeats = dfeats.astype(feats.dtype)
        dw = jnp.flip(dwg, axis=0)
    else:
        dfeats = (_gather_im2col(dy, nbr) @ w_flip_t.reshape(k * cout, cin)).astype(feats.dtype)
        # dW[k] = sum_i X[nbr[i, k]]^T dY[i]; invalid rows gather zeros on both sides.
        g = append_zero_row(feats)[nbr]  # [cap, K, cin]
        dw = jnp.einsum("ikc,io->kco", g, dy)
    return dfeats, dw.astype(w.dtype), None


subm_conv.defvjp(_subm_conv_fwd, _subm_conv_bwd)


# --------------------------------------------------------------------------------------
# Strided down conv: kernel 2, stride 2 (reference BasicConvolutionBlock ks=2 stride=2,
# network/utils.py:105-121).
# --------------------------------------------------------------------------------------


@jax.custom_vjp
def down_conv(feats: Array, w: Array, child: Array, parent: Array, pdelta: Array) -> Array:
    """out[o] = sum_d feats[child[o, d]] @ w[d].

    feats: [cap_fine, cin]; w: [8, cin, cout]; child: [cap_coarse, 8];
    parent/pdelta: [cap_fine] (used only by the backward).
    """
    k, cin, cout = w.shape
    if _pallas_ok(feats, child, 2):
        return _conv_via_pallas(feats, w, child, groups=2)
    g = _gather_im2col(feats, child)
    return g @ w.reshape(k * cin, cout)


def _down_conv_fwd(feats, w, child, parent, pdelta):
    return down_conv(feats, w, child, parent, pdelta), (feats, w, child, parent, pdelta)


def _down_conv_bwd(res, dy):
    feats, w, child, parent, pdelta = res
    # dX[f] = dY[parent[f]] @ W[pdelta[f]]^T: the up-conv gather structure.
    if _pallas_ok(dy, child, 2) and parent.shape[0] % 256 == 0:
        # child[o, d] == f  <=>  nbr_up[f, d] == o, so the SAME banded pass
        # yields dW[d] = sum_o X[child[o,d]]^T dY[o] = sum_f X[f]^T dY[nbr_up[f,d]].
        from lidal_tpu.ops.pallas_conv import conv_dx_dw_pallas

        nbr_up = _up_nbr(parent, pdelta, w.shape[0], dy.shape[0])
        dfeats, dw = conv_dx_dw_pallas(dy, w.swapaxes(1, 2), nbr_up, feats, groups=2)
        dfeats = dfeats.astype(feats.dtype)
    else:
        dyx = append_zero_row(dy)  # [capc+1, cout]
        tmp = jnp.einsum("no,dco->dnc", dyx, w)  # [8, capc+1, cin]
        dfeats = tmp[pdelta, parent].astype(feats.dtype)  # [capf, cin]
        # dW[d] = sum_o X[child[o, d]]^T dY[o]
        g = append_zero_row(feats)[child]  # [capc, 8, cin]
        dw = jnp.einsum("okc,oi->kci", g, dy)
    return dfeats, dw.astype(w.dtype), None, None, None


down_conv.defvjp(_down_conv_fwd, _down_conv_bwd)


# --------------------------------------------------------------------------------------
# Transposed up conv: kernel 2, stride 2 (reference BasicDeconvolutionBlock,
# network/utils.py:124-139), restoring the cached finer coordinate set.
# --------------------------------------------------------------------------------------


@jax.custom_vjp
def up_conv(feats: Array, w: Array, child: Array, parent: Array, pdelta: Array) -> Array:
    """out[f] = feats[parent[f]] @ w[pdelta[f]].

    feats: [cap_coarse, cin]; w: [8, cin, cout]; parent: [cap_fine] (sentinel
    cap_coarse); pdelta: [cap_fine]; child: [cap_coarse, 8] (used by the backward).

    On TPU this routes through the banded Pallas kernel with the pairing
    expanded to a per-tap column map; off-TPU it is 8 coarse-grid matmuls
    followed by one gather (MXU work proportional to the coarse voxel count).
    """
    if _pallas_ok(feats, child, 2) and parent.shape[0] % 256 == 0:
        nbr_up = _up_nbr(parent, pdelta, w.shape[0], feats.shape[0])
        return _conv_via_pallas(feats, w, nbr_up, groups=2)
    fx = append_zero_row(feats)  # [capc+1, cin]
    tmp = jnp.einsum("nc,dco->dno", fx, w)  # [8, capc+1, cout]
    return tmp[pdelta, parent]


def _up_conv_fwd(feats, w, child, parent, pdelta):
    return up_conv(feats, w, child, parent, pdelta), (feats, w, child, parent, pdelta)


def _up_conv_bwd(res, dy):
    feats, w, child, parent, pdelta = res
    k, cin, cout = w.shape
    # dX[c] = sum_{f: parent[f]=c} dY[f] @ W[pdelta[f]]^T — the down-conv gather.
    if _pallas_ok(dy, child, 2):
        # (parent[f]=c, pdelta[f]=d)  <=>  child[c, d] == f, so
        # dW[d] = sum_f X[parent[f], pdelta=d]^T dY[f] = sum_c X[c]^T dY[child[c,d]].
        from lidal_tpu.ops.pallas_conv import conv_dx_dw_pallas

        dfeats, dw = conv_dx_dw_pallas(dy, w.swapaxes(1, 2), child, feats, groups=2)
        dfeats = dfeats.astype(feats.dtype)
    else:
        g = _gather_im2col(dy, child)  # [capc, 8*cout]
        dfeats = (g @ w.swapaxes(1, 2).reshape(k * cout, cin)).astype(feats.dtype)
        # dW[d] = sum_{f: pdelta[f]=d} X[parent[f]]^T dY[f]
        fp = append_zero_row(feats)[parent]  # [capf, cin]; sentinel rows -> zeros
        onehot = jax.nn.one_hot(pdelta, k, dtype=dy.dtype) * (parent < feats.shape[0])[:, None]
        dw = jnp.einsum("fd,fc,fo->dco", onehot, fp, dy)
    return dfeats, dw.astype(w.dtype), None, None, None


up_conv.defvjp(_up_conv_fwd, _up_conv_bwd)


# --------------------------------------------------------------------------------------
# Fused conv + BN(+ReLU) inference entries.  Eval-mode BatchNorm is a per-channel
# affine of the conv output (y = acc * scale + shift, scale/shift folded from the
# running stats); fusing it into the kernel's output store removes one full
# elementwise HBM round-trip per conv (~26 convs per MinkUNet forward).  The
# reference gets this from torchsparse's fused BN/ReLU modules; these entries are
# inference-only (training BN needs batch statistics of the conv output) and are
# not differentiated, so no custom_vjp.
# --------------------------------------------------------------------------------------


def _conv_bn_eval(feats, w, nbr, scale, shift, relu: bool, groups: int) -> Array:
    if _pallas_ok(feats, nbr, groups):
        from lidal_tpu.ops.pallas_conv import subm_conv_pallas

        return subm_conv_pallas(
            feats, w, nbr, groups=groups, scale=scale, shift=shift, relu=relu
        ).astype(feats.dtype)
    k, cin, cout = w.shape
    y = (_gather_im2col(feats, nbr) @ w.reshape(k * cin, cout)) * scale + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    row_ok = (nbr.min(axis=1) < feats.shape[0]).astype(y.dtype)
    return (y * row_ok[:, None]).astype(feats.dtype)


def subm_conv_bn_batched(x, w, nbr, scale, shift, relu: bool = False) -> Array:
    b, n, c = x.shape
    out = _conv_bn_eval(x.reshape(b * n, c), w, _flatten_nbr(nbr, n), scale, shift, relu, 3)
    return out.reshape(b, n, -1)


def down_conv_bn_batched(x, w, child, scale, shift, relu: bool = False) -> Array:
    b, nf, c = x.shape
    nc = child.shape[1]
    out = _conv_bn_eval(x.reshape(b * nf, c), w, _flatten_nbr(child, nf), scale, shift, relu, 2)
    return out.reshape(b, nc, -1)


def up_conv_bn_batched(x, w, parent, pdelta, scale, shift, relu: bool = False) -> Array:
    b, nc, c = x.shape
    nf = parent.shape[1]
    nbr_up = _up_nbr(
        _flatten_idx(parent, nc), pdelta.reshape(b * nf), w.shape[0], b * nc
    )
    out = _conv_bn_eval(x.reshape(b * nc, c), w, nbr_up, scale, shift, relu, 2)
    return out.reshape(b, nf, -1)


# --------------------------------------------------------------------------------------
# Batched wrappers: flatten the frame axis into ONE op call.  A Pallas kernel
# launch costs ~0.6 ms on the tunneled backend; per-frame mapping multiplied
# that by B for every conv.  Frame tables concatenate with index offsets; each
# frame's sentinel (== its cap) maps to the global sentinel (B * cap), which
# band masking treats identically.  Tiles never straddle frames (caps are
# multiples of the tile size), so band locality is preserved.
# --------------------------------------------------------------------------------------


def _flatten_nbr(nbr: Array, cap_src: int) -> Array:
    b, m, k = nbr.shape
    off = (jnp.arange(b, dtype=jnp.int32) * cap_src)[:, None, None]
    return jnp.where(nbr < cap_src, nbr + off, b * cap_src).reshape(b * m, k)


def _flatten_idx(idx: Array, cap_src: int) -> Array:
    b, m = idx.shape
    off = (jnp.arange(b, dtype=jnp.int32) * cap_src)[:, None]
    return jnp.where(idx < cap_src, idx + off, b * cap_src).reshape(b * m)


def subm_conv_batched(x: Array, w: Array, nbr: Array) -> Array:
    """x [B, cap, cin], nbr [B, cap, K] -> [B, cap, cout]."""
    b, n, c = x.shape
    out = subm_conv(x.reshape(b * n, c), w, _flatten_nbr(nbr, n))
    return out.reshape(b, n, -1)


def down_conv_batched(x: Array, w: Array, child: Array, parent: Array, pdelta: Array) -> Array:
    """x [B, capf, cin], child [B, capc, 8], parent/pdelta [B, capf]."""
    b, nf, c = x.shape
    nc = child.shape[1]
    out = down_conv(
        x.reshape(b * nf, c),
        w,
        _flatten_nbr(child, nf),
        _flatten_idx(parent, nc),
        pdelta.reshape(b * nf),
    )
    return out.reshape(b, nc, -1)


def up_conv_batched(x: Array, w: Array, child: Array, parent: Array, pdelta: Array) -> Array:
    """x [B, capc, cin], child [B, capc, 8], parent/pdelta [B, capf]."""
    b, nc, c = x.shape
    nf = parent.shape[1]
    out = up_conv(
        x.reshape(b * nc, c),
        w,
        _flatten_nbr(child, nf),
        _flatten_idx(parent, nc),
        pdelta.reshape(b * nf),
    )
    return out.reshape(b, nf, -1)
