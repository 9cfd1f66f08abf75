"""Pallas fused gather-GEMM sparse convolution (the hot kernel).

XLA's row gather runs ~16x below HBM bandwidth, and the im2col formulation
reads 27x the feature bytes.  This kernel exploits the *banded* structure of the
rulebook: output voxels are sorted x-major, every offset column of ``nbr`` is
sorted, and the 27 taps cluster into 3 groups by their x-offset (x is the
most-significant sort key, so a group's source indices for an output tile span a
small contiguous band).  Per grid step and group it:

1. reads the group's precomputed band [block_lo, n_blocks] (scalar prefetch),
2. DMAs each 256-row feature block HBM -> VMEM once (dynamic trip count),
3. "gathers" rows with one-hot matmuls on the MXU (Mosaic has no dynamic VMEM
   indexing: ``onehot[T, TN] @ block[TN, C]`` IS the gather, in bf16),
4. immediately contracts with the per-tap weights, accumulating in f32.

Sentinel indices (== n) fall outside every band block, match no one-hot row,
and contribute exact zeros — same semantics as the XLA path's zero row.

Tap order contract: ``kernel_map.OFFSETS3`` is an x-major product, so taps
[0..9), [9..18), [18..27) have x-offset -1, 0, +1 respectively.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256  # output rows per grid step
TILE_N = 256  # feature-table rows per DMA block
GROUP = 9  # taps per x-offset group (kernel-3); kernel-2 maps use 1 group


def _make_kernel(k: int, cin: int, cin_pad: int, cout: int, groups: int):
    gsize = k // groups

    def _kernel(lo_ref, nb_ref, nbr_ref, w_ref, feats_hbm, out_ref, scratch, sem):
        t = pl.program_id(0)
        nbr_tile = nbr_ref[:]  # [T, K] int32
        # one-hot rows laid out t-major (t*gsize + k), so the gathered matrix
        # reshapes to [T, gsize*cin] with NO transpose for the tap contraction
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, TILE_N), 1)
        acc0 = jnp.zeros((TILE_M, cout), jnp.float32)

        def group_acc(g, acc_g):
            lo = lo_ref[t, g]
            nblocks = nb_ref[t, g]
            # w for the group's taps, flattened to [gsize*cin, cout]
            wg = (
                w_ref[g * gsize : (g + 1) * gsize].astype(jnp.bfloat16).reshape(
                    gsize * cin, cout
                )
            )
            locals_g = nbr_tile[:, g * gsize : (g + 1) * gsize]  # [T, gsize]

            def body(bi, acc):
                block = lo + bi
                copy = pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(block * TILE_N, TILE_N)], scratch, sem
                )
                copy.start()
                copy.wait()
                blk = scratch[:, :cin].astype(jnp.bfloat16)  # [TN, cin]
                # k-major stacking: per-tap one-hots concatenated along rows
                # (sublane concat is Mosaic-legal; interleaved reshapes are not)
                onehot2 = jnp.concatenate(
                    [
                        (locals_g[:, j][:, None] - block * TILE_N == iota_n).astype(
                            jnp.bfloat16
                        )
                        for j in range(gsize)
                    ],
                    axis=0,
                )  # [gsize*T, TN]
                # ONE big gather-matmul for all taps of the group (M = gsize*T)
                gth = jnp.dot(onehot2, blk, preferred_element_type=jnp.float32)
                gb = gth.astype(jnp.bfloat16)
                # tap contraction: static contiguous row slices
                for j in range(gsize):
                    acc = acc + jnp.dot(
                        gb[j * TILE_M : (j + 1) * TILE_M],
                        wg[j * cin : (j + 1) * cin],
                        preferred_element_type=jnp.float32,
                    )
                return acc

            return jax.lax.fori_loop(0, nblocks, body, acc_g)

        acc = acc0
        for g in range(groups):  # static: per-group tap ranges must be static
            acc = group_acc(g, acc)
        out_ref[:] = acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def subm_conv_pallas(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    nbr: jnp.ndarray,
    groups: int = 3,
    interpret: bool = False,
):
    """out[i] = sum_k feats[nbr[i,k]] @ w[k]; feats [n, cin] (sentinel index = n,
    simply out of band), w [K, cin, cout], nbr [m, K] with every column sorted
    and taps grouped contiguously by x-offset.  m, n multiples of 256."""
    n, cin = feats.shape
    m, k = nbr.shape
    assert m % TILE_M == 0 and n % TILE_N == 0, (m, n)
    assert k % groups == 0, (k, groups)
    tiles = m // TILE_M
    gsize = k // groups

    # per-(tile, group) bands over real (non-sentinel) indices
    big = jnp.int32(2**30)
    masked_lo = jnp.where(nbr < n, nbr, big).reshape(tiles, TILE_M, groups, gsize)
    masked_hi = jnp.where(nbr < n, nbr, -1).reshape(tiles, TILE_M, groups, gsize)
    tile_min = masked_lo.min(axis=(1, 3))  # [tiles, groups]
    tile_max = masked_hi.max(axis=(1, 3))
    lo = jnp.where(tile_min == big, 0, tile_min // TILE_N).astype(jnp.int32)
    nb = jnp.where(tile_max < 0, 0, tile_max // TILE_N - lo + 1).astype(jnp.int32)

    cin_orig = cin
    cin_pad = -(-cin // 128) * 128  # HBM DMA slices must be 128-lane aligned
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda t, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, w.shape[2]), lambda t, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_N, cin_pad), feats.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = _make_kernel(k, cin_orig, cin_pad, w.shape[2], groups)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, w.shape[2]), jnp.float32),
        interpret=interpret,
    )(lo, nb, nbr, w, feats)
