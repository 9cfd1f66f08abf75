"""Banded Pallas weighted 8-tap gather (the SPVCNN point-branch hot op).

TPU-native engine for torchsparse's point<->voxel transfers (reference
``network/utils.py:38-102``): trilinear ``spdevoxelize`` is
``out[p] = sum_d w8[p, d] * F[idx8[p, d]]`` and ``spvoxelize`` averaging
decomposes into chained child-tree sums (see ``ops/devoxelize.py``) — both are
8-tap gathers with per-(row, tap) scalar weights.

XLA's formulation (``fx[idx8]`` + einsum) materializes a [cap0, 8, c] gather —
~1 GB of slow-path gather traffic per frame at c=256 — which made SPVCNN run
9x slower than MinkUNet.  This kernel reuses the banded structure of the conv
engine (``ops/pallas_conv.py``): map columns are sorted, taps group by their
leading offset bit, so a tile's sources live in a small contiguous band.
Per (tile, group, block): build a 0/1 one-hot per tap (the gather is an MXU
matmul against the DMA'd feature block, exact in bf16 feature precision) and
apply the f32 weight column immediately — full f32 weight precision, no
[m, 8, c] intermediate, no weight fold.

Weights ride VMEM as a [m, 8] f32 tile operand; sentinel indices (== n) fall
outside every band and contribute exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidal_tpu.ops.pallas_conv import band_bounds

TILE_M = 256
TILE_N = 256


def _make_kernel(k: int, c: int, groups: int):
    gsize = k // groups

    def _kernel(lo_ref, nb_ref, nbr_ref, w8_ref, feats_hbm, out_ref, heads, tails, hsem, tsem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        nbr_tile = nbr_ref[:]  # [T, K] int32
        w8_tile = w8_ref[:]  # [T, K] f32
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, TILE_N), 1)
        acc = jnp.zeros((TILE_M, c), jnp.float32)

        def head_dma(g, tt):
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(lo_ref[g, tt] * TILE_N, TILE_N)],
                heads.at[g, jax.lax.rem(tt, 2)],
                hsem.at[g, jax.lax.rem(tt, 2)],
            )

        @pl.when(t == 0)
        def _():
            for g0 in range(groups):

                @pl.when(nb_ref[g0, 0] > 0)
                def _(g0=g0):
                    head_dma(g0, 0).start()

        for g in range(groups):
            lo = lo_ref[g, t]
            nblocks = nb_ref[g, t]
            locals_g = nbr_tile[:, g * gsize : (g + 1) * gsize]
            tnext = jnp.minimum(t + 1, nt - 1)

            @pl.when((t + 1 < nt) & (nb_ref[g, tnext] > 0))
            def _(g=g, tnext=tnext):
                head_dma(g, tnext).start()

            def tail_dma(bi, lo=lo):
                slot = (bi - 1) & 1
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds((lo + bi) * TILE_N, TILE_N)],
                    tails.at[slot],
                    tsem.at[slot],
                )

            @pl.when(nblocks > 1)
            def _(tail_dma=tail_dma):
                tail_dma(1).start()

            def body(bi, acc, g=g, lo=lo, nblocks=nblocks, locals_g=locals_g, tail_dma=tail_dma):
                @pl.when((bi >= 1) & (bi + 1 < nblocks))
                def _():
                    tail_dma(bi + 1).start()

                @pl.when(bi == 0)
                def _():
                    head_dma(g, t).wait()

                @pl.when(bi > 0)
                def _():
                    tail_dma(bi).wait()

                hblk = heads[g, jax.lax.rem(t, 2)][:, :c]
                tblk = tails[(bi - 1) & 1][:, :c]
                blk = jnp.where(bi == 0, hblk, tblk)  # [TN, c] bf16

                for j in range(gsize):
                    jj = g * gsize + j
                    oh = (locals_g[:, j][:, None] - (lo + bi) * TILE_N == iota_n).astype(
                        jnp.bfloat16
                    )
                    part = jax.lax.dot_general(
                        oh,
                        blk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [T, c]: the gathered rows, exact bf16 features
                    acc = acc + w8_tile[:, jj][:, None] * part
                return acc

            acc = jax.lax.fori_loop(0, nblocks, body, acc)
        out_ref[:] = acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def gather8_pallas(
    feats: jnp.ndarray,  # [n, c] float
    nbr: jnp.ndarray,  # [m, K] int32, columns sorted, sentinel = n
    w8: jnp.ndarray,  # [m, K] f32 per-(row, tap) weights
    groups: int = 2,
    interpret: bool = False,
):
    """out[i] = sum_k w8[i, k] * feats[nbr[i, k]]; returns [m, c] f32."""
    n, c = feats.shape
    m, k = nbr.shape
    assert m % TILE_M == 0 and n % TILE_N == 0, (m, n)
    assert k % groups == 0, (k, groups)
    tiles = m // TILE_M

    lo, nb = band_bounds(nbr, n, groups)
    feats = feats.astype(jnp.bfloat16)
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        feats = jnp.pad(feats, ((0, 0), (0, c_pad - c)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE_M, c), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups, 2, TILE_N, c_pad), feats.dtype),
            pltpu.VMEM((2, TILE_N, c_pad), feats.dtype),
            pltpu.SemaphoreType.DMA((groups, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_kernel(k, c, groups)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
        interpret=interpret,
    )(lo, nb, nbr, w8, feats)


# --------------------------------------------------------------------------------------
# Transposed kernel: the backward of gather8 as a banded gather-sum (no scatter).
#
#   dfeats[t] = sum_{(i, k): nbr[i, k] == t} w8[i, k] * dy[i]
#
# Because every nbr column is (near-)sorted, the positions i contributing to a
# 256-row output tile form a narrow contiguous band per tap.  Per (tile, tap,
# block) the kernel builds a WEIGHTED one-hot — ohw[r, j] = (col[j] == t0 + r)
# ? w8[j] : 0 — and contracts it with the DMA'd dy block on the MXU.  This
# replaces the XLA backward's [m, 8, c] materialized cotangent + scatter-add
# (~1 GB and a slow-path scatter per SPVCNN devoxelize at SemanticKITTI
# scale) with the same banded structure the forward uses, keeping the whole
# training hot path gather-only and deterministic.
#
# Precision: w8 and dy stage in bf16 for the MXU (f32 accumulation) — same
# staging as the conv backward (docs/PARITY.md divergence 7); the XLA path
# remains f32-exact and is the oracle in tests.
# --------------------------------------------------------------------------------------

# tri-state override for the Pallas backward: None = auto (TPU + aligned shapes)
USE_PALLAS_BWD: bool | None = None


def transpose_band_bounds(nbr: jnp.ndarray, n: int):
    """Per-(tap, output-tile) covering block bands of the TRANSPOSED map.

    For tap k and output tile t (rows [t*TILE_M, (t+1)*TILE_M) of the result),
    the band is the smallest [lo, lo+nb) range of TILE_N-position blocks whose
    column values intersect the tile's row range.  Scatter-free: per-block
    value min/max (one reshape reduction) + a [K, tiles, nblocks] interval
    cover.  Gaps inside a covering band only cost compares, never correctness.

    Returns (lo [K, tiles], nb [K, tiles]) int32.
    """
    m, k = nbr.shape
    tiles = n // TILE_M
    nblocks = m // TILE_N
    colb = nbr.T.reshape(k, nblocks, TILE_N)
    real = colb < n  # sentinel == n never matches an output row
    bmin = jnp.where(real, colb, 2**30).min(axis=2)  # [K, nblocks]
    bmax = jnp.where(real, colb, -1).max(axis=2)
    t0 = (jnp.arange(tiles, dtype=jnp.int32) * TILE_M)[None, :, None]
    inter = (bmin[:, None, :] < t0 + TILE_M) & (bmax[:, None, :] >= t0)  # [K, T, B]
    any_ = inter.any(axis=2)
    lo = jnp.argmax(inter, axis=2).astype(jnp.int32)
    hi = (nblocks - 1 - jnp.argmax(inter[:, :, ::-1], axis=2)).astype(jnp.int32)
    nb = jnp.where(any_, hi - lo + 1, 0).astype(jnp.int32)
    lo = jnp.where(any_, lo, 0)
    return lo, nb


def _make_scatter_kernel(k: int, c: int, n: int):
    def _kernel(lo_ref, nb_ref, colT_ref, w8T_ref, dy_hbm, out_ref, heads, tails, hsem, tsem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, TILE_N), 0) + t * TILE_M
        acc = jnp.zeros((TILE_M, c), jnp.float32)

        def head_dma(g, tt):
            return pltpu.make_async_copy(
                dy_hbm.at[pl.ds(lo_ref[g, tt] * TILE_N, TILE_N)],
                heads.at[g, jax.lax.rem(tt, 2)],
                hsem.at[g, jax.lax.rem(tt, 2)],
            )

        @pl.when(t == 0)
        def _():
            for g0 in range(k):

                @pl.when(nb_ref[g0, 0] > 0)
                def _(g0=g0):
                    head_dma(g0, 0).start()

        for g in range(k):
            lo = lo_ref[g, t]
            nblocks = nb_ref[g, t]
            tnext = jnp.minimum(t + 1, nt - 1)

            @pl.when((t + 1 < nt) & (nb_ref[g, tnext] > 0))
            def _(g=g, tnext=tnext):
                head_dma(g, tnext).start()

            def tail_dma(bi, lo=lo):
                slot = (bi - 1) & 1
                return pltpu.make_async_copy(
                    dy_hbm.at[pl.ds((lo + bi) * TILE_N, TILE_N)],
                    tails.at[slot],
                    tsem.at[slot],
                )

            @pl.when(nblocks > 1)
            def _(tail_dma=tail_dma):
                tail_dma(1).start()

            def body(bi, acc, g=g, lo=lo, nblocks=nblocks, tail_dma=tail_dma):
                @pl.when((bi >= 1) & (bi + 1 < nblocks))
                def _():
                    tail_dma(bi + 1).start()

                @pl.when(bi == 0)
                def _():
                    head_dma(g, t).wait()

                @pl.when(bi > 0)
                def _():
                    tail_dma(bi).wait()

                hblk = heads[g, jax.lax.rem(t, 2)][:, :c]
                tblk = tails[(bi - 1) & 1][:, :c]
                blk = jnp.where(bi == 0, hblk, tblk)  # [TN, c] bf16 dy rows
                pos0 = (lo + bi) * TILE_N
                colv = colT_ref[g : g + 1, pl.ds(pos0, TILE_N)]  # [1, TN] i32
                w8v = w8T_ref[g : g + 1, pl.ds(pos0, TILE_N)]  # [1, TN] f32
                # weighted one-hot: the transpose-gather AND the weight apply
                # in one [T, TN] build + one MXU contraction
                ohw = jnp.where(colv == rows, w8v, 0.0).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    ohw,
                    blk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T, c]
                return acc + part

            acc = jax.lax.fori_loop(0, nblocks, body, acc)
        out_ref[:] = acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def scatter8_pallas(
    dy: jnp.ndarray,  # [m, c] cotangent rows
    nbr: jnp.ndarray,  # [m, K] int32 (near-sorted columns, sentinel = n)
    w8: jnp.ndarray,  # [m, K] f32
    n: int,
    interpret: bool = False,
):
    """dfeats[t] = sum_{i,k: nbr[i,k]==t} w8[i,k] * dy[i]; returns [n, c] f32."""
    m, c = dy.shape
    mk, k = nbr.shape
    assert mk == m and m % TILE_N == 0 and n % TILE_M == 0, (m, n)
    tiles = n // TILE_M

    lo, nb = transpose_band_bounds(nbr, n)
    dy = dy.astype(jnp.bfloat16)
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        dy = jnp.pad(dy, ((0, 0), (0, c_pad - c)))
    colT = nbr.T  # [K, m]: whole-VMEM resident, dynamically sliced per block
    w8T = w8.astype(jnp.float32).T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # colT whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w8T whole
            pl.BlockSpec(memory_space=pl.ANY),  # dy stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE_M, c), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, 2, TILE_N, c_pad), dy.dtype),
            pltpu.VMEM((2, TILE_N, c_pad), dy.dtype),
            pltpu.SemaphoreType.DMA((k, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_scatter_kernel(k, c, n)
    from lidal_tpu.ops.pallas_conv import _VMEM_LIMIT

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(lo, nb, colT, w8T, dy)


def _scatter_pallas_ok(n: int, m: int) -> bool:
    if USE_PALLAS_BWD is not None:
        return USE_PALLAS_BWD
    return jax.default_backend() == "tpu" and n % TILE_M == 0 and m % TILE_N == 0


@jax.custom_vjp
def gather8(feats: jnp.ndarray, nbr: jnp.ndarray, w8: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wrapper around the kernel (SPVCNN trains through the
    point branch).  d/dfeats is the transposed weighted gather-sum — the
    banded ``scatter8_pallas`` kernel on TPU, an XLA scatter-add elsewhere;
    the weight cotangent is ZERO by contract — map weights are plan data,
    never parameters (callers stop-gradient semantics)."""
    return gather8_pallas(feats, nbr, w8)


def _gather8_fwd(feats, nbr, w8):
    return gather8(feats, nbr, w8), (nbr, w8, feats.shape[0])


def _gather8_bwd(res, dy):
    nbr, w8, n = res
    if _scatter_pallas_ok(n, nbr.shape[0]):
        return scatter8_pallas(dy, nbr, w8, n).astype(dy.dtype), None, jnp.zeros_like(w8)
    contrib = w8[:, :, None].astype(dy.dtype) * dy[:, None, :]  # [m, 8, c]
    dfeats = jnp.zeros((n, dy.shape[-1]), dy.dtype).at[nbr].add(contrib, mode="drop")
    return dfeats, None, jnp.zeros_like(w8)


gather8.defvjp(_gather8_fwd, _gather8_bwd)
