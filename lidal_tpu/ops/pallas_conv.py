"""Pallas fused gather-GEMM sparse convolution (the hot kernel).

XLA's row gather runs ~16x below HBM bandwidth, and the im2col formulation
reads 27x the feature bytes.  This kernel exploits the *banded* structure of the
rulebook: output voxels are sorted x-major, every offset column of ``nbr`` is
sorted, and the taps cluster into groups by their x-offset (x is the
most-significant sort key, so a group's source indices for an output tile span a
small contiguous band).  Per grid step and group it:

1. reads the group's precomputed band [block_lo, n_blocks] (scalar prefetch),
2. DMAs each 256-row feature block HBM -> VMEM, double-buffered so the next
   block's transfer overlaps the current block's MXU work,
3. folds the per-tap weights FIRST: ``bw_j = block @ w_j`` ([TN, cout] per tap,
   tiny matmuls), stacking taps along rows -> ``BW [gsize*TN, cout]``,
4. "gathers + contracts" in ONE wide MXU matmul: ``onehot3 [T, gsize*TN] @ BW``
   (Mosaic has no dynamic VMEM indexing: the one-hot matmul IS the gather, and
   with weights pre-folded its contraction dim is gsize*TN = 2304, keeping the
   128x128 systolic array busy), accumulating in f32.

Sentinel indices (== n) fall outside every band block, match no one-hot column,
and contribute exact zeros — same semantics as the XLA path's zero row.

Tap order contract: ``kernel_map.OFFSETS3`` is an x-major product, so taps
[0..9), [9..18), [18..27) have x-offset -1, 0, +1 respectively (groups=3);
``OFFSETS2`` splits as [0..4) x-offset 0 and [4..8) x-offset 1 (groups=2).

The same kernel serves every conv in the network (see ``ops/conv.py``):
subm (nbr [cap, 27], groups=3), down (child [cap_coarse, 8], groups=2), up
(parent expanded to a per-tap column map [cap_fine, 8], groups=2), and the
input-gradient passes of all three (mirrored/paired maps, same structure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256  # output rows per grid step
TILE_N = 256  # feature-table rows per DMA block

# Wide convs (e.g. post-concat 384-channel ResidualBlocks) carry VMEM-resident
# whole-weight operands + (for the backward) a whole-dW accumulator; the
# default 16 MiB scoped-vmem budget OOMs there.  v5e has 128 MiB of VMEM.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _make_kernel(k: int, cin: int, cout: int, groups: int, epilogue: bool = False,
                 relu: bool = False, n_src: int = 0):
    gsize = k // groups

    def _kernel(lo_ref, nb_ref, nbr_ref, w_ref, *rest):
        if epilogue:
            scale_ref, shift_ref, feats_hbm, out_ref, heads, tails, hsem, tsem = rest
        else:
            feats_hbm, out_ref, heads, tails, hsem, tsem = rest
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        nbr_tile = nbr_ref[:]  # [T, K] int32
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, TILE_N), 1)
        acc = jnp.zeros((TILE_M, cout), jnp.float32)

        def head_dma(g, tt):
            # block 0 of (tile tt, group g) into the tile-parity head slot
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(lo_ref[g, tt] * TILE_N, TILE_N)],
                heads.at[g, jax.lax.rem(tt, 2)],
                hsem.at[g, jax.lax.rem(tt, 2)],
            )

        # cold start: this tile's heads (all groups) — every later tile's heads
        # were prefetched by its predecessor, so only tile 0 pays the latency
        @pl.when(t == 0)
        def _():
            for g0 in range(groups):

                @pl.when(nb_ref[g0, 0] > 0)
                def _(g0=g0):
                    head_dma(g0, 0).start()

        for g in range(groups):  # static: per-group tap ranges must be static
            lo = lo_ref[g, t]
            nblocks = nb_ref[g, t]
            locals_g = nbr_tile[:, g * gsize : (g + 1) * gsize]  # [T, gsize]
            wg = w_ref[g * gsize : (g + 1) * gsize].astype(jnp.bfloat16)

            # prefetch the NEXT tile's head for this group: it has the whole
            # remainder of this tile to land (the per-(tile, group) block-0
            # stall was the kernel's dominant cost at ~2.5 blocks per band)
            tnext = jnp.minimum(t + 1, nt - 1)

            @pl.when((t + 1 < nt) & (nb_ref[g, tnext] > 0))
            def _(g=g, tnext=tnext):
                head_dma(g, tnext).start()

            def tail_dma(bi, lo=lo):
                # blocks >= 1 ride a 2-slot ring: block bi -> slot (bi-1) & 1
                slot = (bi - 1) & 1
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds((lo + bi) * TILE_N, TILE_N)],
                    tails.at[slot],
                    tsem.at[slot],
                )

            @pl.when(nblocks > 1)
            def _(tail_dma=tail_dma):
                tail_dma(1).start()

            def body(bi, acc, g=g, lo=lo, nblocks=nblocks, locals_g=locals_g, wg=wg, tail_dma=tail_dma):
                @pl.when((bi >= 1) & (bi + 1 < nblocks))
                def _():
                    tail_dma(bi + 1).start()

                @pl.when(bi == 0)
                def _():
                    head_dma(g, t).wait()

                @pl.when(bi > 0)
                def _():
                    tail_dma(bi).wait()

                hblk = heads[g, jax.lax.rem(t, 2)][:, :cin]
                tblk = tails[(bi - 1) & 1][:, :cin]  # & keeps bi=0 in range (unselected)
                blk = jnp.where(bi == 0, hblk, tblk)  # [TN, cin] bf16
                # fold weights per tap: ONE batched MXU op -> [gsize, TN, cout]
                bw = jax.lax.dot_general(
                    jnp.broadcast_to(blk[None], (gsize, TILE_N, cin)),
                    wg,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                # per-tap one-hot "gathers" batched on the tap axis
                # (int32 compares: Mosaic does not lower packed bf16 cmpf)
                onehot = jnp.stack(
                    [
                        (locals_g[:, j][:, None] - (lo + bi) * TILE_N == iota_n).astype(
                            jnp.bfloat16
                        )
                        for j in range(gsize)
                    ],
                    axis=0,
                )  # [gsize, T, TN]
                part = jax.lax.dot_general(
                    onehot,
                    bw,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [gsize, T, cout]
                return acc + part.sum(axis=0)

            acc = jax.lax.fori_loop(0, nblocks, body, acc)
        if epilogue:
            # fused BN(+ReLU) epilogue: per-channel affine of the f32
            # accumulator, in-register — saves the separate elementwise
            # HBM round-trip per conv.  Invalid rows (all-sentinel maps,
            # acc == 0) are re-zeroed so masking semantics match the
            # unfused path (a row is valid iff any tap is real: the subm
            # center / >=1 child / the up parent).
            y = acc * scale_ref[:] + shift_ref[:]
            if relu:
                y = jnp.maximum(y, 0.0)
            row_ok = (jnp.min(nbr_tile, axis=1, keepdims=True) < n_src).astype(jnp.float32)
            out_ref[:] = y * row_ok
        else:
            out_ref[:] = acc

    return _kernel


def _make_dx_dw_kernel(k: int, c_src: int, c_dst: int, c_f: int, groups: int):
    """Combined backward kernel: per-tap banded gather of ``src`` feeding BOTH
    the input gradient (apply w2 per tap) and the weight gradient
    (f_tile^T @ gathered per tap, accumulated over tiles in a VMEM-resident
    output).  The one-hot gather — the dominant VPU cost — is paid ONCE for
    both gradients; the old XLA dW path materialized a [m, K, cin] row gather
    (multi-GB per conv at SemanticKITTI scale)."""
    gsize = k // groups

    def _kernel(
        lo_ref, nb_ref, nbr_ref, w_ref, f_ref, src_hbm, dx_ref, dw_ref, heads, tails, hsem, tsem
    ):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        nbr_tile = nbr_ref[:]  # [T, K] int32
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, TILE_N), 1)
        acc = jnp.zeros((TILE_M, c_dst), jnp.float32)
        # f arrives PRE-TRANSPOSED [c_f, T]: the dW contraction then runs in
        # native MXU orientation (lhs lanes x rhs sublanes).  Contracting the
        # sublane dim of both operands made Mosaic relayout per (block, tap)
        # and the compile never terminated.
        f_t = f_ref[:]  # [c_f, T] bf16
        f_b = jnp.broadcast_to(f_t[None], (gsize, c_f, TILE_M))

        @pl.when(t == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        def head_dma(g, tt):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(lo_ref[g, tt] * TILE_N, TILE_N)],
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
            wg = w_ref[g * gsize : (g + 1) * gsize].astype(jnp.bfloat16)  # [gsize, c_src, c_dst]
            tnext = jnp.minimum(t + 1, nt - 1)

            @pl.when((t + 1 < nt) & (nb_ref[g, tnext] > 0))
            def _(g=g, tnext=tnext):
                head_dma(g, tnext).start()

            def tail_dma(bi, lo=lo):
                slot = (bi - 1) & 1
                return pltpu.make_async_copy(
                    src_hbm.at[pl.ds((lo + bi) * TILE_N, TILE_N)],
                    tails.at[slot],
                    tsem.at[slot],
                )

            @pl.when(nblocks > 1)
            def _(tail_dma=tail_dma):
                tail_dma(1).start()

            def body(bi, carry, g=g, lo=lo, nblocks=nblocks, locals_g=locals_g, wg=wg, tail_dma=tail_dma):
                acc, acc_dw = carry

                @pl.when((bi >= 1) & (bi + 1 < nblocks))
                def _():
                    tail_dma(bi + 1).start()

                @pl.when(bi == 0)
                def _():
                    head_dma(g, t).wait()

                @pl.when(bi > 0)
                def _():
                    tail_dma(bi).wait()

                hblk = heads[g, jax.lax.rem(t, 2)][:, :c_src]
                tblk = tails[(bi - 1) & 1][:, :c_src]
                blk = jnp.where(bi == 0, hblk, tblk)  # [TN, c_src] bf16
                onehot = jnp.stack(
                    [
                        (locals_g[:, j][:, None] - (lo + bi) * TILE_N == iota_n).astype(
                            jnp.bfloat16
                        )
                        for j in range(gsize)
                    ],
                    axis=0,
                )  # [gsize, T, TN]
                gathered = jax.lax.dot_general(
                    onehot,
                    jnp.broadcast_to(blk[None], (gsize, TILE_N, c_src)),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # [gsize, T, c_src]: per-tap src rows
                part = jax.lax.dot_general(
                    gathered,
                    wg,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [gsize, T, c_dst]
                dwp = jax.lax.dot_general(
                    f_b,
                    gathered,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [gsize, c_f, c_src]
                return acc + part.sum(axis=0), acc_dw + dwp

            acc, acc_dw = jax.lax.fori_loop(
                0, nblocks, body, (acc, jnp.zeros((gsize, c_f, c_src), jnp.float32))
            )
            # one static-slice RMW per (tile, group) — keeping the RMW out of
            # the fori_loop body (Mosaic compile blew up on in-loop ref updates
            # to the grid-revisited output block)
            dw_ref[g * gsize : (g + 1) * gsize] += acc_dw
        dx_ref[:] = acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def conv_dx_dw_pallas(
    src: jnp.ndarray,  # [n, c_src] (dy of the forward conv)
    w2: jnp.ndarray,  # [K, c_src, c_dst] (transposed/flipped weights)
    nbr: jnp.ndarray,  # [m, K] banded map, sentinel = n
    f: jnp.ndarray,  # [m, c_f] (forward input features at the map's rows)
    groups: int,
    interpret: bool = False,
):
    """One banded pass producing BOTH backward products:

      dx[i]  = sum_k src[nbr[i, k]] @ w2[k]                    -> [m, c_dst] f32
      dwg[k] = sum_i f[i]^T src[nbr[i, k]]                     -> [K, c_f, c_src] f32

    Callers recover dW from ``dwg`` via the mirror/pairing identity of their
    map (subm: dW[k] = dwg[K-1-k]; down/up: dW[d] = dwg[d]) — see ops/conv.py.
    """
    n, c_src = src.shape
    m, k = nbr.shape
    assert m % TILE_M == 0 and n % TILE_N == 0, (m, n)
    assert k % groups == 0, (k, groups)
    assert f.shape[0] == m, (f.shape, m)
    tiles = m // TILE_M
    c_dst = w2.shape[2]
    c_f = f.shape[1]

    lo, nb = band_bounds(nbr, n, groups)

    src = src.astype(jnp.bfloat16)
    c_src_pad = -(-c_src // 128) * 128
    if c_src_pad != c_src:
        src = jnp.pad(src, ((0, 0), (0, c_src_pad - c_src)))
    f = f.astype(jnp.bfloat16).T  # pre-transposed [c_f, m]; see kernel note
    w2 = w2.astype(jnp.bfloat16)  # VMEM-resident whole: halve its footprint

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2, whole
            pl.BlockSpec((c_f, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, c_dst), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            # dW accumulator: one block revisited by every grid step
            pl.BlockSpec((k, c_f, c_src), lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((groups, 2, TILE_N, c_src_pad), src.dtype),
            pltpu.VMEM((2, TILE_N, c_src_pad), src.dtype),
            pltpu.SemaphoreType.DMA((groups, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_dx_dw_kernel(k, c_src, c_dst, c_f, groups)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, c_dst), jnp.float32),
            jax.ShapeDtypeStruct((k, c_f, c_src), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(lo, nb, nbr, w2, f, src)


def band_bounds(nbr: jnp.ndarray, n: int, groups: int):
    """Per-(tile, group) block bands over real (non-sentinel) indices.

    Returns (lo [groups, tiles] first block id, nb [groups, tiles] block count)
    — groups-major so the SMEM-prefetched scalars pad along tiles, not lanes.
    """
    m, k = nbr.shape
    tiles = m // TILE_M
    gsize = k // groups
    big = jnp.int32(2**30)
    masked_lo = jnp.where(nbr < n, nbr, big).reshape(tiles, TILE_M, groups, gsize)
    masked_hi = jnp.where(nbr < n, nbr, -1).reshape(tiles, TILE_M, groups, gsize)
    tile_min = masked_lo.min(axis=(1, 3)).T  # [groups, tiles]
    tile_max = masked_hi.max(axis=(1, 3)).T
    lo = jnp.where(tile_min == big, 0, tile_min // TILE_N).astype(jnp.int32)
    nb = jnp.where(tile_max < 0, 0, tile_max // TILE_N - lo + 1).astype(jnp.int32)
    return lo, nb


@functools.partial(jax.jit, static_argnames=("groups", "relu", "interpret"))
def subm_conv_pallas(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    nbr: jnp.ndarray,
    groups: int = 3,
    scale: jnp.ndarray | None = None,  # [cout] f32: fused BN epilogue
    shift: jnp.ndarray | None = None,  # [cout] f32
    relu: bool = False,
    interpret: bool = False,
):
    """out[i] = sum_k feats[nbr[i,k]] @ w[k]; feats [n, cin] (sentinel index = n,
    simply out of band), w [K, cin, cout], nbr [m, K] with every column sorted
    and taps grouped contiguously by x-offset.  m, n multiples of 256.

    With ``scale``/``shift`` the kernel applies a fused per-channel affine
    (+ optional ReLU, + row-validity mask) before the output store — the
    inference-mode BN epilogue without a separate HBM pass."""
    n, cin = feats.shape
    m, k = nbr.shape
    assert m % TILE_M == 0 and n % TILE_N == 0, (m, n)
    assert k % groups == 0, (k, groups)
    epilogue = scale is not None
    assert epilogue == (shift is not None)
    tiles = m // TILE_M
    cout = w.shape[2]

    lo, nb = band_bounds(nbr, n, groups)

    # bf16 feature table in HBM: halves the (dominant) band-DMA traffic; the
    # MXU consumes bf16 anyway and accumulation stays f32.
    feats = feats.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)  # kernel consumed bf16 anyway; halve VMEM residency
    cin_pad = -(-cin // 128) * 128  # HBM DMA slices must be 128-lane aligned
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))

    ep_specs = (
        [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale [1, cout]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift [1, cout]
        ]
        if epilogue
        else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda t, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
        ]
        + ep_specs
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, cout), lambda t, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((groups, 2, TILE_N, cin_pad), feats.dtype),  # head blocks
            pltpu.VMEM((2, TILE_N, cin_pad), feats.dtype),  # tail ring
            pltpu.SemaphoreType.DMA((groups, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_kernel(k, cin, cout, groups, epilogue=epilogue, relu=relu, n_src=n)
    args = [lo, nb, nbr, w]
    if epilogue:
        args += [
            scale.astype(jnp.float32).reshape(1, cout),
            shift.astype(jnp.float32).reshape(1, cout),
        ]
    args.append(feats)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*args)
