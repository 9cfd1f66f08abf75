"""Pallas banded candidate-scan kernel for hash-grid nearest neighbors.

The LiDAL scorer matches every query point against a pose-registered neighbor
frame's cell-sorted point table: per query, NINE probes (dx, dy) each scan one
contiguous z-run of up to 18 candidate rows located by merge lower bounds
(``active/nn_match.py``).  Round 1 did the scan with 9 x 18 XLA row gathers —
~8 s per frame against 24 neighbors, the scoring bottleneck.

The kernel exploits the same banded structure as the sparse conv: queries are
cell-sorted, so each probe's candidate starts are non-decreasing, and a tile of
256 queries draws its candidates from a narrow band of the sorted table.
Structure (v2 — v1 ran one probe per grid step with synchronous DMA and a
static 18-slot scan, ~73 ms per neighbor):

* grid = (query tile, dx-group): the 3 probes sharing a dx offset have nearly
  identical bands, so they share ONE DMA stream per block;
* block DMA is double-buffered with a cross-step head prefetch (the conv
  kernel's pattern) — block-0 latency is only paid once per launch;
* the slot scan is CHUNKED (6 slots) with a dynamic trip count from the
  group's longest run: typical LiDAR runs need one chunk, not three;
* per chunk and probe, the 6 slot "gathers" are one batched one-hot f32
  matmul (exact row copies — a one-hot row has a single 1.0, so even
  split-precision accumulation reproduces the coordinates bit-exactly).

Candidates of different probes live in DISJOINT cells, so the probe-processing
order only affects exact d2 ties between distinct points (measure-zero on
float coords; the sklearn tie order is already a documented divergence).
Out-of-band candidates gather zeros but are masked by the block-membership
check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # queries per grid step
TN = 256  # table rows per DMA block
NPROBE = 9
NGROUP = 3  # probes per dx group
CHUNK = 6  # candidate slots per scan chunk


def _make_kernel(run: int):
    nchunk_max = -(-run // CHUNK)

    def _kernel(
        lo_ref, nb_ref, rmax_ref, st_ref, en_ref, q_ref, gxyz_hbm,
        d2_ref, bi_ref, heads, tails, hsem, tsem,
    ):
        t = pl.program_id(0)
        g2 = pl.program_id(1)
        nt = pl.num_programs(0)
        lin = t * NGROUP + g2

        @pl.when(g2 == 0)
        def _():
            d2_ref[0] = jnp.full((1, TILE), jnp.inf, jnp.float32)
            bi_ref[0] = jnp.zeros((1, TILE), jnp.int32)

        def head_dma(slot, lo):
            return pltpu.make_async_copy(
                gxyz_hbm.at[pl.ds(lo * TN, TN)], heads.at[slot], hsem.at[slot]
            )

        @pl.when(lin == 0)
        def _():
            @pl.when(nb_ref[0, 0] > 0)
            def _():
                head_dma(0, lo_ref[0, 0]).start()

        # prefetch the NEXT grid step's first block while this one computes
        nxt = lin + 1
        tn_, gn_ = nxt // NGROUP, nxt % NGROUP

        @pl.when((nxt < nt * NGROUP) & (nb_ref[gn_, jnp.minimum(tn_, nt - 1)] > 0))
        def _():
            head_dma(nxt & 1, lo_ref[gn_, jnp.minimum(tn_, nt - 1)]).start()

        # probe g's columns of the [T, 9] start/end blocks (one-hot select —
        # no dynamic lane slicing; everything stays >= 2-D for Mosaic layouts)
        iota9 = jax.lax.broadcasted_iota(jnp.int32, (TILE, NPROBE), 1)
        st3 = []
        en3 = []
        for pi in range(NGROUP):
            sel = (iota9 == g2 * NGROUP + pi).astype(jnp.int32)
            st3.append(jnp.sum(st_ref[:] * sel, axis=1, keepdims=True).T)  # [1, T]
            en3.append(jnp.sum(en_ref[:] * sel, axis=1, keepdims=True).T)

        q = q_ref[:]  # [T, 4] f32
        lo = lo_ref[g2, t]
        nblocks = nb_ref[g2, t]
        nchunks = jnp.minimum((rmax_ref[g2, t] + CHUNK - 1) // CHUNK, nchunk_max)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, TN), 1)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 0)

        best_d2 = d2_ref[0]  # [1, T]
        best_bi = bi_ref[0]

        def tail_dma(bi):
            slot = (bi - 1) & 1
            return pltpu.make_async_copy(
                gxyz_hbm.at[pl.ds((lo + bi) * TN, TN)], tails.at[slot], tsem.at[slot]
            )

        @pl.when(nblocks > 1)
        def _():
            tail_dma(1).start()

        def block_body(b, carry):
            best_d2, best_bi = carry

            @pl.when((b >= 1) & (b + 1 < nblocks))
            def _():
                tail_dma(b + 1).start()

            @pl.when(b == 0)
            def _():
                head_dma(lin & 1, lo).wait()

            @pl.when(b > 0)
            def _():
                tail_dma(b).wait()

            hblk = heads[lin & 1][:, :4]
            tblk = tails[(b - 1) & 1][:, :4]
            blk = jnp.where(b == 0, hblk, tblk)  # [TN, 4] f32
            base = (lo + b) * TN

            def chunk_body(ci, carry):
                best_d2, best_bi = carry
                off = ci * CHUNK
                cands = []
                in_blks = []
                pieces = []
                for pi in range(NGROUP):
                    cand = st3[pi] + iota_c + off  # [CHUNK, T]
                    in_run = cand < en3[pi]
                    local = cand - base
                    local_m = jnp.where(in_run, local, -1)
                    # stack slots along rows -> ONE wide MXU op for the whole
                    # chunk x probe group (tiny batched matmuls pay per-op
                    # latency; a [3*CHUNK*T, TN] single matmul does not)
                    pieces.append(
                        (local_m[:, :, None] == iota_n[None])
                        .astype(jnp.float32)
                        .reshape(CHUNK * TILE, TN)  # leading-dim merge: layout-legal
                    )
                    cands.append(cand)
                    in_blks.append((local >= 0) & (local < TN) & in_run)
                onehot = jnp.concatenate(pieces, axis=0)  # [3*CHUNK*T, TN]
                # HIGHEST is mandatory: TPU DEFAULT runs f32 dots as ONE bf16
                # pass, truncating the copied coordinates to bf16 (~0.01 m at
                # 20 m — wrong NN picks).  Under the split-bf16 passes a 1.0 x
                # x product reproduces x's f32 decomposition exactly, so the
                # one-hot gather is bit-exact.
                gx = jnp.dot(
                    onehot,
                    blk,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                nsl = NGROUP * CHUNK
                gx3 = gx.reshape(nsl, TILE, 4)  # major-dim split: layout-legal
                diff = gx3 - jnp.broadcast_to(q[None], (nsl, TILE, 4))
                d2 = jnp.sum(diff * diff, axis=2)  # [nsl, T]
                for pi in range(NGROUP):
                    for j in range(CHUNK):
                        s_ = pi * CHUNK + j
                        dj = d2[s_ : s_ + 1]  # [1, T]
                        better = in_blks[pi][j : j + 1] & (dj < best_d2)
                        best_d2 = jnp.where(better, dj, best_d2)
                        best_bi = jnp.where(better, cands[pi][j : j + 1], best_bi)
                return best_d2, best_bi

            return jax.lax.fori_loop(0, nchunks, chunk_body, (best_d2, best_bi))

        best_d2, best_bi = jax.lax.fori_loop(0, nblocks, block_body, (best_d2, best_bi))
        d2_ref[0] = best_d2
        bi_ref[0] = best_bi

    return _kernel


@functools.partial(jax.jit, static_argnames=("run", "interpret"))
def nn_scan_pallas(
    gxyz: jnp.ndarray,  # [cap, >=4] f32 cell-sorted table coords (x, y, z, 0...)
    q_xyz: jnp.ndarray,  # [p, 4] f32 cell-sorted query coords
    starts: jnp.ndarray,  # [9, p] int32 per-probe run starts (sorted per probe)
    ends: jnp.ndarray,  # [9, p] int32 exclusive run ends (<= starts + run)
    run: int = 18,
    interpret: bool = False,
):
    """Per query: min distance^2 and its table row over all probe candidates.

    Returns (best_d2 [p] f32 — inf when no candidate, best_row [p] i32)."""
    cap = gxyz.shape[0]
    p = q_xyz.shape[0]
    assert p % TILE == 0 and cap % TN == 0, (p, cap)
    # sub-128-lane HBM blocks do not slice for DMA; pad the table to a full
    # 128-lane row (transient — built per neighbor inside the scoring scan)
    if gxyz.shape[1] != 128:
        gxyz = jnp.pad(gxyz, ((0, 0), (0, 128 - gxyz.shape[1])))
    tiles = p // TILE

    # per-(dx group, tile) bands + longest run over the group's 3 probes
    big = jnp.int32(2**30)
    has = (ends > starts).reshape(NGROUP, NGROUP, tiles, TILE)  # [dx, dy, tiles, T]
    st4 = starts.reshape(NGROUP, NGROUP, tiles, TILE)
    en4 = ends.reshape(NGROUP, NGROUP, tiles, TILE)
    t_min = jnp.where(has, st4, big).min(axis=(1, 3))  # [dx, tiles]
    t_max = jnp.where(has, en4 - 1, -1).max(axis=(1, 3))
    lo = jnp.where(t_min == big, 0, jnp.minimum(t_min, cap - 1) // TN).astype(jnp.int32)
    nb = jnp.where(t_max < 0, 0, jnp.minimum(t_max, cap - 1) // TN - lo + 1).astype(jnp.int32)
    rmax = jnp.maximum(en4 - st4, 0).max(axis=(1, 3)).astype(jnp.int32)  # [dx, tiles]

    kernel = _make_kernel(run)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lo, nb, rmax
        grid=(tiles, NGROUP),  # dx groups innermost (ascending probe order)
        in_specs=[
            pl.BlockSpec((TILE, NPROBE), lambda t, g, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, NPROBE), lambda t, g, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda t, g, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table coords stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda t, g, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda t, g, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TN, 128), jnp.float32),  # head ring (cross-step)
            pltpu.VMEM((2, TN, 128), jnp.float32),  # tail ring (blocks >= 1)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d2, bi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.int32),
        ),
        interpret=interpret,
    )(lo, nb, rmax, starts.T, ends.T, q_xyz, gxyz)
    return d2.reshape(p), bi.reshape(p)
