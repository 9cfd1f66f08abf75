"""Pallas banded candidate-scan kernel for hash-grid nearest neighbors.

The LiDAL scorer matches every query point against a pose-registered neighbor
frame's cell-sorted point table: per query, NINE probes (dx, dy) each scan one
contiguous z-run of up to 18 candidate rows located by merge lower bounds
(``active/nn_match.py``).  Round 1 did the scan with 9 x 18 XLA row gathers —
~8 s per frame against 24 neighbors, the scoring bottleneck.

This kernel exploits the same banded structure as the sparse conv: queries are
cell-sorted, so each probe's candidate starts are non-decreasing, and a tile of
256 queries draws its candidates from a narrow band of the sorted table.  Per
(tile, probe) grid step it:

1. reads the probe band [first block, n_blocks] (SMEM scalar prefetch),
2. DMAs each 256-row coordinate block HBM -> VMEM,
3. "gathers" all 18 slots with ONE batched one-hot f32 matmul (exact row
   copies: one-hot rows have a single 1.0, so even split-precision
   accumulation reproduces the f32 coordinates bit-exactly),
4. updates the running (best_d2, best_index) with a strict `<`, preserving
   the reference tie order (probe asc, run-position asc).

Out-of-band candidates gather zeros but are masked by the block-membership
check, so results are bit-identical to the XLA gather path.
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


def _make_kernel(run: int):
    def _kernel(lo_ref, nb_ref, st_ref, en_ref, q_ref, gxyz_hbm, d2_ref, bi_ref, blk_scr, sem):
        t = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            d2_ref[0] = jnp.full((1, TILE), jnp.inf, jnp.float32)
            bi_ref[0] = jnp.zeros((1, TILE), jnp.int32)

        # probe g's columns of the [T, 9] start/end blocks (no dynamic lane
        # slicing on TPU: one-hot select).  All values stay >= 2-D — Mosaic's
        # layout inference crashes on rank-1 vectors.
        sel = (jax.lax.broadcasted_iota(jnp.int32, (TILE, NPROBE), 1) == g).astype(jnp.int32)
        st = jnp.sum(st_ref[:] * sel, axis=1, keepdims=True).T  # [1, T]
        en = jnp.sum(en_ref[:] * sel, axis=1, keepdims=True).T

        q = q_ref[:]  # [T, 4] f32
        lo = lo_ref[g, t]
        nblocks = nb_ref[g, t]
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE, TN), 1)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (run, TILE), 0)
        cand = st + iota_r  # [run, T] absolute candidate rows
        in_run = cand < en

        best_d2 = d2_ref[0]  # [1, T]
        best_bi = bi_ref[0]

        def body(b, carry):
            best_d2, best_bi = carry
            copy = pltpu.make_async_copy(
                gxyz_hbm.at[pl.ds((lo + b) * TN, TN)], blk_scr, sem
            )
            copy.start()
            copy.wait()
            blk = blk_scr[:, :4]  # [TN, 4] f32 (x, y, z, 0)
            base = (lo + b) * TN
            local = cand - base  # [run, T]
            # fold the run mask into the index (-1 matches no iota column);
            # rank-expanding an i1 vector does not lower on TPU
            local_m = jnp.where(in_run, local, -1)
            onehot = (local_m[:, :, None] == iota_n[None]).astype(jnp.float32)  # [run, T, TN]
            gx = jax.lax.dot_general(
                onehot,
                jnp.broadcast_to(blk[None], (run, TN, 4)),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [run, T, 4] exact row copies
            in_blk = (local >= 0) & (local < TN) & in_run  # [run, T]
            # lane-indexed coordinate extraction does not lower on TPU; the
            # pad column is 0 on both sides, so the full-width difference
            # reduction equals the 3-coordinate sum bit-for-bit
            diff = gx - jnp.broadcast_to(q[None], (run, TILE, 4))
            d2 = jnp.sum(diff * diff, axis=2)  # [run, T]
            for j in range(run):
                dj = d2[j : j + 1]  # [1, T]
                better = in_blk[j : j + 1] & (dj < best_d2)  # strict <: first j wins
                best_d2 = jnp.where(better, dj, best_d2)
                best_bi = jnp.where(better, cand[j : j + 1], best_bi)
            return best_d2, best_bi

        best_d2, best_bi = jax.lax.fori_loop(0, nblocks, body, (best_d2, best_bi))
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

    # per-(probe, tile) bands over real candidate rows
    big = jnp.int32(2**30)
    has = (ends > starts).reshape(NPROBE, tiles, TILE)
    st3 = starts.reshape(NPROBE, tiles, TILE)
    en3 = ends.reshape(NPROBE, tiles, TILE)
    t_min = jnp.where(has, st3, big).min(axis=2)  # [9, tiles]
    t_max = jnp.where(has, en3 - 1, -1).max(axis=2)
    lo = jnp.where(t_min == big, 0, jnp.minimum(t_min, cap - 1) // TN).astype(jnp.int32)
    nb = jnp.where(
        t_max < 0, 0, jnp.minimum(t_max, cap - 1) // TN - lo + 1
    ).astype(jnp.int32)

    kernel = _make_kernel(run)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lo, nb
        grid=(tiles, NPROBE),  # probes innermost: reference tie order
        in_specs=[
            pl.BlockSpec((TILE, NPROBE), lambda t, g, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, NPROBE), lambda t, g, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda t, g, lo_r, nb_r: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table coords stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda t, g, lo_r, nb_r: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda t, g, lo_r, nb_r: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
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
    )(lo, nb, starts.T, ends.T, q_xyz, gxyz)
    return d2.reshape(p), bi.reshape(p)
