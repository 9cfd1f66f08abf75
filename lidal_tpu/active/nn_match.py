"""On-device nearest-neighbor matching between pose-registered LiDAR frames.

TPU-native replacement for the sklearn KD-tree hot loop of LiDAL scoring
(reference ``score/sv_level/LiDAL.py:59-72``: ``tree.query(query_points, k=1)``
against 24 neighbor frames, match if distance <= 0.1 m).

Design: a uniform hash grid with cell size == the match threshold.  Any neighbor
point within 0.1 m of a query lies in the query's 3x3x3 cell neighborhood, so a
bounded candidate scan reproduces KD-tree ``dist <= thresh`` matching exactly
(points whose true NN is farther are non-matches either way).

Fast path structure (the LiDAL scoring throughput hinges on this):

* cells pack as ``hi = cx`` (full int32 range — unbounded trajectory axis) and
  ``lo = (cy + 2^15) << 12 | (cz + 2^11)`` — carry-free under the +-1 probe
  shifts, so probe key streams of cell-sorted queries STAY SORTED and every
  probe is a merge (``lower_bound_sorted_many``), not a per-query binary search;
* queries are cell-sorted ONCE per frame; the sort order is origin-free, so it
  is reused across all 24 neighbor grids and all probes;
* the 27-cell neighborhood decomposes into NINE probes (dx, dy) whose z-range
  [cz-1, cz+1] is CONTIGUOUS in key order — one lower bound + one candidate run
  per probe.

Supported coordinate range at 0.1 m cells: |y| < ~3276 m, |z| < ~204 m
(automotive scale); x unbounded.

Tie-breaking: among equidistant nearest candidates the first in (probe, run)
order wins; sklearn's tie order is unspecified — exact-tie probability on real
float coords is negligible (documented divergence).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidal_tpu.ops.gather import take_rows, take_values
from lidal_tpu.ops.hashing import SENTINEL_KEY
from lidal_tpu.ops.merge_lookup import lower_bound_sorted_many

_Y_OFF = 1 << 15
_Z_OFF = 1 << 11
_Z_BITS = 12


def pack_cells(cells: jnp.ndarray, valid: jnp.ndarray):
    """[..., 3] int32 cell coords -> (hi, lo) keys; invalid -> sentinels."""
    hi = cells[..., 0]
    lo = ((cells[..., 1] + _Y_OFF) << _Z_BITS) | (cells[..., 2] + _Z_OFF)
    in_range = (
        (jnp.abs(cells[..., 1]) < _Y_OFF - 2)
        & (jnp.abs(cells[..., 2]) < _Z_OFF - 2)
        & (hi < SENTINEL_KEY - 2)
    )
    ok = valid & in_range
    return jnp.where(ok, hi, SENTINEL_KEY), jnp.where(ok, lo, SENTINEL_KEY)


class HashGrid(NamedTuple):
    key_hi: jnp.ndarray  # [cap] sorted cell keys (sentinel tail)
    key_lo: jnp.ndarray  # [cap]
    xyz: jnp.ndarray  # [cap, 3] float32 points in sorted order
    src_idx: jnp.ndarray  # [cap] int32 original point index (for prob gathers)
    valid: jnp.ndarray  # [cap] bool


def build_grid(xyz: jnp.ndarray, valid: jnp.ndarray, cell: float) -> HashGrid:
    """Sort points by quantized cell key."""
    cells = jnp.floor(xyz / cell).astype(jnp.int32)
    hi, lo = pack_cells(cells, valid)
    idx = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    s_hi, s_lo, s_idx = jax.lax.sort((hi, lo, idx), num_keys=2)
    return HashGrid(
        key_hi=s_hi,
        key_lo=s_lo,
        xyz=xyz[s_idx],
        src_idx=s_idx,
        valid=s_hi != SENTINEL_KEY,
    )


class PreparedQueries(NamedTuple):
    """Cell-sorted query points + probe key streams.

    The cell packing is origin-free, so one preparation serves every neighbor
    grid (LiDAL reuses it across all 24 neighbors of a frame)."""

    s_xyz: jnp.ndarray  # [p, 3] queries in cell-key order
    s_qidx: jnp.ndarray  # [p] original index per sorted slot
    s_ok: jnp.ndarray  # [p]
    ph: jnp.ndarray  # [9, p] probe hi keys
    pl_lo: jnp.ndarray  # [9, p] probe lo keys (z-run start, cz - 1)


def prepare_queries(q_xyz: jnp.ndarray, q_valid: jnp.ndarray, cell: float) -> PreparedQueries:
    p = q_xyz.shape[0]
    q_cells = jnp.floor(q_xyz / cell).astype(jnp.int32)
    q_hi, q_lo = pack_cells(q_cells, q_valid)
    qidx = jnp.arange(p, dtype=jnp.int32)
    s_hi, s_lo, s_qidx = jax.lax.sort((q_hi, q_lo, qidx), num_keys=2)
    s_xyz = q_xyz[s_qidx]
    s_ok = s_hi != SENTINEL_KEY
    probes = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    ph = jnp.stack([jnp.where(s_ok, s_hi + dx, SENTINEL_KEY) for dx, _ in probes])
    pl_lo = jnp.stack(
        [jnp.where(s_ok, s_lo + (dy << _Z_BITS) - 1, SENTINEL_KEY) for _, dy in probes]
    )
    return PreparedQueries(s_xyz=s_xyz, s_qidx=s_qidx, s_ok=s_ok, ph=ph, pl_lo=pl_lo)


def nn_query(
    grid: HashGrid,
    q_xyz: jnp.ndarray,  # [p, 3] float32 (same global coordinate system)
    q_valid: jnp.ndarray,  # [p]
    cell: float,
    cand_per_cell: int = 6,
):
    """For each query point: nearest grid point within the 27-cell neighborhood.

    Returns (dist [p] f32 — inf when none found, nn_src [p] i32 original neighbor
    index — 0 when none, found [p] bool, run_overflow [] i32).  Each probe's
    candidate run is capped at ``3 * cand_per_cell`` points (3 z-cells; LiDAR at
    0.1 m cells holds ~1-4 points per cell — overflowing runs lose
    farthest-in-run candidates, counted by ``run_overflow``).
    """
    return nn_query_prepared(grid, prepare_queries(q_xyz, q_valid, cell), cand_per_cell)


def _use_scan_kernel(p: int, cap: int) -> bool:
    import jax

    return jax.default_backend() == "tpu" and p % 256 == 0 and cap % 256 == 0


def nn_query_prepared(grid: HashGrid, pq: PreparedQueries, cand_per_cell: int = 6):
    """Returns (dist [p], nn_src [p], found [p], run_overflow []) — the last is
    the number of candidate rows dropped because a probe's z-run exceeded the
    ``3 * cand_per_cell`` scan cap (monitored by the LiDAL runner; the
    reference's KD-tree has no such cap)."""
    p = pq.s_xyz.shape[0]
    cap = grid.key_hi.shape[0]
    run = 3 * cand_per_cell
    s_xyz, s_qidx, s_ok, ph, pl_lo = pq

    # The z-run [cz-1, cz+1] is one contiguous key range
    # [lower_bound(lo-1), lower_bound(lo+2 exclusive)) — BOTH ends as 18
    # streams of ONE fused merge, so the candidate scan needs no key gathers.
    qh2 = jnp.concatenate([ph, ph], axis=0)
    ql2 = jnp.concatenate(
        [pl_lo, jnp.where(ph != SENTINEL_KEY, pl_lo + 3, SENTINEL_KEY)], axis=0
    )
    bounds = lower_bound_sorted_many(grid.key_hi, grid.key_lo, qh2, ql2)
    starts, ends = bounds[:9], bounds[9:]
    real = ph != SENTINEL_KEY
    run_overflow = jnp.where(real, jnp.maximum(ends - starts - run, 0), 0).sum()

    if _use_scan_kernel(p, cap):
        from lidal_tpu.ops.pallas_nnscan import nn_scan_pallas

        en = jnp.minimum(ends, starts + run)
        en = jnp.where(ph != SENTINEL_KEY, en, starts)  # sentinel probes: empty
        gx = jnp.pad(grid.xyz, ((0, 0), (0, 1)))
        qx = jnp.pad(s_xyz, ((0, 0), (0, 1)))
        best_d2, best_i = nn_scan_pallas(gx, qx, starts, en, run=run)
        best_i = jnp.minimum(best_i, cap - 1)
        dist_s = jnp.sqrt(best_d2)
        found_s = jnp.isfinite(best_d2) & s_ok
        src_s = jnp.where(found_s, take_values(grid.src_idx, best_i, sorted_unique=False), 0)
        dist = jnp.zeros((p,), jnp.float32).at[s_qidx].set(dist_s)
        nn_src = jnp.zeros((p,), jnp.int32).at[s_qidx].set(src_s)
        found = jnp.zeros((p,), bool).at[s_qidx].set(found_s)
        return dist, nn_src, found, run_overflow

    xyz_ext = jnp.concatenate([grid.xyz, jnp.zeros((1, 3), grid.xyz.dtype)])
    best_d2 = jnp.full((p,), jnp.inf, jnp.float32)
    best_i = jnp.zeros((p,), jnp.int32)
    for g in range(9):
        st = starts[g]
        en = jnp.minimum(ends[g], st + run)
        for j in range(run):
            pos = jnp.minimum(st + j, cap - 1)
            in_run = (st + j < en) & (ph[g] != SENTINEL_KEY)
            cand = take_rows(xyz_ext, jnp.where(in_run, pos, cap), sorted_unique=True)
            d2 = jnp.sum(jnp.square(s_xyz - cand), axis=-1)
            better = in_run & (d2 < best_d2)
            best_d2 = jnp.where(better, d2, best_d2)
            best_i = jnp.where(better, pos, best_i)

    # unsort back to the original query order (disjoint scatter)
    dist_s = jnp.sqrt(best_d2)
    found_s = jnp.isfinite(best_d2) & s_ok
    src_s = jnp.where(found_s, take_values(grid.src_idx, best_i, sorted_unique=False), 0)
    dist = jnp.zeros((p,), jnp.float32).at[s_qidx].set(dist_s)
    nn_src = jnp.zeros((p,), jnp.int32).at[s_qidx].set(src_s)
    found = jnp.zeros((p,), bool).at[s_qidx].set(found_s)
    return dist, nn_src, found, run_overflow
