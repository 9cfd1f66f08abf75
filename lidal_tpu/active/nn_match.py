"""On-device nearest-neighbor matching between pose-registered LiDAR frames.

TPU-native replacement for the sklearn KD-tree hot loop of LiDAL scoring
(reference ``score/sv_level/LiDAL.py:59-72``: ``tree.query(query_points, k=1)``
against 24 neighbor frames, match if distance <= 0.1 m).

Design (v3 — band pairwise; see ``ops/pallas_nnband.py`` for the kernel story):
a uniform hash grid with cell size == the match threshold.  Any neighbor point
within 0.1 m of a query lies in the query's 3x3x3 cell neighborhood; with both
sides cell-sorted, all 27 neighborhood cells of a whole query TILE live in one
contiguous key range of the table — located by just TWO lower bounds per tile
(the (-1,-1,-1) probe key of the tile's first query and the (+1,+1,+2) key of
its last; lower bounds are monotone in the packed key, so these corner shifts
are the min/max over all 27 offsets).  The kernel then scans the band with a
full pairwise distance — no per-probe runs, no candidate caps, no overflow:
the match results are KD-tree-exact by construction.

Cell packing: ``hi = cx`` (full int32 range — unbounded trajectory axis) and
``lo = (cy + 2^15) << 12 | (cz + 2^11)`` — carry-free under +-1 shifts, so cell
order == lexicographic (cx, cy, cz) order and the corner-shift monotonicity
above holds.  Supported range at 0.1 m cells: |y| < ~3276 m, |z| < ~204 m
(automotive scale); x unbounded.

Tie-breaking: among equidistant nearest candidates the LOWEST cell-sorted
table row wins; sklearn's tie order is unspecified — exact-tie probability on
real float coords is negligible (documented divergence, docs/PARITY.md).

Match contract: results are exact for matches (distance <= cell).  For
unmatched queries ``dist`` may reflect any band candidate (or inf) — the LiDAL
scorer only consumes matches (``LiDAL.py:69``), so this is the natural kernel
boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidal_tpu.ops.gather import take_values
from lidal_tpu.ops.hashing import SENTINEL_KEY
from lidal_tpu.ops.pallas_nnband import BIG_COORD, TILE, TN

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
    planar: jnp.ndarray  # [3, cap // 128, 128] f32 coords in sorted order (BIG pad)
    src_idx: jnp.ndarray  # [cap] int32 original point index (for prob gathers)
    valid: jnp.ndarray  # [cap] bool


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def build_grid(xyz: jnp.ndarray, valid: jnp.ndarray, cell: float) -> HashGrid:
    """Sort points by quantized cell key; capacity rounds up to a DMA-block
    multiple (invalid rows carry BIG coordinates so they never match)."""
    n = xyz.shape[0]
    cap = _round_up(n, TN)
    if cap != n:
        xyz = jnp.pad(xyz, ((0, cap - n), (0, 0)))
        valid = jnp.pad(valid, (0, cap - n))
    cells = jnp.floor(xyz / cell).astype(jnp.int32)
    hi, lo = pack_cells(cells, valid)
    idx = jnp.arange(cap, dtype=jnp.int32)
    s_hi, s_lo, s_idx = jax.lax.sort((hi, lo, idx), num_keys=2)
    s_valid = s_hi != SENTINEL_KEY
    s_xyz = jnp.where(s_valid[:, None], xyz[s_idx], BIG_COORD)
    return HashGrid(
        key_hi=s_hi,
        key_lo=s_lo,
        planar=s_xyz.T.reshape(3, cap // 128, 128),
        src_idx=s_idx,
        valid=s_valid,
    )


class PreparedQueries(NamedTuple):
    """Cell-sorted query points + per-tile band corner keys.

    The cell packing is origin-free, so one preparation serves every neighbor
    grid (LiDAL reuses it across all 24 neighbors of a frame)."""

    q_t: jnp.ndarray  # [4, p] queries in cell-key order (row 3 = 0 pad)
    s_qidx: jnp.ndarray  # [p] original index per sorted slot
    s_ok: jnp.ndarray  # [p]
    kmin_hi: jnp.ndarray  # [tiles] band-start corner key per query tile
    kmin_lo: jnp.ndarray  # [tiles]
    kmax_hi: jnp.ndarray  # [tiles] band-end (exclusive) corner key
    kmax_lo: jnp.ndarray  # [tiles]


def _corner_keys(s_hi: jnp.ndarray, s_lo: jnp.ndarray):
    """Per-tile band corner keys from sorted query keys.

    Band start: lower bound of the first query's (-1, -1, -1) corner probe;
    band end: lower bound of the last query's exclusive (+1, +1, +2) corner.
    Sentinel boundaries keep the sentinel key (bands collapse onto the table's
    sentinel tail); shifts are carry-free by the pack margins."""
    p = s_hi.shape[0]
    tiles = -(-p // TILE)
    first = jnp.arange(tiles, dtype=jnp.int32) * TILE
    last = jnp.minimum(first + TILE - 1, p - 1)
    f_hi, f_lo = s_hi[first], s_lo[first]
    l_hi, l_lo = s_hi[last], s_lo[last]
    f_real = f_hi != SENTINEL_KEY
    l_real = l_hi != SENTINEL_KEY
    kmin_hi = jnp.where(f_real, f_hi - 1, SENTINEL_KEY)
    kmin_lo = jnp.where(f_real, f_lo - (1 << _Z_BITS) - 1, SENTINEL_KEY)
    kmax_hi = jnp.where(l_real, l_hi + 1, SENTINEL_KEY)
    kmax_lo = jnp.where(l_real, l_lo + (1 << _Z_BITS) + 2, SENTINEL_KEY)
    return kmin_hi, kmin_lo, kmax_hi, kmax_lo


def prepare_queries(q_xyz: jnp.ndarray, q_valid: jnp.ndarray, cell: float) -> PreparedQueries:
    p = q_xyz.shape[0]
    q_cells = jnp.floor(q_xyz / cell).astype(jnp.int32)
    q_hi, q_lo = pack_cells(q_cells, q_valid)
    qidx = jnp.arange(p, dtype=jnp.int32)
    s_hi, s_lo, s_qidx = jax.lax.sort((q_hi, q_lo, qidx), num_keys=2)
    s_ok = s_hi != SENTINEL_KEY
    q_t = jnp.pad(q_xyz[s_qidx].T, ((0, 1), (0, 0)))  # [4, p]
    kmin_hi, kmin_lo, kmax_hi, kmax_lo = _corner_keys(s_hi, s_lo)
    return PreparedQueries(
        q_t=q_t, s_qidx=s_qidx, s_ok=s_ok,
        kmin_hi=kmin_hi, kmin_lo=kmin_lo, kmax_hi=kmax_hi, kmax_lo=kmax_lo,
    )


def prepared_from_grid(grid: HashGrid) -> PreparedQueries:
    """Use an already-built hash grid AS the prepared query set — a grid IS a
    cell-sort (planar coords = sorted xyz, src_idx = unsort permutation), so a
    frame resident as a ring neighbor needs NO re-upload and NO re-sort to be
    scored as the query (the LiDAL runner's steady state: each frame uploads
    once, serves as query once and as neighbor 24 times).

    Divergence detail: invalid rows carry BIG coordinates here (raw pad zeros
    in :func:`prepare_queries`) — both are unmatched, results identical on the
    valid set."""
    cap = grid.key_hi.shape[0]
    q_t = jnp.pad(grid.planar.reshape(3, cap), ((0, 1), (0, 0)))
    kmin_hi, kmin_lo, kmax_hi, kmax_lo = _corner_keys(grid.key_hi, grid.key_lo)
    return PreparedQueries(
        q_t=q_t, s_qidx=grid.src_idx, s_ok=grid.valid,
        kmin_hi=kmin_hi, kmin_lo=kmin_lo, kmax_hi=kmax_hi, kmax_lo=kmax_lo,
    )


def lower_bound_pairs(t_hi, t_lo, q_hi, q_lo):
    """Vectorized binary-search lower bounds of (hi, lo) key pairs.

    t_hi/t_lo: [S, n] sorted tables; q_hi/q_lo: [S, K].  Returns int32 [S, K]
    insertion points.  O(K log n) gathers — used only for the 2-per-tile band
    corners (K = 2 * tiles), NOT per query."""
    s, n = t_hi.shape
    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, n, jnp.int32)
    steps = max(1, (n + 1).bit_length())

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        th = jnp.take_along_axis(t_hi, midc, axis=1)
        tl = jnp.take_along_axis(t_lo, midc, axis=1)
        less = (th < q_hi) | ((th == q_hi) & (tl < q_lo))
        upd = lo < hi
        return jnp.where(upd & less, mid + 1, lo), jnp.where(upd & ~less, mid, hi)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def band_bounds(grids: HashGrid, pq: PreparedQueries):
    """Block-rounded band [blo, blo + nb) per (neighbor slot, query tile).

    ``grids`` is a stacked HashGrid (leading S axis on every leaf)."""
    s, cap = grids.key_hi.shape
    nblk = cap // TN
    tiles = pq.kmin_hi.shape[0]
    b_lo = lower_bound_pairs(
        grids.key_hi, grids.key_lo,
        jnp.broadcast_to(pq.kmin_hi[None], (s, tiles)),
        jnp.broadcast_to(pq.kmin_lo[None], (s, tiles)),
    )
    b_hi = lower_bound_pairs(
        grids.key_hi, grids.key_lo,
        jnp.broadcast_to(pq.kmax_hi[None], (s, tiles)),
        jnp.broadcast_to(pq.kmax_lo[None], (s, tiles)),
    )
    blo = jnp.minimum(b_lo // TN, max(nblk - 1, 0)).astype(jnp.int32)
    bhi_blk = jnp.minimum(-(-b_hi // TN), nblk).astype(jnp.int32)
    nb = jnp.maximum(bhi_blk - blo, 0).astype(jnp.int32)
    return blo, nb


def stack_grids(grids) -> HashGrid:
    """Stack per-neighbor grids into one leading-axis pytree."""
    import jax.tree_util as jtu

    return jtu.tree_map(lambda *xs: jnp.stack(xs), *grids)


def _use_band_kernel(p: int, cap: int) -> bool:
    return jax.default_backend() == "tpu" and p % TILE == 0 and cap % TN == 0


def nn_query_band(grids: HashGrid, pq: PreparedQueries, interpret: bool = False):
    """Band NN for all stacked neighbor slots at once.

    Returns (best_d2 [S, p] f32, best_row [S, p] i32) in SORTED query order.
    Exact for matches (d <= cell); unmatched entries hold whatever band
    candidate won (or inf/BIG when the band is empty)."""
    s, cap = grids.key_hi.shape
    p = pq.q_t.shape[1]
    blo, nb = band_bounds(grids, pq)
    if _use_band_kernel(p, cap) or interpret:
        from lidal_tpu.ops.pallas_nnband import nn_band_pallas

        return nn_band_pallas(grids.planar, pq.q_t, blo, nb, interpret=interpret)
    from lidal_tpu.ops.pallas_nnband import nn_band_xla

    return nn_band_xla(grids.planar, pq.q_t, blo, nb)


def nn_query(
    grid: HashGrid,
    q_xyz: jnp.ndarray,  # [p, 3] float32 (same global coordinate system)
    q_valid: jnp.ndarray,  # [p]
    cell: float,
):
    """Single-grid convenience wrapper in ORIGINAL query order.

    Returns (dist [p] f32, nn_src [p] i32 original neighbor index, found [p]
    bool).  ``found`` means a within-``cell`` match exists — exactly the
    KD-tree's ``dist <= thresh`` set; dist/nn_src are exact where found."""
    pq = prepare_queries(q_xyz, q_valid, cell)
    grids = stack_grids([grid])
    d2, row = nn_query_band(grids, pq)
    d2, row = d2[0], row[0]
    cap = grid.src_idx.shape[0]
    dist_s = jnp.sqrt(d2)
    found_s = (dist_s <= cell) & pq.s_ok
    src_s = jnp.where(
        found_s, take_values(grid.src_idx, jnp.minimum(row, cap - 1), sorted_unique=False), 0
    )
    # unsort via ONE permutation-inverting sort (s_qidx is a permutation);
    # [p]-sized scatters cost ~5x a 1-key sort on TPU (tools/probe_unique_parts.py)
    _, dist, nn_src, found = jax.lax.sort(
        (pq.s_qidx, dist_s, src_s, found_s), num_keys=1
    )
    return dist, nn_src, found
