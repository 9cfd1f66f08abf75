"""LiDAL: inter-frame divergence/entropy scoring + greedy AL/SL selection.

Reference parity: ``score/sv_level/LiDAL.py`` end to end —

* neighbor ids: 12 before + 12 after with the reference's end-of-sequence
  reflection arithmetic reproduced verbatim (``LiDAL.py:41-42``, SURVEY quirk 4);
* per-point accumulation over matched neighbors (``:59-81``):
  ``sum_prob += nei_prob[nn]``, ``interd += sum_c kl_div(q+eps, n+eps)``,
  inter-frame entropy of the view-averaged probability, divergence normalized by
  match count (``scipy.special.kl_div(x, y) = x*log(x/y) - x + y``);
* per-supervoxel means + point counts + centers (+ seq offset 1000 per sequence
  index, ``:218``);
* greedy AL selection (highest divergence, 1% point budget, 5 m center dedup
  keeping the higher-entropy supervoxel with swap side effects) and SL
  pseudo-label selection (lowest nonzero divergence, dedup keeping lower entropy,
  flag=2 after resetting old pseudo flags) — ``:230-325``, bitwise order-faithful.

The NN matching runs on device (``nn_match``); accumulation is jitted; the greedy
loops are inherently serial host code operating on device-computed arrays.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidal_tpu.active.nn_match import (
    HashGrid,
    build_grid,
    nn_query_prepared,
    prepare_queries,
)

EPSILON = 1e-5  # reference LiDAL.py:64
NEI_NUM = 24  # reference LiDAL.py:119
DIS_THRESH = 0.1  # reference LiDAL.py:121
SV_DIS_THRESH = 5.0  # reference LiDAL.py:230
BUDGET_FRAC = 0.01  # reference LiDAL.py:240,291


def neighbor_ids(frame_id: int, num_frames: int, nei_num: int = NEI_NUM) -> List[int]:
    """Reference LiDAL.py:41-42, reproduced including the reflection quirks.

    For sequences with fewer than ~(nei_num + 2) frames the reference arithmetic
    produces out-of-range indices (it would crash there); ids are clamped into
    [0, num_frames - 1] — a divergence only where the reference is broken.
    """
    half = int(nei_num / 2)
    ids = [
        (frame_id - off - 1) if (frame_id - off - 1) >= 0 else (half + off + 1)
        for off in range(half)
    ]
    ids += [
        (frame_id + off + 1)
        if (frame_id + off + 1) <= (num_frames - 1)
        else (num_frames - 2 - half - off)
        for off in range(half)
    ]
    return [min(max(i, 0), num_frames - 1) for i in ids]


def _accumulate_neighbor(
    q_prob: jnp.ndarray,  # [p, c]
    pq,  # PreparedQueries (cell-sorted once, shared by all neighbors)
    n_prob: jnp.ndarray,  # [m, c] neighbor prob rows in ORIGINAL point order
    grid: HashGrid,
    sum_prob: jnp.ndarray,
    interd: jnp.ndarray,
    map_count: jnp.ndarray,
    run_overflow: jnp.ndarray,
    cand_per_cell: int = 6,
):
    dist, nn_src, found, ovf = nn_query_prepared(grid, pq, cand_per_cell)
    match = found & (dist <= DIS_THRESH)
    npb = n_prob[nn_src]  # [p, c]
    qe = q_prob + EPSILON
    ne = npb + EPSILON
    # scipy.special.kl_div(x, y) = x*log(x/y) - x + y, summed over classes (LiDAL.py:71)
    kl = jnp.sum(qe * jnp.log(qe / ne) - qe + ne, axis=-1)
    mf = match.astype(q_prob.dtype)[:, None]
    sum_prob = sum_prob + npb * mf
    interd = interd + jnp.where(match, kl, 0.0)
    map_count = map_count + match.astype(map_count.dtype)
    return sum_prob, interd, map_count, run_overflow + ovf


@jax.jit
def _finalize(sum_prob, interd, map_count):
    """LiDAL.py:74-81: entropy of view/neighbor-averaged prob; mean divergence."""
    avg = sum_prob / map_count[:, None]
    intere = -jnp.sum(jnp.where(avg > 0, avg * jnp.log(avg), 0.0), axis=-1)
    mc = map_count - 1.0
    interd = jnp.where(mc > 0, interd / jnp.maximum(mc, 1.0), interd)
    return interd, intere


@functools.partial(jax.jit, static_argnames=("cand_per_cell",))
def _score_frame_device(q_prob, q_xyz, q_valid, nei_probs, grids, cand_per_cell=6):
    """One dispatch per frame: lax.scan over the stacked 24 neighbor grids.
    The query cell-sort + probe keys are origin-free, so they are prepared once
    and shared by every neighbor."""
    pq = prepare_queries(q_xyz, q_valid, DIS_THRESH)
    sum_prob0 = q_prob  # LiDAL.py:63: starts as the query prob copy
    interd0 = jnp.zeros(q_prob.shape[:1], jnp.float32)
    map_count0 = jnp.ones(q_prob.shape[:1], jnp.float32)  # LiDAL.py:61
    ovf0 = jnp.zeros((), jnp.int32)

    def body(carry, nei):
        n_prob, grid = nei
        return _accumulate_neighbor(q_prob, pq, n_prob, grid, *carry, cand_per_cell), None

    (sum_prob, interd, map_count, ovf), _ = jax.lax.scan(
        body, (sum_prob0, interd0, map_count0, ovf0), (nei_probs, grids)
    )
    interd, intere = _finalize(sum_prob, interd, map_count)
    return interd, intere, ovf


def stack_grids(grids: Sequence[HashGrid]) -> HashGrid:
    """Stack per-neighbor grids into one leading-axis pytree for the scan."""
    import jax.tree_util as jtu

    return jtu.tree_map(lambda *xs: jnp.stack(xs), *grids)


# candidate-run cap ladder: the exact-NN guarantee.  A frame is first scored
# with the cheap default cap; a non-zero overflow counter (host-visible) means
# a probe's z-run held more candidates than the scan cap, so a dropped
# candidate COULD have been the true nearest neighbor — the frame is re-scored
# with a doubled cap until the count is zero.  Each rung compiles once per
# process; real LiDAR at 0.1 m cells virtually never needs the second rung.
CAND_LADDER = (6, 12, 24, 48, 96)


def score_frame(
    q_prob: np.ndarray,  # [p, c] view-averaged probability map of the query frame
    q_xyz: np.ndarray,  # [p, 3] pose-registered (sequence-global) coords
    nei_probs: Sequence[np.ndarray],
    nei_grids: Sequence[HashGrid],
):
    """Per-point inter-frame divergence + entropy against all neighbor frames.

    Exact-NN guarantee: matches the reference KD-tree (``LiDAL.py:66``) for
    every point — candidate-run overflow triggers a re-score with a doubled
    scan cap (see ``CAND_LADDER``) until no candidate is dropped.

    ``nei_probs`` entries may be device arrays (the runner keeps a device-side
    LRU — consecutive frames share 22/24 neighbors, and re-uploading the ~10 MB
    probability map per neighbor per frame dominates scoring wall-clock
    otherwise)."""
    q_prob_j = jnp.asarray(q_prob, jnp.float32)
    q_xyz_j = jnp.asarray(q_xyz, jnp.float32)
    q_valid = jnp.ones(q_prob.shape[:1], bool)
    nei = jnp.stack([jnp.asarray(p, jnp.float32) for p in nei_probs])
    grids = stack_grids(list(nei_grids))
    for i, cpc in enumerate(CAND_LADDER):
        interd, intere, ovf = _score_frame_device(
            q_prob_j, q_xyz_j, q_valid, nei, grids, cand_per_cell=cpc
        )
        if int(ovf) == 0:
            return np.asarray(interd), np.asarray(intere)
        if i + 1 < len(CAND_LADDER):
            print(
                f"WARNING: NN candidate-run overflow at cap {cpc} "
                f"({int(ovf)} dropped) — re-scoring with cap {CAND_LADDER[i + 1]}"
            )
    raise RuntimeError(
        f"NN candidate runs overflow even at cap {CAND_LADDER[-1]} "
        f"({int(ovf)} dropped): pathological point density for 0.1 m cells"
    )


def sv_aggregate(
    interd: np.ndarray,  # [p]
    intere: np.ndarray,  # [p]
    point2sv: np.ndarray,  # [p] frame-local sv index (-1 = none)
    n_sv: int,
    xyz: np.ndarray = None,  # [p, 3] for centers (first run only)
):
    """Per-supervoxel means (+ pnums/centers) — LiDAL.py:84-103."""
    m = point2sv >= 0
    sv = point2sv[m].astype(np.int64)
    cnt = np.bincount(sv, minlength=n_sv).astype(np.float64)
    denom = np.maximum(cnt, 1.0)
    sv_interd = (np.bincount(sv, weights=interd[m], minlength=n_sv) / denom).astype(np.float32)
    sv_intere = (np.bincount(sv, weights=intere[m], minlength=n_sv) / denom).astype(np.float32)
    out = [sv_interd, sv_intere, cnt.astype(np.int64)]
    if xyz is not None:
        centers = np.stack(
            [np.bincount(sv, weights=xyz[m][:, k], minlength=n_sv) / denom for k in range(3)], 1
        ).astype(np.float32)
        out.append(centers)
    return tuple(out)


class SelectionResult(NamedTuple):
    sv_flags: np.ndarray  # updated flags (0 / 1 human / 2 pseudo)
    al_added: np.ndarray  # ids newly flagged 1
    sl_added: np.ndarray  # ids newly flagged 2


def _greedy_select(
    sv_flags: np.ndarray,
    sv_interds: np.ndarray,
    sv_interes: np.ndarray,
    sv_pnums: np.ndarray,
    sv_centers: np.ndarray,
    point_limit: int,
    target_flag: int,
    ascending: bool,
    keep_higher_entropy: bool,
    skip_zero: bool,
    sv_dis_thresh: float = SV_DIS_THRESH,
    unlabeled_ids: np.ndarray = None,
) -> np.ndarray:
    """One greedy pass (AL: target 1, descending, keep-higher; SL: target 2,
    ascending, keep-lower, skip zero divergence). Mutates and returns sv_flags."""
    if unlabeled_ids is None:
        unlabeled_ids = np.where(sv_flags == 0)[0]
    unlabeled_interds = sv_interds[unlabeled_ids]
    sorted_ids = np.argsort(unlabeled_interds)  # stable quicksort order parity:
    # np.argsort default (quicksort) — the reference relies on its exact order only
    # through score ties; we use the default to match.
    order = sorted_ids if ascending else sorted_ids[::-1]

    added = []
    for idx in order:
        if skip_zero and unlabeled_interds[idx] == 0:
            continue
        sv_id = unlabeled_ids[idx]
        sv_c = sv_centers[sv_id]
        ok = True
        for l_sv_id in list(added):
            dist = float(np.sqrt(np.square(sv_c - sv_centers[l_sv_id]).sum()))
            if dist < sv_dis_thresh:
                ok = False
                better = (
                    sv_interes[l_sv_id] < sv_interes[sv_id]
                    if keep_higher_entropy
                    else sv_interes[l_sv_id] > sv_interes[sv_id]
                )
                if better:
                    sv_flags[sv_id] = target_flag
                    sv_flags[l_sv_id] = 0
                    added.append(sv_id)
                    added.remove(l_sv_id)
                    point_limit = point_limit + sv_pnums[l_sv_id] - sv_pnums[sv_id]
                break
        if ok:
            point_limit -= int(sv_pnums[sv_id])
            if point_limit < 0:
                break
            sv_flags[sv_id] = target_flag
            added.append(sv_id)
    return sv_flags


def select(
    sv_flags: np.ndarray,
    sv_interds: np.ndarray,
    sv_interes: np.ndarray,
    sv_pnums: np.ndarray,
    sv_centers: np.ndarray,
    train_point_num: int,
    budget_frac: float = BUDGET_FRAC,
) -> SelectionResult:
    """Full AL + SL selection (LiDAL.py:230-325)."""
    flags = sv_flags.astype(np.int64).copy()
    before = flags.copy()
    limit = round(budget_frac * train_point_num)

    flags = _greedy_select(
        flags, sv_interds, sv_interes, sv_pnums, sv_centers, limit,
        target_flag=1, ascending=False, keep_higher_entropy=True, skip_zero=False,
    )
    al_added = np.where((flags == 1) & (before != 1))[0]

    # SL candidates are frozen BEFORE the old pseudo flags are reset
    # (LiDAL.py:281-286) — previous-round pseudo SVs are excluded ("alternating
    # schedule": P_i avoids P_{i-1}), even though their flags return to 0.
    sl_candidates = np.where(flags == 0)[0]
    flags[flags == 2] = 0
    flags = _greedy_select(
        flags, sv_interds, sv_interes, sv_pnums, sv_centers, limit,
        target_flag=2, ascending=True, keep_higher_entropy=False, skip_zero=True,
        unlabeled_ids=sl_candidates,
    )
    sl_added = np.where(flags == 2)[0]
    return SelectionResult(sv_flags=flags, al_added=al_added, sl_added=sl_added)


def make_neighbor_grid(xyz: np.ndarray, cell: float = DIS_THRESH, cap: int = None) -> HashGrid:
    """Build (and pad) a device hash grid from a frame's pose-registered points."""
    n = xyz.shape[0]
    cap = cap or n
    pad = np.zeros((cap, 3), np.float32)
    pad[:n] = xyz[:cap]
    valid = np.zeros((cap,), bool)
    valid[: min(n, cap)] = True
    return build_grid(jnp.asarray(pad), jnp.asarray(valid), cell)
