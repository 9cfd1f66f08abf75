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
    nn_query_band,
    prepare_queries,
    stack_grids,
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


@jax.jit
def _finalize(sum_prob, interd, map_count):
    """LiDAL.py:74-81: entropy of view/neighbor-averaged prob; mean divergence."""
    avg = sum_prob / map_count[:, None]
    intere = -jnp.sum(jnp.where(avg > 0, avg * jnp.log(avg), 0.0), axis=-1)
    mc = map_count - 1.0
    interd = jnp.where(mc > 0, interd / jnp.maximum(mc, 1.0), interd)
    return interd, intere


def _accumulate_and_unsort(pq, q_prob_s, nei_probs, grids, weights):
    """Band NN over all stacked slots (ONE kernel launch) + lax.scan KL/entropy
    accumulation per slot; results unsorted back to original point order.

    ``weights`` carries per-slot multiplicity (the reference's end-of-sequence
    neighbor reflection can list the same frame twice — LiDAL.py:41-42; unused
    ring slots ride at weight 0).

    Exact-NN guarantee: the band scan has no candidate caps (see
    ``ops/pallas_nnband.py``), so matches reproduce the reference KD-tree
    (``LiDAL.py:66``) for every point, with no overflow or re-scoring."""
    d2_all, row_all = nn_query_band(grids, pq)  # [S, p] in sorted query order
    cap = grids.src_idx.shape[1]

    sum_prob0 = q_prob_s  # LiDAL.py:63: starts as the query prob copy
    interd0 = jnp.zeros(q_prob_s.shape[:1], jnp.float32)
    map_count0 = jnp.ones(q_prob_s.shape[:1], jnp.float32)  # LiDAL.py:61
    qe = q_prob_s + EPSILON
    log_qe = jnp.log(qe)

    def body(carry, nei):
        sum_prob, interd, map_count = carry
        d2, row, n_prob, w = nei
        dist = jnp.sqrt(d2)
        match = (dist <= DIS_THRESH) & pq.s_ok
        npb = n_prob[jnp.minimum(row, cap - 1)]  # [p, c]; n_prob is grid-sorted
        ne = npb + EPSILON
        # scipy.special.kl_div(x, y) = x*log(x/y) - x + y, over classes (LiDAL.py:71)
        kl = jnp.sum(qe * (log_qe - jnp.log(ne)) - qe + ne, axis=-1)
        wf = jnp.where(match, w.astype(jnp.float32), 0.0)
        sum_prob = sum_prob + npb * wf[:, None]
        interd = interd + wf * kl
        map_count = map_count + wf
        return (sum_prob, interd, map_count), None

    (sum_prob, interd, map_count), _ = jax.lax.scan(
        body,
        (sum_prob0, interd0, map_count0),
        (d2_all, row_all, nei_probs, weights),
    )
    interd, intere = _finalize(sum_prob, interd, map_count)
    # unsort via ONE permutation-inverting sort (s_qidx is a permutation);
    # [p]-sized scatters cost ~5x a 1-key sort on TPU (tools/probe_unique_parts.py)
    _, interd, intere = jax.lax.sort((pq.s_qidx, interd, intere), num_keys=1)
    return interd, intere


@jax.jit
def _score_frame_device(q_prob, q_xyz, q_valid, nei_probs, grids, weights):
    """Score an uploaded query frame: cell-sort once, share across all slots."""
    pq = prepare_queries(q_xyz, q_valid, DIS_THRESH)
    q_prob_s = q_prob[pq.s_qidx]  # accumulate in sorted order; unsort once
    return _accumulate_and_unsort(pq, q_prob_s, nei_probs, grids, weights)


@jax.jit
def _score_slot_device(nei_probs, grids, slot, weights):
    """Score a RING-RESIDENT frame as the query: its grid IS the cell-sort
    (``nn_match.prepared_from_grid``), so scoring uploads NOTHING — the
    runner's steady state transfers one new frame per frame scored (it enters
    the ring once, serves as query once and as neighbor 24 times).  The query's
    own slot rides at weight 0 in ``weights``."""
    from lidal_tpu.active.nn_match import prepared_from_grid

    grid_q = jax.tree_util.tree_map(lambda a: a[slot], grids)
    pq = prepared_from_grid(grid_q)
    q_prob_s = nei_probs[slot]
    interd, intere = _accumulate_and_unsort(pq, q_prob_s, nei_probs, grids, weights)
    # one stacked output buffer: the runner pulls BOTH score vectors in a
    # single host transfer (per-frame RPC count matters on remote backends)
    return jnp.stack([interd, intere])


def score_slot(ring_state, slot, weights):
    """Production entry: score ring slot ``slot`` against all slots weighted by
    ``weights`` [S] (its own slot at 0).  Returns stacked [2, cap]
    (interd, intere) in the frame's ORIGINAL point order."""
    grids, probs = ring_state
    return _score_slot_device(probs, grids, jnp.asarray(slot), weights)


def score_frame(
    q_prob: np.ndarray,  # [p, c] view-averaged probability map of the query frame
    q_xyz: np.ndarray,  # [p, 3] pose-registered (sequence-global) coords
    nei_probs: Sequence[np.ndarray],
    nei_grids: Sequence[HashGrid],
):
    """Per-point inter-frame divergence + entropy against all neighbor frames.

    Convenience list API (tests/bench): ``nei_probs`` in ORIGINAL point order;
    stacks + grid-sorts on the fly.  The runner uses the stacked ring entry."""
    q_prob_j = jnp.asarray(q_prob, jnp.float32)
    q_xyz_j = jnp.asarray(q_xyz, jnp.float32)
    q_valid = jnp.ones(q_prob.shape[:1], bool)
    grids = stack_grids(list(nei_grids))
    cap = grids.src_idx.shape[1]
    nei = jnp.stack(
        [
            jnp.pad(jnp.asarray(p, jnp.float32), ((0, cap - p.shape[0]), (0, 0)))
            for p in nei_probs
        ]
    )
    nei = jnp.take_along_axis(nei, grids.src_idx[:, :, None], axis=1)
    weights = jnp.ones((len(nei_probs),), jnp.float32)
    interd, intere = _score_frame_device(q_prob_j, q_xyz_j, q_valid, nei, grids, weights)
    return np.asarray(interd), np.asarray(intere)


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
