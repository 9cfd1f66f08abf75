"""Frame-level active-selection scorers + top-k selection.

Reference parity (``score/frame_level/*.py``) with one documented divergence:
the reference's pooled scorers pre-fill the score array with zeros sized like the
flag array and then *append* the real scores, so the indices used for selection
point into the zero prefix and the selection degenerates to argpartition over
zeros (SURVEY.md quirk 1).  Here scores are aligned index-for-index with frames —
the intended semantics.  A second divergence: classical margin sampling selects
the *smallest* margin; the reference selects the largest (quirk 2).  Both are
exposed via ``margin_largest``.

All per-frame scores are computable on device; selection is a host argpartition
(reference softmax_entropy.py:104-113).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----- per-frame scores (device) ------------------------------------------------------


@jax.jit
def entropy_score(prob: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean point softmax entropy, natural log (scipy.stats.entropy parity;
    reference softmax_entropy.py:34).  prob [P, C] must be normalized."""
    p = prob.astype(jnp.float32)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)
    if valid is None:
        return ent.mean()
    v = valid.astype(jnp.float32)
    return (ent * v).sum() / jnp.maximum(v.sum(), 1.0)


@jax.jit
def margin_score(prob: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean (p1 - p2) margin (reference margin_sampling.py:33-35)."""
    top2 = jax.lax.top_k(prob.astype(jnp.float32), 2)[0]
    m = top2[..., 0] - top2[..., 1]
    if valid is None:
        return m.mean()
    v = valid.astype(jnp.float32)
    return (m * v).sum() / jnp.maximum(v.sum(), 1.0)


@jax.jit
def least_confidence_score(prob: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean max-probability (reference least_confidence_sampling.py:33-36);
    select the SMALLEST of these."""
    m = prob.astype(jnp.float32).max(axis=-1)
    if valid is None:
        return m.mean()
    v = valid.astype(jnp.float32)
    return (m * v).sum() / jnp.maximum(v.sum(), 1.0)


def segment_entropy_score(pred: np.ndarray, point2sv: np.ndarray, class_num: int) -> float:
    """Point-weighted sum over supervoxels of the label-histogram entropy (base 2)
    of argmax predictions (reference segment_entropy.py:40-50).  Points without a
    supervoxel (point2sv == -1) are excluded from supervoxels but still count in
    the frame's point total, like the reference's ``pred.shape[0]`` denominator."""
    n = pred.shape[0]
    if n == 0:
        return 0.0
    m = point2sv >= 0
    if not m.any():
        return 0.0
    sv = point2sv[m].astype(np.int64)
    n_sv = int(sv.max()) + 1
    hist = np.zeros((n_sv, class_num), np.float64)
    np.add.at(hist, (sv, pred[m].astype(np.int64)), 1.0)
    pnums = hist.sum(1)
    q = hist / np.maximum(pnums[:, None], 1.0)
    sege = -(q * np.log2(q + 1e-12)).sum(1)
    return float((sege * pnums).sum() / n)


# ----- selection (host) ---------------------------------------------------------------


def select_top_frames(
    frame_flag: np.ndarray,
    scores: np.ndarray,
    frac: float = 0.01,
    largest: bool = True,
) -> np.ndarray:
    """Add round(frac * n_frames) unlabeled frames with the most extreme scores
    (reference softmax_entropy.py:104-113).  Returns the updated flag array."""
    flag = frame_flag.astype(bool).copy()
    unlabeled = np.where(~flag)[0]
    s = scores[unlabeled]
    num_add = int(round(frac * flag.shape[0]))
    num_add = min(num_add, len(unlabeled))
    if num_add == 0:
        return flag
    if largest:
        sel = np.argpartition(s, -num_add)[-num_add:]
    else:
        sel = np.argpartition(s, num_add - 1)[:num_add]
    flag[unlabeled[sel]] = True
    return flag


def select_top_frames_reference(
    frame_flag: np.ndarray,
    largest: bool = True,
    frac: float = 0.01,
) -> np.ndarray:
    """VERBATIM reference selection under quirk 1: the reference pre-fills its
    score array with ``np.zeros_like(all_frame_flag)`` and then APPENDS the real
    scores (softmax_entropy.py:83,101), so ``all_scores[unlabeled_ids]`` reads
    the zero prefix and selection degenerates to ``np.argpartition`` over an
    all-zeros array (``:106-111``) — a deterministic introselect tie order that
    ignores the computed scores.  ``largest`` False reproduces CONF's
    ``argpartition(s, num_add)[:num_add]`` (least_confidence_sampling.py:110,
    kth = num_add, not num_add - 1)."""
    flag = frame_flag.astype(bool).copy()
    unlabeled = np.where(~flag)[0]
    num_add = round(frac * flag.shape[0])  # python round, like the reference
    num_add = min(num_add, len(unlabeled))  # guard (the reference would crash)
    if num_add == 0:
        return flag
    zeros = np.zeros(len(unlabeled), np.float32)
    if largest:
        sel = np.argpartition(zeros, -num_add)[-num_add:]
    else:
        sel = np.argpartition(zeros, num_add)[:num_add]
    flag[unlabeled[sel]] = True
    return flag


def select_random_frames(
    frame_flag: np.ndarray, frac: float = 0.01, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Frame-level RAND (reference frame_level/RAND.py:38-42; with-replacement
    draw reproduced — can add < frac unique frames)."""
    rng = rng or np.random.default_rng(0)
    flag = frame_flag.astype(bool).copy()
    num_add = int(round(frac * flag.shape[0]))
    unlabeled = np.where(~flag)[0]
    if len(unlabeled) == 0 or num_add == 0:
        return flag
    sel = rng.choice(unlabeled, num_add)
    flag[sel] = True
    return flag


def core_set_select(
    all_feats: np.ndarray,  # [n_frames, F] mean outfeat per frame (core_set.py:65-70)
    frame_flag: np.ndarray,
    frac: float = 0.01,
) -> np.ndarray:
    """k-Center-Greedy (reference core_set.py:74-92): iteratively add the frame
    with the max min-distance to the selected set."""
    flag = frame_flag.astype(bool).copy()
    labeled = np.where(flag)[0]
    if len(labeled) == 0:
        raise ValueError("core-set needs a non-empty labeled set")
    f = all_feats.astype(np.float64)
    d = np.linalg.norm(f[:, None, :] - f[labeled][None, :, :], axis=-1)
    min_dist = d.min(axis=1)
    num_add = int(round(frac * flag.shape[0]))
    for _ in range(num_add):
        ind = int(np.argmax(min_dist))
        assert not flag[ind]
        flag[ind] = True
        nd = np.linalg.norm(f - f[ind][None, :], axis=-1)
        min_dist = np.minimum(min_dist, nd)
    return flag
