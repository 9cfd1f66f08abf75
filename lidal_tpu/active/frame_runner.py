"""Frame-level scoring round orchestrators (reference ``score/frame_level/*`` mains).

Common flow (softmax_entropy.py:56-121 and siblings): accumulate previous-round
frame flags per sequence, compute a score per train frame from the previous
round's prob/pred/outfeat dumps, select the top (or bottom) 1%, save new flags.

Divergence from the reference (SURVEY quirks 1-2, intended-semantics build):
scores are index-aligned with frames (the reference's zero-prefix append bug is
not reproduced), and MAR selects the *smallest* margin by default
(``margin_largest=True`` restores the reference's inverted behavior).

``RunConfig.reference_parity`` restores the reference's selections VERBATIM:
ENT/MAR/SEGENT select via ``argpartition(zeros, -num_add)`` and CONF via
``argpartition(zeros, num_add)[:num_add]`` — the quirk-1 zero-prefix indexing
(scoring is skipped: the reference computes scores and then never reads them).
RAND (with-replacement draw) and CSET are identical in both modes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from lidal_tpu.active import frame_level as fl
from lidal_tpu.config import RunConfig
from lidal_tpu.data.selection import load_sv_info
from lidal_tpu.runtime.paths import Paths, ensure_dir


def _prev_dir(cfg: RunConfig, kind: str, seq: str, metric: str) -> str:
    """Previous round's artifact dir: r==1 reads fr/0r (softmax_entropy.py:89-92)."""
    if cfg.r_id == 1:
        prev = dataclasses.replace(cfg, r_id=0, label_unit="fr")
    else:
        prev = dataclasses.replace(cfg, r_id=cfg.r_id - 1, metric_name=metric)
    p = Paths(prev)
    return {"prob": p.prob_dir, "pred": p.pred_dir, "outfeat": p.outfeat_dir}[kind](seq)


def _load_flags(cfg: RunConfig, metric: str, split: Sequence[str]):
    paths = Paths(cfg)
    flags, offsets = [], [0]
    for seq in split:
        if cfg.r_id == 1:
            f = np.load(os.path.join(paths.frame_flag_dir(r_id=0), f"{seq}.npy"))
        else:
            prev = dataclasses.replace(cfg, r_id=cfg.r_id - 1, metric_name=metric)
            f = np.load(os.path.join(Paths(prev).frame_flag_dir(metric=metric), f"{seq}.npy"))
        flags.append(f.astype(bool))
        offsets.append(offsets[-1] + len(f))
    return np.concatenate(flags), offsets


def _save_flags(cfg: RunConfig, metric: str, split, flags: np.ndarray, offsets: List[int]):
    out_dir = ensure_dir(Paths(cfg).frame_flag_dir(metric=metric))
    for i, seq in enumerate(split):
        np.save(os.path.join(out_dir, f"{seq}.npy"), flags[offsets[i] : offsets[i + 1]])


def _frame_names(d: str) -> List[str]:
    return sorted(f[:-4] for f in os.listdir(d) if f.endswith(".npy"))


def _readahead(paths: Sequence[str], depth: int = 4):
    """Threaded np.load readahead: yields arrays in order while the next
    ``depth`` files load in the background (the scoring loops are IO-bound on
    ~9 MB per-frame prob dumps; matches prob_inference's readahead pattern)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        pending = [ex.submit(np.load, p) for p in paths[:depth]]
        for i in range(len(paths)):
            arr = pending[i].result()
            if i + depth < len(paths):
                pending.append(ex.submit(np.load, paths[i + depth]))
            yield arr


def run_frame_metric_round(
    cfg: RunConfig,
    metric: str,  # 'ENT' | 'MAR' | 'CONF' | 'SEGENT' | 'CSET' | 'RAND'
    train_split: Sequence[str] | None = None,
    margin_largest: bool = False,
    rng: np.random.Generator | None = None,
    verbose: bool = False,
) -> np.ndarray:
    """Compute one frame-level selection round; writes and returns the new flags."""
    assert cfg.r_id >= 1
    split = list(train_split or cfg.data.train_split)
    flags, offsets = _load_flags(cfg, metric, split)

    if metric == "RAND":
        new_flags = fl.select_random_frames(flags, rng=rng)
        _save_flags(cfg, metric, split, new_flags, offsets)
        return new_flags

    if cfg.reference_parity and metric in ("ENT", "MAR", "CONF", "SEGENT"):
        # quirk-1 verbatim path: selection never reads the computed scores
        new_flags = fl.select_top_frames_reference(flags, largest=(metric != "CONF"))
        _save_flags(cfg, metric, split, new_flags, offsets)
        return new_flags

    if metric == "CSET":
        feats = []
        for seq in split:
            d = _prev_dir(cfg, "outfeat", seq, metric)
            fps = [os.path.join(d, f"{n}.npy") for n in _frame_names(d)]
            feats.extend(of.mean(0) for of in _readahead(fps))
        new_flags = fl.core_set_select(np.stack(feats), flags)
        _save_flags(cfg, metric, split, new_flags, offsets)
        return new_flags

    scores = []
    for seq in split:
        if metric in ("ENT", "MAR", "CONF"):
            d = _prev_dir(cfg, "prob", seq, metric)
            fps = [os.path.join(d, f"{n}.npy") for n in _frame_names(d)]
            score_fn = {
                "ENT": fl.entropy_score,
                "MAR": fl.margin_score,
                "CONF": fl.least_confidence_score,
            }[metric]
            # one-deep dispatch pipeline: frame i's device score is pulled
            # while frame i+1's file loads (readahead) and kernel runs
            pending = None
            for prob in _readahead(fps):
                out = score_fn(jnp.asarray(prob))
                if pending is not None:
                    scores.append(float(pending))
                pending = out
            if pending is not None:
                scores.append(float(pending))
        elif metric == "SEGENT":
            d = _prev_dir(cfg, "pred", seq, metric)
            svi_dir = Paths(cfg).supervoxel_dir(seq, "KMeans")
            names = _frame_names(d)
            fps = [os.path.join(d, f"{n}.npy") for n in names]
            for name, pred in zip(names, _readahead(fps)):
                point2sv, _ = load_sv_info(os.path.join(svi_dir, f"{name}.npz"))
                scores.append(fl.segment_entropy_score(pred, point2sv, cfg.data.num_classes))
        else:
            raise ValueError(metric)
        if verbose:
            print(f"scored seq {seq}")

    scores = np.asarray(scores, np.float32)
    assert len(scores) == len(flags), (len(scores), len(flags))
    if metric == "ENT" or metric == "SEGENT":
        largest = True
    elif metric == "MAR":
        largest = margin_largest  # reference quirk selects largest (SURVEY quirk 2)
    else:  # CONF: smallest mean max-prob (least confident)
        largest = False
    new_flags = fl.select_top_frames(flags, scores, largest=largest)
    _save_flags(cfg, metric, split, new_flags, offsets)
    return new_flags
