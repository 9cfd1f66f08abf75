"""Synthetic mini-SemanticKITTI generator for end-to-end tests.

Writes a directory tree compatible with the reference layout
(``Semantic_kitti/dataset/sequences/{seq}/{velodyne,labels}`` + calib/poses) with
tiny frames, plus a matching test RunConfig with small capacities.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from lidal_tpu.config import DataConfig, RunConfig

# raw ids that remap to real train classes (car, bicycle, road, building, vegetation...)
RAW_IDS = np.array([10, 11, 40, 50, 70, 48, 80, 30], np.uint32)

TEST_CAPS = (1024, 1024, 512, 256, 64)
TEST_POINT_CAP = 1024


def make_mini_sk(root: str, seqs=("00", "01"), frames_per_seq=6, points=700, seed=0,
                 separable=False):
    """Create sequences/{seq}/velodyne/NNNNNN.bin + labels + calib.txt + poses.txt.

    ``separable=True`` writes a LEARNABLE 2-class labeling instead of random
    labels: class is determined by height (z < 0 -> road id 40, else building
    id 50) and the intensity channel carries the class (0.2 vs 0.8 + noise) —
    augmentation never touches intensity, so a correctly-wired train/eval path
    must reach high mIoU in a few hundred steps (tests/test_learning.py)."""
    rng = np.random.default_rng(seed)
    seq_root = os.path.join(root, "sequences")
    for seq in seqs:
        vdir = os.path.join(seq_root, seq, "velodyne")
        ldir = os.path.join(seq_root, seq, "labels")
        os.makedirs(vdir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        poses = []
        for fi in range(frames_per_seq):
            n = points + int(rng.integers(-50, 50))
            # overlapping structured scene translated per frame (ego motion 0.5m/frame)
            base = rng.random((n, 3)).astype(np.float32) * np.array([20, 20, 2], np.float32)
            xyz = base - np.array([10, 10, 1], np.float32)
            if separable:
                cls_b = xyz[:, 2] >= 0.0
                sig = (0.2 + 0.6 * cls_b + 0.1 * rng.standard_normal(n)).astype(np.float32)
                labels = np.where(cls_b, 50, 40).astype(np.uint32)
            else:
                sig = rng.random(n).astype(np.float32)
                labels = RAW_IDS[rng.integers(0, len(RAW_IDS), n)].astype(np.uint32)
                # sprinkle some ignore/outlier ids
                labels[rng.random(n) < 0.05] = 0
            raw = np.concatenate([xyz, sig[:, None]], 1).astype(np.float32)
            raw.tofile(os.path.join(vdir, f"{fi:06d}.bin"))
            labels.tofile(os.path.join(ldir, f"{fi:06d}.label"))
            # camera-frame pose: translation along x grows with frame id
            p = np.eye(4)
            p[0, 3] = 0.5 * fi
            poses.append(p)
        with open(os.path.join(seq_root, seq, "calib.txt"), "w") as f:
            for key in ("P0", "P1", "P2", "P3", "Tr"):
                mat = np.eye(4)[:3].reshape(-1)
                f.write(f"{key}: " + " ".join(f"{v:.6e}" for v in mat) + "\n")
        with open(os.path.join(seq_root, seq, "poses.txt"), "w") as f:
            for p in poses:
                f.write(" ".join(f"{v:.6e}" for v in p[:3].reshape(-1)) + "\n")
    return seq_root


def mini_cfg(tmpdir: str, seqs=("00", "01"), **kw) -> RunConfig:
    data = DataConfig(
        name="SK",
        num_classes=19,
        batch_size=2,
        point_cap=TEST_POINT_CAP,
        level_caps=TEST_CAPS,
        train_split=tuple(seqs),
        val_split=(seqs[0],),  # reuse a train seq as val for the smoke test
        train_point_num=0,  # filled by callers when needed
    )
    return RunConfig(
        dataset_name="SK",
        model_name=kw.pop("model_name", "Mink"),
        label_unit=kw.pop("label_unit", "sv"),
        metric_name=kw.pop("metric_name", "LiDAL"),
        r_id=kw.pop("r_id", 0),
        max_iter=kw.pop("max_iter", 2),
        ckpt_every=kw.pop("ckpt_every", 2),
        inf_reps=2,
        data_root=os.path.join(tmpdir, "sequences"),
        processing_root=os.path.join(tmpdir, "Processing_files"),
        checkpoint_root=os.path.join(tmpdir, "check_points"),
        data_override=dataclasses.replace(data, **kw.pop("data_kw", {})),
        **kw,
    )
