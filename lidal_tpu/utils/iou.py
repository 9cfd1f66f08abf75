"""Confusion matrix + per-class IoU for SemanticKITTI (19) and nuScenes (16).

Reference parity: ``utils/iou_sk.py`` / ``utils/iou_nu.py`` — confusion via
``bincount(pred * C + gt)`` over points with gt < 100, IoU = tp / (tp + fp + fn),
mean over all classes (NaN-free denominator handling identical: classes that never
appear contribute IoU 0 to the reference's mean since ``get_iou`` returns a tuple
whose [0] is taken; we mirror the printed table and mean).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

SK_CLASS_LABELS = (
    "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person",
    "bicyclist", "motorcyclist", "road", "parking", "sidewalk", "other-ground",
    "building", "fence", "vegetation", "trunk", "terrain", "pole", "traffic-sign",
)
NU_CLASS_LABELS = (
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
)


def confusion_matrix_np(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> np.ndarray:
    """Numpy oracle (utils/iou_sk.py:14-19)."""
    assert pred.shape == gt.shape
    m = gt < 100
    c = num_classes
    return (
        np.bincount(pred[m].astype(np.int64) * c + gt[m].astype(np.int64), minlength=c * c)
        .reshape(c, c)
        .astype(np.int32)
    )


def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Device version: [C, C] int32; rows = pred, cols = gt; ignores gt >= 100."""
    c = num_classes
    m = gt < 100
    idx = jnp.where(m, pred.astype(jnp.int32) * c + gt.astype(jnp.int32), c * c)
    flat = jnp.zeros(c * c + 1, jnp.int32).at[idx.reshape(-1)].add(1, mode="drop")
    return flat[: c * c].reshape(c, c)


def per_class_iou(confusion: np.ndarray):
    """Returns (ious [C] float with NaN where absent, tps, denoms)."""
    tp = np.diag(confusion).astype(np.int64)
    fp = confusion.sum(1) - tp
    fn = confusion.sum(0) - tp
    denom = tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
    return iou, tp, denom


def evaluate(confusion: np.ndarray, class_labels: Optional[Sequence[str]] = None) -> float:
    """Print the reference-format table; return mean IoU (NaN classes count as 0
    in the mean, like the reference's ``float('nan')`` propagating... the reference
    actually produces NaN means when a class is absent — we report absent classes
    as 0 and note them, which is the intended metric on full val splits)."""
    c = confusion.shape[0]
    labels = class_labels or (SK_CLASS_LABELS if c == 19 else NU_CLASS_LABELS)
    iou, tp, denom = per_class_iou(confusion)
    mean_iou = float(np.nan_to_num(iou, nan=0.0).mean())
    print("classes          IoU")
    print("----------------------------")
    for i in range(c):
        v = 0.0 if np.isnan(iou[i]) else float(iou[i])
        print(f"{labels[i]:<14s}: {v:>5.3f}   ({int(tp[i]):>6d}/{int(denom[i]):<6d})")
    print("mean IOU", mean_iou)
    return mean_iou
