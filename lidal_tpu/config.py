"""Typed configuration for the whole framework.

The reference scatters its configuration across hard-coded constants and a 5-tuple
CLI (``dataset_name, model_name, label_unit, metric_name, r_id`` — reference
``train.py:208-219``); here everything lives in two frozen dataclasses, and the
artifact-path taxonomy (reference ``Processing_files``/``check_points`` trees) is
derived from them in ``runtime/paths.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Per-dataset constants (reference ``dataset/sk_dataset.py:56``,
    ``dataset/sk_dataloader.py:16-21``, ``dataset/nu_dataloader.py:18``)."""

    name: str  # 'SK' | 'NU'
    num_classes: int
    scale: float = 20.0  # voxel = 0.05 m
    full_scale: int = 8192
    batch_size: int = 5
    # Fixed capacities (TPU static shapes): raw points per frame and voxels per level.
    point_cap: int = 131072
    level_caps: Tuple[int, ...] = (131072, 49152, 16384, 6144, 2048)
    train_split: Tuple[str, ...] = ()
    val_split: Tuple[str, ...] = ()
    # Total train-split point counts used for the 1% selection budgets
    # (reference score/sv_level/LiDAL.py:127,132).
    train_point_num: int = 0


SK_CONFIG = DataConfig(
    name="SK",
    num_classes=19,
    batch_size=5,
    train_split=("00", "01", "02", "03", "04", "05", "06", "07", "09", "10"),
    val_split=("08",),
    train_point_num=2_349_559_532,
)

NU_CONFIG = DataConfig(
    name="NU",
    num_classes=16,
    batch_size=15,
    point_cap=65536,
    level_caps=(65536, 24576, 8192, 3072, 1024),
    train_point_num=976_677_792,
)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """One active-learning run (the reference CLI 5-tuple + training statics)."""

    dataset_name: str = "SK"  # 'SK' | 'NU'
    model_name: str = "Mink"  # contains 'Mink' or 'SPVCNN' (reference train.py:38-47)
    label_unit: str = "sv"  # 'fr' | 'sv'
    metric_name: str = "LiDAL"
    r_id: int = 0
    max_iter: int = 20000  # reference train.py:166
    ckpt_every: int = 500  # reference train.py:150
    inf_reps: int = 8  # reference score/prob_inference.py:241
    # Views computed per device dispatch inside multi-view inference.  All
    # inf_reps views at SemanticKITTI capacity (131k voxels) exceed one v5e
    # chip's HBM; views run in chunks of this size (largest divisor of
    # inf_reps <= view_chunk) and their softmax probabilities are summed —
    # the view MEAN is identical for any chunking.
    view_chunk: int = 4
    # Frames computed per device dispatch inside multi-view inference: the
    # per-frame graphs are chained with ``lax.map`` (sequential, so HBM holds
    # one view chunk of FORWARD state regardless), amortizing the host->device
    # dispatch cost over F frames.  Dispatch is pure orchestration overhead —
    # ~ms on a local TPU host, up to ~1 s through a tunneled backend.  Larger
    # blocks cut dispatches, but the OUTPUT staging scales linearly with F:
    # with the one-block pipeline lookahead, two blocks of [F, P, C] prob
    # (+ [F, P, 96] outfeat when requested) are live at once — ~0.5 GB at
    # F=4 / SemanticKITTI capacity with outfeat — so very large values trade
    # HBM headroom for dispatch count.  Outputs are per-frame and bitwise
    # independent of the blocking.
    frames_per_dispatch: int = 4
    seed: int = 7122  # reference train.py:23
    data_root: str = "Semantic_kitti/dataset/sequences"
    nu_root: str = "nuScenes"
    processing_root: str = "Processing_files"
    checkpoint_root: str = "check_points"
    # Reference-parity mode: reproduce the reference's frame-level selections
    # VERBATIM, including its quirks — the zero-prefix score indexing that makes
    # ENT/MAR/CONF/SEGENT select via argpartition over all-zero scores
    # (reference softmax_entropy.py:83,101,106-111; SURVEY quirk 1) and MAR's
    # largest-margin direction (margin_sampling.py:109-111; quirk 2).  Off by
    # default = intended-semantics scoring (index-aligned scores).  RAND's
    # with-replacement draw and CSET are identical in both modes.
    reference_parity: bool = False
    # Fused single-pass active rounds (LiDAL, r >= 1): multi-view inference
    # feeds the scoring ring on device instead of round-tripping every frame's
    # ~10 MB prob map through npy files (active/lidal_runner.py:
    # run_fused_lidal_round).  Prob maps, scores, and selections are bitwise
    # identical to the staged pipeline, and the prob/pred npy artifacts are
    # still written (async).  Disable to force the reference's staged
    # inference-then-score flow in run_experiment.
    fused_round: bool = True
    # Override the dataset constants (capacities, splits, ...) — e.g. for tests
    # or differently-sized deployments.
    data_override: Optional[DataConfig] = None

    @property
    def data(self) -> DataConfig:
        if self.data_override is not None:
            return self.data_override
        return SK_CONFIG if self.dataset_name == "SK" else NU_CONFIG

    @property
    def is_spvcnn(self) -> bool:
        return "SPVCNN" in self.model_name
