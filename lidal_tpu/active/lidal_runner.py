"""LiDAL scoring round orchestrator (reference ``score/sv_level/LiDAL.py`` main).

Flow per round r >= 1 (all paths per the reference taxonomy):

1. accumulate previous-round sv flags per sequence (round 1 reads the 0r
   bootstrap) with frame offsets + current-round save paths (``:137-167``);
2. for every frame: score inter-frame divergence/entropy against its 24
   pose-registered neighbors — on device, with neighbor hash grids cached in a
   sliding window (consecutive frames share 22/24 neighbors);
3. aggregate per supervoxel; lazily persist global sv_pnums / sv_centers with the
   per-sequence +1000*seq_idx center offset (``:175-222``);
4. greedy AL + SL selection; write per-frame flag npys for round r (``:230-330``).

Fixed-capacity padding keeps every device call at one compiled shape.
"""

from __future__ import annotations

import dataclasses
import os
from collections import OrderedDict
from typing import Dict, List, Sequence

import numpy as np

from lidal_tpu.active import lidal
from lidal_tpu.config import RunConfig
from lidal_tpu.data.selection import load_sv_info
from lidal_tpu.prep.grid import load_grid_points
from lidal_tpu.runtime.paths import Paths, ensure_dir


def _prev_prob_dir(cfg: RunConfig, seq: str) -> str:
    """prob maps of the previous round (LiDAL.py:188-191): r==1 reads fr/0r."""
    if cfg.r_id == 1:
        prev = dataclasses.replace(cfg, r_id=0, label_unit="fr")
    else:
        prev = dataclasses.replace(cfg, r_id=cfg.r_id - 1, label_unit="sv")
    return Paths(prev).prob_dir(seq)


class _NeighborCache:
    """Device-resident LRU of (hash grid, prob map) per (seq, frame index).

    Consecutive query frames share 22/24 neighbors; caching both the grid AND
    the ~10 MB probability map ON DEVICE removes the per-frame host->device
    re-upload that dominated round-1 scoring wall-clock."""

    def __init__(self, cap_points: int, num_classes: int, max_entries: int = 40):
        self.cap = cap_points
        self.num_classes = num_classes
        self.max_entries = max_entries
        self._d: "OrderedDict" = OrderedDict()

    def get(self, key, xyz_path: str, prob_path: str):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        import jax.numpy as jnp

        xyz = load_grid_points(xyz_path)
        grid = lidal.make_neighbor_grid(xyz.astype(np.float32), cap=self.cap)
        npb = np.load(prob_path).astype(np.float32)
        npb_pad = np.zeros((self.cap, npb.shape[1]), np.float32)
        npb_pad[: min(len(npb), self.cap)] = npb[: self.cap]
        self._d[key] = (grid, jnp.asarray(npb_pad), len(xyz))
        if len(self._d) > self.max_entries:
            self._d.popitem(last=False)
        return self._d[key]


def run_lidal_round(
    cfg: RunConfig,
    train_split: Sequence[str] | None = None,
    train_point_num: int | None = None,
    verbose: bool = False,
) -> lidal.SelectionResult:
    """Execute one full LiDAL scoring + selection round; writes flag files and
    returns the selection result."""
    assert cfg.r_id >= 1
    assert cfg.metric_name.startswith("LiDAL")
    data = cfg.data
    split = list(train_split or data.train_split)
    tpn = train_point_num or data.train_point_num
    paths = Paths(cfg)
    cap = data.point_cap

    # ---- 1. previous-round flags --------------------------------------------------
    sv_flags_list: List[np.ndarray] = []
    save_paths: List[str] = []
    frame_names: Dict[str, List[str]] = {}
    prev_flag_dirs = {}
    for seq in split:
        if cfg.r_id == 1:
            fdir = paths.sv_flag_dir(seq, r_id=0)
        else:
            fdir = Paths(dataclasses.replace(cfg, r_id=cfg.r_id - 1)).sv_flag_dir(seq)
        prev_flag_dirs[seq] = fdir
        names = sorted(f[:-4] for f in os.listdir(fdir) if f.endswith(".npy"))
        frame_names[seq] = names
        out_dir = ensure_dir(paths.sv_flag_dir(seq))
        for name in names:
            sv_flags_list.append(np.load(os.path.join(fdir, f"{name}.npy")).astype(np.int64))
            save_paths.append(os.path.join(out_dir, f"{name}.npy"))
    frame_sv_offsets = np.cumsum([0] + [len(f) for f in sv_flags_list])
    sv_flags = np.concatenate(sv_flags_list) if sv_flags_list else np.zeros(0, np.int64)
    n_sv_total = len(sv_flags)

    # ---- 2-3. score + aggregate ---------------------------------------------------
    sv_interds = np.zeros(n_sv_total, np.float32)
    sv_interes = np.zeros(n_sv_total, np.float32)
    stats_dir = os.path.join(cfg.processing_root, cfg.dataset_name, "super_voxel", "KMeans")
    pnums_path = os.path.join(stats_dir, "sv_pnums.npy")
    centers_path = os.path.join(stats_dir, "sv_centers.npy")
    sv_pre = os.path.exists(pnums_path)
    if sv_pre:
        sv_pnums = np.load(pnums_path)
        sv_centers = np.load(centers_path)
    else:
        sv_pnums = np.zeros(n_sv_total, np.int64)
        sv_centers = np.zeros((n_sv_total, 3), np.float32)

    for seq_idx, seq in enumerate(split):
        prob_dir = _prev_prob_dir(cfg, seq)
        grid_dir = paths.grid_dir(seq)
        svi_dir = paths.supervoxel_dir(seq, "KMeans")
        names = frame_names[seq]
        cache = _NeighborCache(cap_points=cap, num_classes=data.num_classes)
        for fi, name in enumerate(names):
            q_prob = np.load(os.path.join(prob_dir, f"{name}.npy")).astype(np.float32)
            q_xyz = load_grid_points(os.path.join(grid_dir, f"{name}.npz")).astype(np.float32)
            p = len(q_prob)
            assert len(q_xyz) == p, (seq, name, len(q_xyz), p)

            nei = lidal.neighbor_ids(fi, len(names))
            nei_probs, nei_grids = [], []
            for ni in nei:
                nname = names[ni]
                grid, npb_dev, _ = cache.get(
                    (seq, ni),
                    os.path.join(grid_dir, f"{nname}.npz"),
                    os.path.join(prob_dir, f"{nname}.npy"),
                )
                nei_probs.append(npb_dev)
                nei_grids.append(grid)

            # pad query to the fixed capacity -> one compiled shape for all frames
            qp = np.zeros((cap, q_prob.shape[1]), np.float32)
            qp[:p] = q_prob[:cap]
            qx = np.zeros((cap, 3), np.float32)
            qx[:p] = q_xyz[:cap]
            interd, intere = lidal.score_frame(qp, qx, nei_probs, nei_grids)
            interd, intere = interd[:p], intere[:p]

            point2sv, sv_gid = load_sv_info(os.path.join(svi_dir, f"{name}.npz"))
            n_sv = len(sv_gid)
            if sv_pre:
                d, e, _ = lidal.sv_aggregate(interd, intere, point2sv, n_sv)
            else:
                d, e, cnt, ctr = lidal.sv_aggregate(interd, intere, point2sv, n_sv, q_xyz)
                sv_pnums[sv_gid] = cnt
                # +1000 * seq idx so centers of different sequences never collide
                # (LiDAL.py:218)
                sv_centers[sv_gid] = ctr + seq_idx * 1000.0
            sv_interds[sv_gid] = d
            sv_interes[sv_gid] = e
            if verbose:
                print(f"Processing frame {seq}_{fi}")

    if not sv_pre:
        ensure_dir(stats_dir)
        np.save(pnums_path, sv_pnums)
        np.save(centers_path, sv_centers)

    # ---- 4. selection + save ------------------------------------------------------
    result = lidal.select(sv_flags, sv_interds, sv_interes, sv_pnums, sv_centers, tpn)
    for i, sp in enumerate(save_paths):
        np.save(sp, result.sv_flags[frame_sv_offsets[i] : frame_sv_offsets[i + 1]])
    return result
