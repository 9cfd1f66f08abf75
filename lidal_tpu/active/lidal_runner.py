"""LiDAL scoring round orchestrator (reference ``score/sv_level/LiDAL.py`` main).

Flow per round r >= 1 (all paths per the reference taxonomy):

1. accumulate previous-round sv flags per sequence (round 1 reads the 0r
   bootstrap) with frame offsets + current-round save paths (``:137-167``);
2. for every frame: score inter-frame divergence/entropy against its 24
   pose-registered neighbors — on device, with neighbor hash grids and
   grid-sorted probability maps resident in a per-device RING of slots
   (consecutive frames share 22/24 neighbors: two in-place slot writes per
   frame instead of any re-stack or re-upload);
3. aggregate per supervoxel; lazily persist global sv_pnums / sv_centers with the
   per-sequence +1000*seq_idx center offset (``:175-222``);
4. greedy AL + SL selection; write per-frame flag npys for round r (``:230-330``).

Parallelism: each sequence's frame list is split contiguously across the local
devices (the reference scored with a 24-process CPU pool, ``LiDAL.py:204``, and
sharded its inference loader across all GPUs, ``sk_dataloader.py:196-198``);
one host thread per device runs load -> dispatch -> aggregate with a one-frame
IO readahead.  Per-frame results are independent and supervoxel writes are
disjoint, so the selection output is bit-identical for any device count.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from lidal_tpu.active import lidal
from lidal_tpu.active.nn_match import build_grid
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


@functools.partial(jax.jit, static_argnames=("cell",))
def _build_entry(xyz_pad, valid, prob_pad, cell: float = lidal.DIS_THRESH):
    """One neighbor: hash grid + probability map permuted into grid order."""
    grid = build_grid(xyz_pad, valid, cell)
    return grid, prob_pad[grid.src_idx]


@functools.partial(jax.jit, donate_argnums=(0,))
def _ring_write(state, slot, grid, prob_sorted):
    grids, probs = state
    grids = jax.tree_util.tree_map(lambda a, b: a.at[slot].set(b), grids, grid)
    return grids, probs.at[slot].set(prob_sorted)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("cell",))
def _ring_insert(state, slot, buf, n, cell: float = lidal.DIS_THRESH):
    """Fused insert: build the frame's hash grid + grid-sorted prob and write
    ring slot ``slot`` in ONE dispatch.  ``buf`` is one packed [cap, 3 + C] f32
    upload (xyz | prob); validity derives from the point count ``n`` on device.
    Remote backends pay per host<->device RPC, so the steady-state cost per
    scored frame is exactly: 1 buf upload + this dispatch + 1 score dispatch
    + 1 stacked result pull."""
    import jax.numpy as jnp

    xyz = buf[:, :3]
    prob = buf[:, 3:]
    valid = jnp.arange(buf.shape[0], dtype=jnp.int32) < n
    grid = build_grid(xyz, valid, cell)
    return _ring_write(state, slot, grid, prob[grid.src_idx])


class NeighborRing:
    """Per-device ring of (hash grid, grid-sorted prob) slots, stacked on a
    leading slot axis so scoring is ONE kernel launch over all neighbors.

    Consecutive query frames share 22/24 neighbors; only evicted slots are
    rewritten (donated in-place update).  Duplicate neighbor ids (the
    reference's end-of-sequence reflection) ride a per-frame weight vector."""

    def __init__(self, nslots: int, cap: int, device=None):
        import jax.numpy as jnp

        self.nslots = nslots
        self.cap_in = cap
        self.device = device
        self.key2slot: Dict = {}
        self.free = list(range(nslots))
        self.state = None  # allocated on first ensure() (class count from data)
        self.meta: Dict = {}  # key -> (true point count, host xyz) for aggregation

        def put(x):
            return jax.device_put(x, device) if device is not None else jnp.asarray(x)

        self._put = put

    def _alloc(self, num_classes: int) -> None:
        # probe one build to learn the grid's rounded capacity/leaf shapes
        probe_g, probe_p = _build_entry(
            self._put(np.zeros((self.cap_in, 3), np.float32)),
            self._put(np.zeros((self.cap_in,), bool)),
            self._put(np.zeros((self.cap_in, num_classes), np.float32)),
        )
        grids = jax.tree_util.tree_map(
            lambda l: self._put(np.zeros((self.nslots,) + l.shape, l.dtype)), probe_g
        )
        probs = self._put(np.zeros((self.nslots,) + probe_p.shape, probe_p.dtype))
        self.state = (grids, probs)

    def ensure(self, keys: Sequence, loader) -> None:
        """Make every key resident; ``loader(key) -> (xyz [n,3], prob [n,c])``."""
        wanted = set(keys)
        missing = [k for k in wanted if k not in self.key2slot]
        if not missing:
            return
        for k in [k for k in list(self.key2slot) if k not in wanted]:
            self.free.append(self.key2slot.pop(k))
            self.meta.pop(k, None)
        for k in missing:
            xyz, prob = loader(k)
            if self.state is None:
                self._alloc(prob.shape[1])
            n = min(len(xyz), self.cap_in)
            self.meta[k] = (n, xyz)
            # one packed upload (xyz | prob) + one fused build+write dispatch
            buf = np.zeros((self.cap_in, 3 + prob.shape[1]), np.float32)
            buf[:n, :3] = xyz[:n]
            buf[:n, 3:] = prob[:n]
            slot = self.free.pop()
            self.state = _ring_insert(self.state, slot, self._put(buf), n)
            self.key2slot[k] = slot

    def weights(self, keys: Sequence) -> np.ndarray:
        """Per-slot multiplicity of ``keys`` (0 for unused slots)."""
        w = np.zeros((self.nslots,), np.float32)
        for k in keys:
            w[self.key2slot[k]] += 1.0
        return w


def _device_chunks(n: int, devices) -> List[range]:
    """Contiguous frame ranges per device (contiguity preserves ring reuse)."""
    d = len(devices)
    per = -(-n // d)
    return [range(i * per, min((i + 1) * per, n)) for i in range(d)]


def run_lidal_round(
    cfg: RunConfig,
    train_split: Sequence[str] | None = None,
    train_point_num: int | None = None,
    verbose: bool = False,
    devices: Optional[Sequence] = None,
) -> lidal.SelectionResult:
    """Execute one full LiDAL scoring + selection round; writes flag files and
    returns the selection result.  Frames are scored in parallel over
    ``devices`` (default: all local devices)."""
    import jax
    import jax.numpy as jnp

    assert cfg.r_id >= 1
    assert cfg.metric_name.startswith("LiDAL")
    data = cfg.data
    split = list(train_split or data.train_split)
    tpn = train_point_num or data.train_point_num
    paths = Paths(cfg)
    cap = data.point_cap
    devices = list(devices) if devices is not None else jax.local_devices()

    # ---- 1. previous-round flags --------------------------------------------------
    sv_flags_list: List[np.ndarray] = []
    save_paths: List[str] = []
    frame_names: Dict[str, List[str]] = {}
    for seq in split:
        if cfg.r_id == 1:
            fdir = paths.sv_flag_dir(seq, r_id=0)
        else:
            fdir = Paths(dataclasses.replace(cfg, r_id=cfg.r_id - 1)).sv_flag_dir(seq)
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
    agg_lock = threading.Lock()

    for seq_idx, seq in enumerate(split):
        prob_dir = _prev_prob_dir(cfg, seq)
        grid_dir = paths.grid_dir(seq)
        svi_dir = paths.supervoxel_dir(seq, "KMeans")
        names = frame_names[seq]
        chunks = _device_chunks(len(names), devices)

        def load_frame(ni: int):
            nname = names[ni]
            xyz = load_grid_points(os.path.join(grid_dir, f"{nname}.npz")).astype(np.float32)
            prob = np.load(os.path.join(prob_dir, f"{nname}.npy")).astype(np.float32)
            return xyz, prob

        def aggregate(fi: int, p: int, q_xyz, scores_j):
            """Pull one frame's device results (ONE [2, cap] transfer) and
            fold into the sv arrays."""
            name = names[fi]
            scores = np.asarray(scores_j)
            interd = scores[0, :p]
            intere = scores[1, :p]
            point2sv, sv_gid = load_sv_info(os.path.join(svi_dir, f"{name}.npz"))
            n_sv = len(sv_gid)
            if sv_pre:
                d, e, _ = lidal.sv_aggregate(interd, intere, point2sv, n_sv)
                with agg_lock:
                    sv_interds[sv_gid] = d
                    sv_interes[sv_gid] = e
            else:
                d, e, cnt, ctr = lidal.sv_aggregate(interd, intere, point2sv, n_sv, q_xyz)
                with agg_lock:
                    sv_pnums[sv_gid] = cnt
                    # +1000 * seq idx so centers of different sequences never
                    # collide (LiDAL.py:218)
                    sv_centers[sv_gid] = ctr + seq_idx * 1000.0
                    sv_interds[sv_gid] = d
                    sv_interes[sv_gid] = e
            if verbose:
                print(f"Processing frame {seq}_{fi}")

        def worker(dev_idx: int):
            dev = devices[dev_idx]
            chunk = chunks[dev_idx]
            if len(chunk) == 0:
                return
            # +2 slots: the query frame itself stays resident (it becomes a
            # neighbor of the next 12 frames — zero re-upload), plus slack for
            # end-of-sequence reflection windows.
            ring = NeighborRing(lidal.NEI_NUM + 2, cap, device=dev)
            put = ring._put
            io = ThreadPoolExecutor(max_workers=1)

            def prefetch(fi):
                """Warm the ring for frame fi on the IO thread (host loads)."""
                ring.ensure([fi] + lidal.neighbor_ids(fi, len(names)), load_frame)

            nxt = io.submit(prefetch, chunk[0])
            pending = None  # (fi, p, q_xyz, stacked [2, cap] scores)
            for fi in chunk:
                nxt.result()
                nei = lidal.neighbor_ids(fi, len(names))
                w = put(ring.weights(nei))
                slot = ring.key2slot[fi]
                p, q_xyz = ring.meta[fi]
                scores_j = lidal.score_slot(ring.state, slot, w)
                if fi + 1 in chunk:
                    nxt = io.submit(prefetch, fi + 1)
                if pending is not None:
                    aggregate(*pending)  # drains frame i-1 while frame i computes
                pending = (fi, p, q_xyz, scores_j)
            if pending is not None:
                aggregate(*pending)
            io.shutdown(wait=False)

        if len(devices) == 1:
            worker(0)
        else:
            # A worker failure must fail the ROUND: a died thread would leave
            # its device's frames silently scored zero, corrupting selection.
            errors: List[BaseException] = []

            def guarded(i: int):
                try:
                    worker(i)
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    errors.append(e)

            threads = [
                threading.Thread(target=guarded, args=(i,)) for i in range(len(devices))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errors:
                raise errors[0]

    if not sv_pre:
        ensure_dir(stats_dir)
        np.save(pnums_path, sv_pnums)
        np.save(centers_path, sv_centers)

    # ---- 4. selection + save ------------------------------------------------------
    result = lidal.select(sv_flags, sv_interds, sv_interes, sv_pnums, sv_centers, tpn)
    for i, sp in enumerate(save_paths):
        np.save(sp, result.sv_flags[frame_sv_offsets[i] : frame_sv_offsets[i + 1]])
    return result
