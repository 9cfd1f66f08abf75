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


def _prev_cfg(cfg: RunConfig) -> RunConfig:
    """The previous round's config (LiDAL.py:188-191): r==1 reads fr/0r."""
    if cfg.r_id == 1:
        return dataclasses.replace(cfg, r_id=0, label_unit="fr")
    return dataclasses.replace(cfg, r_id=cfg.r_id - 1, label_unit="sv")


def _prev_prob_dir(cfg: RunConfig, seq: str) -> str:
    """prob maps of the previous round (LiDAL.py:188-191): r==1 reads fr/0r."""
    return Paths(_prev_cfg(cfg)).prob_dir(seq)


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


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("cell",))
def _ring_insert_devprob(state, slot, xyz_buf, n, prob, cell: float = lidal.DIS_THRESH):
    """Fused-round insert: the probability map is ALREADY device-resident (the
    multi-view inference output) — only the [cap, 3] registered coords upload;
    the 10+ MB prob map never crosses the host boundary.  Pad rows are zeroed
    so ring contents are byte-identical to the staged path's zero-padded
    upload buffer."""
    import jax.numpy as jnp

    valid = jnp.arange(xyz_buf.shape[0], dtype=jnp.int32) < n
    grid = build_grid(xyz_buf, valid, cell)
    prob = jnp.where(valid[:, None], prob.astype(jnp.float32), 0.0)
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
                self._alloc(int(prob.shape[1]))
            n = min(len(xyz), self.cap_in)
            self.meta[k] = (n, xyz)
            slot = self.free.pop()
            if isinstance(prob, jax.Array):
                # fused-round path: prob is device-resident inference output
                # [cap, C]; upload only the registered coords
                assert prob.shape[0] == self.cap_in, (prob.shape, self.cap_in)
                buf = np.zeros((self.cap_in, 3), np.float32)
                buf[:n] = xyz[:n]
                self.state = _ring_insert_devprob(self.state, slot, self._put(buf), n, prob)
            else:
                # one packed upload (xyz | prob) + one fused build+write dispatch
                buf = np.zeros((self.cap_in, 3 + prob.shape[1]), np.float32)
                buf[:n, :3] = xyz[:n]
                buf[:n, 3:] = prob[:n]
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


def _load_prev_flags(cfg: RunConfig, paths: Paths, split: Sequence[str]):
    """Stage 1 of a scoring round (LiDAL.py:137-167): concatenate the previous
    round's per-frame sv flags and compute this round's save paths."""
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
    return sv_flags, save_paths, frame_names, frame_sv_offsets


class _SvAggregator:
    """Per-supervoxel score accumulation across frames (LiDAL.py:84-103,218),
    with lazy global sv_pnums / sv_centers persistence on the first-ever round."""

    def __init__(self, cfg: RunConfig, n_sv_total: int):
        self.stats_dir = os.path.join(
            cfg.processing_root, cfg.dataset_name, "super_voxel", "KMeans"
        )
        self.pnums_path = os.path.join(self.stats_dir, "sv_pnums.npy")
        self.centers_path = os.path.join(self.stats_dir, "sv_centers.npy")
        self.pre = os.path.exists(self.pnums_path)
        if self.pre:
            self.sv_pnums = np.load(self.pnums_path)
            self.sv_centers = np.load(self.centers_path)
        else:
            self.sv_pnums = np.zeros(n_sv_total, np.int64)
            self.sv_centers = np.zeros((n_sv_total, 3), np.float32)
        self.sv_interds = np.zeros(n_sv_total, np.float32)
        self.sv_interes = np.zeros(n_sv_total, np.float32)
        self.lock = threading.Lock()

    def make_aggregate(self, seq: str, seq_idx: int, svi_dir: str, names, verbose: bool):
        """Per-sequence aggregate(fi, p, q_xyz, scores_j): pull one frame's
        device results (ONE [2, cap] transfer) and fold into the sv arrays."""

        def aggregate(fi: int, p: int, q_xyz, scores_j):
            name = names[fi]
            scores = np.asarray(scores_j)
            interd = scores[0, :p]
            intere = scores[1, :p]
            point2sv, sv_gid = load_sv_info(os.path.join(svi_dir, f"{name}.npz"))
            n_sv = len(sv_gid)
            if self.pre:
                d, e, _ = lidal.sv_aggregate(interd, intere, point2sv, n_sv)
                with self.lock:
                    self.sv_interds[sv_gid] = d
                    self.sv_interes[sv_gid] = e
            else:
                d, e, cnt, ctr = lidal.sv_aggregate(interd, intere, point2sv, n_sv, q_xyz)
                with self.lock:
                    self.sv_pnums[sv_gid] = cnt
                    # +1000 * seq idx so centers of different sequences never
                    # collide (LiDAL.py:218)
                    self.sv_centers[sv_gid] = ctr + seq_idx * 1000.0
                    self.sv_interds[sv_gid] = d
                    self.sv_interes[sv_gid] = e
            if verbose:
                print(f"Processing frame {seq}_{fi}")

        return aggregate

    def save_stats(self) -> None:
        if not self.pre:
            ensure_dir(self.stats_dir)
            np.save(self.pnums_path, self.sv_pnums)
            np.save(self.centers_path, self.sv_centers)


def _run_workers(n: int, worker) -> None:
    """Run ``worker(i)`` for each device on threads; any failure fails the
    ROUND — a died thread would leave its device's frames silently scored
    zero, corrupting selection."""
    if n == 1:
        worker(0)
        return
    errors: List[BaseException] = []

    def guarded(i: int):
        try:
            worker(i)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errors.append(e)

    threads = [threading.Thread(target=guarded, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


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
    sv_flags, save_paths, frame_names, frame_sv_offsets = _load_prev_flags(cfg, paths, split)
    n_sv_total = len(sv_flags)

    # ---- 2-3. score + aggregate ---------------------------------------------------
    agg = _SvAggregator(cfg, n_sv_total)

    for seq_idx, seq in enumerate(split):
        prob_dir = _prev_prob_dir(cfg, seq)
        grid_dir = paths.grid_dir(seq)
        svi_dir = paths.supervoxel_dir(seq, "KMeans")
        names = frame_names[seq]
        chunks = _device_chunks(len(names), devices)
        aggregate = agg.make_aggregate(seq, seq_idx, svi_dir, names, verbose)

        def load_frame(ni: int):
            nname = names[ni]
            xyz = load_grid_points(os.path.join(grid_dir, f"{nname}.npz")).astype(np.float32)
            prob = np.load(os.path.join(prob_dir, f"{nname}.npy")).astype(np.float32)
            return xyz, prob

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

        _run_workers(len(devices), worker)

    agg.save_stats()

    # ---- 4. selection + save ------------------------------------------------------
    result = lidal.select(
        sv_flags, agg.sv_interds, agg.sv_interes, agg.sv_pnums, agg.sv_centers, tpn
    )
    for i, sp in enumerate(save_paths):
        np.save(sp, result.sv_flags[frame_sv_offsets[i] : frame_sv_offsets[i + 1]])
    return result


def run_fused_lidal_round(
    cfg: RunConfig,
    eval_step,
    variables,
    read_fn,  # (seq, name) -> (xyz [n,3] f32, sig [n] f32) raw frame reader
    train_split: Sequence[str] | None = None,
    train_point_num: int | None = None,
    save_prob: bool = True,
    verbose: bool = False,
    devices: Optional[Sequence] = None,
    frame_index: Optional[Dict] = None,
) -> lidal.SelectionResult:
    """FUSED single-pass active round: multi-view probability inference and
    LiDAL scoring stream through the device together.

    The staged pipeline (reference ``score/prob_inference.py`` then
    ``score/sv_level/LiDAL.py``) couples the two stages through the
    filesystem: every frame's ~10 MB float32 prob map is pulled to host,
    written to npy, re-read, and re-uploaded for scoring.  Here the inference
    output FEEDS THE SCORING RING DIRECTLY (``_ring_insert_devprob``): per
    steady-state frame the host<->device traffic is one raw-frame upload, one
    registered-coords upload, and one [2, cap] score pull — the prob map never
    crosses the host boundary on the critical path.  ``save_prob`` still
    writes the prob/pred npy artifacts (async, off the critical path) so the
    on-disk contract is unchanged — pseudo-label training reads pred
    (reference ``sk_dataset.py:122-141``), and a resumed/staged run can reuse
    the prob dumps.

    Parity: probabilities come from the SAME blocked-dispatch graph as
    :func:`runtime.prob_inference.run_prob_inference` (``frames >= 1`` paths
    lower one traced body under ``lax.map``), with keys derived from the same
    global frame index, so prob maps, scores, and selections are bitwise
    identical to the staged pipeline for any device count
    (``tests/test_parallel_drivers.py::test_fused_round_matches_staged``).

    ``eval_step``/``variables`` must be the PREVIOUS round's model (the one
    whose prob maps round ``cfg.r_id`` scores): reference LiDAL.py:188-191.

    Args:
      frame_index: {(seq, name): global index} for augmentation keys.  Pass
        the dataset enumeration order used by ``run_prob_inference`` (the CLI
        does); defaults to split-order/sorted-name enumeration, which matches
        it whenever every train frame has a flag file.
    """
    from lidal_tpu.data.pipeline import pad_points
    from lidal_tpu.runtime.prob_inference import make_multiview_fn

    assert cfg.r_id >= 1
    assert cfg.metric_name.startswith("LiDAL")
    data = cfg.data
    split = list(train_split or data.train_split)
    tpn = train_point_num or data.train_point_num
    paths = Paths(cfg)
    cap = data.point_cap
    devices = list(devices) if devices is not None else jax.local_devices()

    inf_cfg = _prev_cfg(cfg)
    inf_paths = Paths(inf_cfg)
    # with_feat=False: LiDAL scoring never reads outfeat (prob/pred are
    # unaffected by dropping the feature branch from the graph)
    fn = make_multiview_fn(inf_cfg, eval_step, with_feat=False, frames=1)
    base_key = jax.random.PRNGKey(inf_cfg.seed)

    sv_flags, save_paths, frame_names, frame_sv_offsets = _load_prev_flags(cfg, paths, split)
    agg = _SvAggregator(cfg, len(sv_flags))

    if frame_index is None:
        frame_index = {}
        for seq in split:
            for name in frame_names[seq]:
                frame_index[(seq, name)] = len(frame_index)

    for seq_idx, seq in enumerate(split):
        grid_dir = paths.grid_dir(seq)
        svi_dir = paths.supervoxel_dir(seq, "KMeans")
        names = frame_names[seq]
        chunks = _device_chunks(len(names), devices)
        aggregate = agg.make_aggregate(seq, seq_idx, svi_dir, names, verbose)
        prob_dir = ensure_dir(inf_paths.prob_dir(seq)) if save_prob else None
        pred_dir = ensure_dir(inf_paths.pred_dir(seq)) if save_prob else None

        def worker(dev_idx: int):
            import jax.numpy as jnp

            dev = devices[dev_idx]
            chunk = chunks[dev_idx]
            if len(chunk) == 0:
                return
            own = set(chunk)  # frames this device saves (others re-infer overlap)
            vars_d = jax.device_put(variables, dev) if len(devices) > 1 else variables
            ring = NeighborRing(lidal.NEI_NUM + 2, cap, device=dev)
            put = ring._put
            io = ThreadPoolExecutor(max_workers=1)
            wr = ThreadPoolExecutor(max_workers=1)
            wr_futures: List = []  # checked at the end: a failed artifact
            # write (disk full, bad path) must fail the round, same as the
            # staged pipeline's writer-failure propagation

            def save_frame(name: str, n_raw: int, prob_j, pred_j):
                np.save(os.path.join(prob_dir, f"{name}.npy"), np.asarray(prob_j)[:n_raw])
                np.save(os.path.join(pred_dir, f"{name}.npy"), np.asarray(pred_j)[:n_raw])

            def infer_frame(ni: int):
                """Ring loader: multi-view inference ON DEVICE; only the
                registered coords upload.  Deterministic per global frame
                index, so chunk-overlap frames re-inferred by a neighboring
                device are bitwise identical."""
                name = names[ni]
                xyz_raw, sig = read_fn(seq, name)
                oxyz, osig, ovalid, _ = pad_points(xyz_raw, sig, None, cap)
                keys = jax.random.split(
                    jax.random.fold_in(base_key, frame_index[(seq, name)]),
                    inf_cfg.inf_reps,
                )
                prob_b, pred_b, _ = fn(
                    vars_d,
                    put(jnp.stack([keys])),
                    put(oxyz[None]),
                    put(osig[None]),
                    put(ovalid[None]),
                )
                prob_j, pred_j = prob_b[0], pred_b[0]
                if save_prob and ni in own:
                    wr_futures.append(wr.submit(save_frame, name, len(xyz_raw), prob_j, pred_j))
                gxyz = load_grid_points(os.path.join(grid_dir, f"{name}.npz")).astype(
                    np.float32
                )
                return gxyz, prob_j

            def prefetch(fi):
                ring.ensure([fi] + lidal.neighbor_ids(fi, len(names)), infer_frame)

            nxt = io.submit(prefetch, chunk[0])
            pending = None
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
            io.shutdown(wait=True)
            wr.shutdown(wait=True)
            for f in wr_futures:
                f.result()  # surface any artifact-write failure

        _run_workers(len(devices), worker)

    agg.save_stats()

    result = lidal.select(
        sv_flags, agg.sv_interds, agg.sv_interes, agg.sv_pnums, agg.sv_centers, tpn
    )
    for i, sp in enumerate(save_paths):
        np.save(sp, result.sv_flags[frame_sv_offsets[i] : frame_sv_offsets[i + 1]])
    return result
