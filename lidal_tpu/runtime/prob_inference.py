"""Multi-view probability inference over the train split.

Reference parity: ``score/prob_inference.py:21-133`` — for every train frame run
``inf_reps`` (8) independently-augmented forward passes, softmax, average over
views, save per-point ``prob_map`` / ``pred`` / optional ``outfeat`` npy per
(seq, frame).  TPU-natively the 8 views are a vmapped leading axis prepared and
reduced entirely on device; only the final [P, C] arrays cross to host for saving.

Parallelism (the reference ran this stage on every GPU of the node,
``sk_dataloader.py:196-198`` + ``prob_inference.py:129-133``): the frame list
splits contiguously across the local devices; one host thread per device runs a
load -> dispatch -> collect pipeline over BLOCKS of ``cfg.frames_per_dispatch``
frames (one device dispatch per block — dispatch is pure orchestration cost),
with one block of IO readahead, one block of dispatch lookahead (the device
computes block i+1 while the host drains and saves block i), and asynchronous
npy writes.  Augmentation keys derive from the GLOBAL frame index, so outputs
are identical for any device count and any blocking.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidal_tpu.config import RunConfig
from lidal_tpu.data.pipeline import prepare_eval_batch
from lidal_tpu.runtime.evaluate import project_logits_to_points
from lidal_tpu.runtime.paths import Paths, ensure_dir


def wants_outfeat(cfg: RunConfig) -> bool:
    """reference prob_inference.py:103,116,131: r0 or metric in {ReDAL, CSET}."""
    return cfg.r_id == 0 or cfg.metric_name in ("ReDAL", "CSET")


def make_multiview_fn(
    cfg: RunConfig, eval_step: Callable, with_feat: Optional[bool] = None, frames: int = 0
):
    """Builds jitted (variables, keys [R], xyz [P,3], sig, valid) ->
    (prob_mean [P,C] f32, pred [P] i32, outfeat_mean [P,F] f32 | None).

    ``with_feat`` defaults to :func:`wants_outfeat`; when False the per-view
    feature projection/mean is dropped from the graph entirely (LiDAL rounds
    >= 1 never read outfeat — reference prob_inference.py:103,116,131).

    Views run in chunks of ``cfg.view_chunk`` under ``lax.map``: all 8 views at
    SemanticKITTI capacity in one fused graph exceed a v5e chip's HBM (probed:
    reps=4 fits, reps=8 aborts).  Each chunk's softmax probabilities/features
    are summed and the mean is taken over all views at the end — identical to
    the reference's single mean over 8 views (prob_inference.py:107-118).

    With ``frames >= 1`` every argument past ``variables`` gains a leading [F]
    axis and the per-frame graph runs under an outer sequential ``lax.map`` —
    ONE device dispatch computes F frames (see ``RunConfig.frames_per_dispatch``)
    while HBM still holds a single view chunk at a time.  ``frames == 0``
    (default) keeps the unbatched single-frame signature."""
    data = cfg.data
    reps = cfg.inf_reps
    if with_feat is None:
        with_feat = wants_outfeat(cfg)
    chunk = max(1, min(cfg.view_chunk, reps))
    while reps % chunk:
        chunk -= 1

    def run(variables, keys, xyz, sig, valid):
        assert keys.shape[0] == reps, (keys.shape, reps)
        xyz_r = jnp.broadcast_to(xyz, (chunk,) + xyz.shape)
        sig_r = jnp.broadcast_to(sig, (chunk,) + sig.shape)
        val_r = jnp.broadcast_to(valid, (chunk,) + valid.shape)

        def one_chunk(keys_c):
            eb = prepare_eval_batch(
                keys_c,
                xyz_r,
                sig_r,
                val_r,
                level_caps=data.level_caps,
                scale=data.scale,
                full_scale=data.full_scale,
                with_points=cfg.is_spvcnn,
            )
            if cfg.is_spvcnn:
                logits, feat = eval_step(variables, eb.feats, eb.plan, eb.pplan)
            else:
                logits, feat = eval_step(variables, eb.feats, eb.plan)
            logits_p = jax.vmap(project_logits_to_points)(logits, eb.inverse)  # [c, P, C]
            prob = jax.nn.softmax(logits_p.astype(jnp.float32), axis=-1)
            if not with_feat:
                return prob.sum(axis=0)
            feat_p = jax.vmap(project_logits_to_points)(feat, eb.inverse).astype(jnp.float32)
            return prob.sum(axis=0), feat_p.sum(axis=0)

        # keys may be raw uint32 [reps, 2] or typed [reps]; keep trailing dims
        keys_c = keys.reshape((reps // chunk, chunk) + keys.shape[1:])
        if with_feat:
            prob_sums, feat_sums = jax.lax.map(one_chunk, keys_c)
            feat_mean = feat_sums.sum(axis=0) / reps
        else:
            prob_sums = jax.lax.map(one_chunk, keys_c)
            feat_mean = None
        prob_mean = prob_sums.sum(axis=0) / reps
        pred = jnp.argmax(prob_mean, axis=-1).astype(jnp.int32)
        return prob_mean, pred, feat_mean

    if frames == 0:
        return jax.jit(run)

    @jax.jit
    def run_block(variables, keys, xyz, sig, valid):
        # [F]-leading args.  Every frames >= 1 path lowers the SAME traced
        # per-frame body under lax.map, so outputs are bitwise invariant to
        # the blocking (tests/test_parallel_drivers.py asserts fd=4 == fd=1).
        # Only the frames == 0 standalone jit above compiles a differently
        # scheduled graph and may differ in the last ulp.
        return jax.lax.map(lambda a: run(variables, *a), (keys, xyz, sig, valid))

    return run_block


def _device_chunks(n: int, d: int):
    per = -(-n // d)
    return [range(i * per, min((i + 1) * per, n)) for i in range(d)]


def run_prob_inference(
    cfg: RunConfig,
    eval_step: Callable,
    variables,
    files: Sequence[str],
    read_fn: Callable,  # path -> (xyz, sig, labels-or-None)
    frame_id_fn: Callable,  # path -> (seq, frame)
    point_cap: Optional[int] = None,
    save: bool = True,
    verbose: bool = False,
    devices: Optional[Sequence] = None,
):
    """Run the full multi-view dump; returns {(seq, frame): (prob, pred, feat|None)}
    when ``save`` is False (for tests), else writes npy files and returns None."""
    from lidal_tpu.data.pipeline import pad_points

    paths = Paths(cfg)
    data = cfg.data
    cap = point_cap or data.point_cap
    with_feat = wants_outfeat(cfg)
    fd = max(1, cfg.frames_per_dispatch)
    fn = make_multiview_fn(cfg, eval_step, frames=fd)
    base_key = jax.random.PRNGKey(cfg.seed)
    devices = list(devices) if devices is not None else jax.local_devices()
    results = {} if not save else None
    res_lock = threading.Lock()
    chunks = _device_chunks(len(files), len(devices))

    def load(idx: int):
        xyz, sig, _ = read_fn(files[idx])
        n = len(xyz)
        oxyz, osig, ovalid, _ = pad_points(xyz, sig, None, cap)
        # keys from the GLOBAL index: device-count invariant
        keys = jax.random.split(jax.random.fold_in(base_key, idx), cfg.inf_reps)
        return n, oxyz, osig, ovalid, keys

    def load_block(blk):
        """Load a block of frame indices; pad to ``fd`` by repeating the last
        frame (pad outputs are dropped by :func:`emit_block`).

        The pad slots DO run full multi-view forwards whose outputs are
        discarded — up to ``fd - 1`` wasted frame-computes, but only on the
        single final partial block of each device's chunk (amortized to ~0
        over a real train-split run; compiling a second residual-size block
        graph is not worth it for that tail)."""
        items = [load(idx) for idx in blk]
        while len(items) < fd:
            items.append(items[-1])
        ns = [it[0] for it in items]
        oxyz = np.stack([it[1] for it in items])
        osig = np.stack([it[2] for it in items])
        ovalid = np.stack([it[3] for it in items])
        keys = jnp.stack([it[4] for it in items])
        return ns, oxyz, osig, ovalid, keys

    def emit_block(io, blk, ns, out):
        prob_j, pred_j, feat_j = out
        prob_b = np.asarray(prob_j)  # [F, P, C]
        pred_b = np.asarray(pred_j)
        feat_b = np.asarray(feat_j) if with_feat else None
        for j, idx in enumerate(blk):
            n = ns[j]
            prob = prob_b[j, :n]
            pred = pred_b[j, :n]
            feat_np = feat_b[j, :n] if with_feat else None
            seq, frame = frame_id_fn(files[idx])
            if save:
                def write(seq=seq, frame=frame, prob=prob, pred=pred, feat_np=feat_np):
                    np.save(os.path.join(ensure_dir(paths.prob_dir(seq)), f"{frame}.npy"), prob)
                    np.save(os.path.join(ensure_dir(paths.pred_dir(seq)), f"{frame}.npy"), pred)
                    if with_feat:
                        np.save(
                            os.path.join(ensure_dir(paths.outfeat_dir(seq)), f"{frame}.npy"),
                            feat_np,
                        )
                io.submit(write)
            else:
                with res_lock:
                    results[(seq, frame)] = (prob, pred, feat_np)
            if verbose:
                print(f"Processing {seq}/{frame}")

    def worker(di: int):
        chunk = list(chunks[di])
        if len(chunk) == 0:
            return
        dev = devices[di]
        vars_d = jax.device_put(variables, dev) if len(devices) > 1 else variables

        def put(x):
            return jax.device_put(x, dev) if len(devices) > 1 else jnp.asarray(x)

        blocks = [chunk[i : i + fd] for i in range(0, len(chunk), fd)]
        io = ThreadPoolExecutor(max_workers=2)
        next_load = io.submit(load_block, blocks[0])
        pending = None  # (blk, ns, dispatched outputs)
        for bi, blk in enumerate(blocks):
            ns, oxyz, osig, ovalid, keys = next_load.result()
            if bi + 1 < len(blocks):
                next_load = io.submit(load_block, blocks[bi + 1])
            out = fn(vars_d, put(keys), put(oxyz), put(osig), put(ovalid))
            if pending is not None:
                emit_block(io, *pending)  # drains block i-1 while block i computes
            pending = (blk, ns, out)
        if pending is not None:
            emit_block(io, *pending)
        io.shutdown(wait=True)

    if len(devices) == 1:
        worker(0)
    else:
        # A worker failure must fail the RUN: a died thread would silently
        # leave its device's frames without prob/pred dumps.
        errors: list = []

        def guarded(i: int):
            try:
                worker(i)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errors.append(e)

        threads = [threading.Thread(target=guarded, args=(i,)) for i in range(len(devices))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
    return results
