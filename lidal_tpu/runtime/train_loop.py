"""The per-round training driver (reference ``train.py:17-203``).

Mode selection (reference train.py:89-109):
  r_id == 0            -> 1% random fully-labeled frames ('train_frame')
  metric == 'full'     -> whole train split
  label_unit == 'fr'   -> frames flagged by the current round's metric
  label_unit == 'sv'   -> frames with labeled supervoxels, labels masked per-point

Loop: epochs over the loader until step >= max_iter; checkpoint every
``ckpt_every`` steps (reference train.py:114-158).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidal_tpu.config import RunConfig
from lidal_tpu.data import semantic_kitti as sk
from lidal_tpu.data.loader import FrameBatchLoader
from lidal_tpu.data.pipeline import prepare_train_batch
from lidal_tpu.data.selection import (
    apply_sv_label_mask,
    bootstrap_round0,
    load_sv_info,
    sv_training_set,
    train_files_frame_level,
)
from lidal_tpu.models import MinkUNet, SPVCNN
from lidal_tpu.runtime import checkpoint as ckpt
from lidal_tpu.runtime.paths import Paths, ensure_dir
from lidal_tpu.runtime.train import init_state, make_optimizer, make_train_step


def build_model(cfg: RunConfig, bn_axis: Optional[str] = None):
    return (SPVCNN if cfg.is_spvcnn else MinkUNet)(
        num_classes=cfg.data.num_classes, bn_axis=bn_axis
    )


def make_sk_read_fn(cfg: RunConfig, sv_flag_by_frame=None, sv_info_by_frame=None, pseudo_by_frame=None):
    """Reader closure implementing the reference's per-mode label handling."""

    def read(path):
        xyz, sig, labels = sk.read_frame(path, with_labels=True)
        if sv_flag_by_frame is not None:
            flags = np.load(sv_flag_by_frame[path])
            point2sv, _ = load_sv_info(sv_info_by_frame[path])
            pseudo = None
            if pseudo_by_frame is not None:
                pseudo = np.load(pseudo_by_frame[path])
            labels = apply_sv_label_mask(labels, point2sv, flags, pseudo)
        return xyz, sig, labels

    return read


def nu_seq_frames(cfg: RunConfig):
    """scene -> frame entries + reader for nuScenes (manifest-based; see
    data/nuscenes.py).  Frame 'paths' are manifest entries keyed by token."""
    from lidal_tpu.data import nuscenes as nu

    manifest = nu.build_manifest(
        cfg.nu_root,
        cache_path=f"{cfg.processing_root}/NU/manifest.pkl",
    )
    train, _ = nu.load_splits(list(manifest), f"{cfg.nu_root}/splits.json")
    return {s: manifest[s] for s in train}


def _build_nu_train_loader(
    cfg: RunConfig, shuffle: bool = True, batch_multiplier: int = 1
) -> FrameBatchLoader:
    """nuScenes loaders: same flag trees keyed by scene name; frame 'files' are
    manifest entries (dicts), named by in-scene index like the reference's
    seq_frame ids (nu_dataloader.py:294-319)."""
    from lidal_tpu.data import nuscenes as nu

    data = cfg.data
    seq_frames = nu_seq_frames(cfg)
    split = sorted(seq_frames)
    all_entries = [e for s in split for e in seq_frames[s]]

    read_fn = lambda e: nu.read_frame(e, with_labels=True)  # noqa: E731
    if cfg.r_id == 0:
        bootstrap_round0(cfg, seq_frames)
        flags = frame_flags_for_round_generic(cfg, split, seq_frames)
        entries = [e for e, keep in zip(all_entries, flags) if keep]
    elif cfg.metric_name == "full":
        entries = all_entries
    elif cfg.label_unit == "fr":
        flags = frame_flags_for_round_generic(cfg, split, seq_frames)
        entries = [e for e, keep in zip(all_entries, flags) if keep]
    else:  # sv: frames with labeled supervoxels, labels masked per point
        from lidal_tpu.data.selection import frame_name

        entries, svf, svi, pse = sv_training_set(cfg, seq_frames)
        svf_by = dict(zip(map(frame_name, entries), svf))
        svi_by = dict(zip(map(frame_name, entries), svi))
        pse_by = dict(zip(map(frame_name, entries), pse)) if pse else None

        def read_fn(e):  # noqa: F811
            xyz, sig, labels = nu.read_frame(e, with_labels=True)
            name = frame_name(e)
            flags = np.load(svf_by[name])
            point2sv, _ = load_sv_info(svi_by[name])
            pseudo = np.load(pse_by[name]) if pse_by is not None else None
            labels = apply_sv_label_mask(labels, point2sv, flags, pseudo)
            return xyz, sig, labels

    print(f"Train_{cfg.r_id}r samples:", len(entries))
    return FrameBatchLoader(
        entries,
        read_fn,
        point_cap=data.point_cap,
        batch_size=data.batch_size * batch_multiplier,
        shuffle=shuffle,
        seed=cfg.seed,
    )


def frame_flags_for_round_generic(cfg: RunConfig, split, seq_frames):
    """Frame flags concatenated over a split, creating missing round-0 flags."""
    import numpy as np

    from lidal_tpu.data.selection import frame_flags_for_round

    try:
        return frame_flags_for_round(cfg, split)
    except FileNotFoundError:
        return np.zeros(sum(len(seq_frames[s]) for s in split), bool)


def build_train_loader(
    cfg: RunConfig, shuffle: bool = True, batch_multiplier: int = 1
) -> FrameBatchLoader:
    data = cfg.data
    if cfg.dataset_name == "NU":
        return _build_nu_train_loader(cfg, shuffle, batch_multiplier)
    seq_frames = {s: sk.list_frames(cfg.data_root, [s]) for s in data.train_split}
    all_files = [f for s in data.train_split for f in seq_frames[s]]

    read_fn = make_sk_read_fn(cfg)
    if cfg.r_id == 0:
        bootstrap_round0(cfg, seq_frames)
        files = train_files_frame_level(cfg, all_files, data.train_split)
    elif cfg.metric_name == "full":
        files = all_files
    elif cfg.label_unit == "fr":
        files = train_files_frame_level(cfg, all_files, data.train_split)
    else:  # sv
        files, svf, svi, pse = sv_training_set(cfg, seq_frames)
        read_fn = make_sk_read_fn(
            cfg,
            sv_flag_by_frame=dict(zip(files, svf)),
            sv_info_by_frame=dict(zip(files, svi)),
            pseudo_by_frame=dict(zip(files, pse)) if pse else None,
        )
    print(f"Train_{cfg.r_id}r samples:", len(files))
    return FrameBatchLoader(
        files,
        read_fn,
        point_cap=data.point_cap,
        batch_size=data.batch_size * batch_multiplier,
        shuffle=shuffle,
        seed=cfg.seed,
    )


def make_train_fn(
    cfg: RunConfig, n_devices: Optional[int] = None, steps_per_call: int = 1
):
    """Build (model, tx, prep, train_fn) where train_fn(state, keys, xyz, sig,
    valid, labels, rng) -> (state, loss, overflow) runs batch prep + optimizer
    step(s).

    With more than one device the whole step runs under a data-parallel
    ``shard_map``: the batch (frame axis) shards over the mesh, parameters stay
    replicated, and gradient/loss/BN reductions psum over ICI — the TPU-native
    DDP of reference ``train.py:26-53``.  Identical math to single-device.

    With ``steps_per_call`` > 1, the arrays carry a leading step axis and the
    optimizer loop runs ON DEVICE (``lax.scan``): one host dispatch per K
    iterations instead of per iteration (through the tunneled backend a single
    dispatch costs up to ~1 s — pure orchestration).  loss/overflow come back
    as [K] vectors.
    """
    data = cfg.data
    n_dev = n_devices if n_devices is not None else jax.device_count()
    dp = n_dev > 1
    axis = "data" if dp else None
    model = build_model(cfg, bn_axis=axis)
    tx = make_optimizer()
    prep = functools.partial(
        prepare_train_batch,
        level_caps=data.level_caps,
        scale=data.scale,
        full_scale=data.full_scale,
        with_points=cfg.is_spvcnn,
    )
    inner = make_train_step(model, tx, with_points=cfg.is_spvcnn, axis_name=axis)

    def one_step(state, keys, xyz, sig, valid, labels, rng):
        tb = prep(keys, xyz, sig, valid, labels)
        ovf = tb.overflow.sum()
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            ovf = jax.lax.psum(ovf, axis)
        # SPVCNN dropout masks derive from the per-frame augment keys (which
        # shard WITH the frames), so the sharded step equals the single-device
        # step exactly; a single rng would draw shard-shape-dependent masks.
        dkeys = None
        if cfg.is_spvcnn:
            dkeys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED))(keys)
        new_state, loss = inner(state, tb, rng, dkeys)
        return new_state, loss, ovf

    if steps_per_call == 1:
        step_all = one_step
    else:

        def step_all(state, keys, xyz, sig, valid, labels, rng):
            # leading axis = step; the whole K-iteration loop lives on device
            def body(st, args):
                st, loss, ovf = one_step(st, *args)
                return st, (loss, ovf)

            state, (losses, ovfs) = jax.lax.scan(
                body, state, (keys, xyz, sig, valid, labels, rng)
            )
            return state, losses, ovfs

    if dp:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from lidal_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:n_dev])
        # data arrays shard on their frame axis (axis 1 when a step axis leads)
        dspec = P("data") if steps_per_call == 1 else P(None, "data")
        train_fn = jax.jit(
            shard_map(
                step_all,
                mesh=mesh,
                in_specs=(P(), dspec, dspec, dspec, dspec, dspec, P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )
    else:
        train_fn = jax.jit(step_all)
    return model, tx, prep, train_fn


def run_train(
    cfg: RunConfig,
    loader: Optional[FrameBatchLoader] = None,
    max_iter: Optional[int] = None,
    log_every: int = 50,
    on_step: Optional[Callable] = None,
    n_devices: Optional[int] = None,
    steps_per_call: int = 1,
):
    """Train one round; returns the final TrainState.

    The global batch is ``cfg.data.batch_size`` frames PER DEVICE (matching the
    reference's per-GPU batch under DDP, ``sk_dataloader.py:21,39-42``).  With a
    caller-provided loader, the mesh shrinks to the largest device count that
    divides its batch size.  ``steps_per_call`` > 1 stacks that many prefetched
    batches per dispatch and runs the optimizer loop on device (``lax.scan``) —
    set it to a divisor of ``ckpt_every`` (e.g. 10) where host dispatch is the
    bottleneck."""
    import math

    n_dev = n_devices if n_devices is not None else jax.device_count()
    if loader is not None:
        n_dev = math.gcd(loader.batch_size, n_dev)
    model, tx, prep, train_fn = make_train_fn(cfg, n_dev, steps_per_call)
    paths = Paths(cfg)
    ensure_dir(paths.ckpt_dir())
    loader = loader or build_train_loader(cfg, batch_multiplier=n_dev)
    max_iter = max_iter if max_iter is not None else cfg.max_iter
    k_steps = steps_per_call

    rng = jax.random.PRNGKey(cfg.seed)
    assert len(loader.files) > 0, "empty training set"
    # Shape-init from an all-invalid zero batch built from loader metadata —
    # flax init only consumes shapes/dtypes, so no real batch is consumed and
    # the first epoch starts from its first frame (round-2 leftover: the old
    # path burned batch 0 for init and then restarted the epoch).
    bsz, cap = loader.batch_size, loader.point_cap
    init_keys = jax.random.split(jax.random.PRNGKey(cfg.seed), bsz)
    tb = prep(
        init_keys,
        jnp.zeros((bsz, cap, 3), jnp.float32),
        jnp.zeros((bsz, cap), jnp.float32),
        jnp.zeros((bsz, cap), bool),
        jnp.full((bsz, cap), 255, jnp.int32),
    )
    state = init_state(model, jax.random.PRNGKey(cfg.seed), tb, tx)
    state, ep_id = ckpt.resume_or_warm_start(paths, state)

    def batches():
        nonlocal ep_id
        while True:
            loader.set_epoch(ep_id)
            yielded = False
            for b in loader:
                yielded = True
                yield b
            ep_id += 1
            if not yielded:
                return

    step = int(state.step)
    stream = batches()
    tail_fn = None  # separate jit for a ragged final chunk (compiled at most once)
    while step < max_iter:
        k_eff = min(k_steps, max_iter - step)
        chunk = []
        for b in stream:
            chunk.append(b)
            if len(chunk) == k_eff:
                break
        if not chunk:
            break
        k_eff = len(chunk)
        b0 = chunk[0]
        # per-step key derivation matches the per-step path exactly, so
        # steps_per_call does not change the training trajectory
        keys_l, rngs_l = [], []
        for _ in range(k_eff):
            rng, k1, k2 = jax.random.split(rng, 3)
            keys_l.append(jax.random.split(k1, b0["xyz"].shape[0]))
            rngs_l.append(k2)
        keys = jnp.stack(keys_l)
        rngs = jnp.stack(rngs_l)
        args = [
            jnp.asarray(np.stack([c[f] for c in chunk]))
            for f in ("xyz", "sig", "valid", "labels")
        ]
        if k_eff == k_steps:
            fn = train_fn
        else:  # ragged final chunk: one extra compile per distinct size
            if tail_fn is None or tail_fn[0] != k_eff:
                tail_fn = (k_eff, make_train_fn(cfg, n_dev, k_eff)[3])
            fn = tail_fn[1]
        if k_eff == 1:
            state, loss_v, ovf_v = fn(state, keys[0], *[a[0] for a in args], rngs[0])
            loss_v = jnp.reshape(loss_v, (1,))
            ovf_v = jnp.reshape(ovf_v, (1,))
        else:
            state, loss_v, ovf_v = fn(state, keys, *args, rngs)
        trunc = sum(c.get("trunc_points", 0) for c in chunk)
        if trunc:
            print(f"WARNING: point_cap truncated {trunc} points this chunk")
        for i in range(k_eff):
            step += 1
            if on_step is not None:
                on_step(step, loss_v[i])
            if step % log_every == 0:
                ovf_i = int(ovf_v[i])
                extra = f" voxel_overflow: {ovf_i}" if ovf_i else ""
                print(f"Iteration: {step} loss: {float(loss_v[i]):.4f}{extra}")
            if step % cfg.ckpt_every == 0:
                ckpt.save_checkpoint(paths.ckpt_dir(), ckpt.device_get_state(state), ep_id)
    ckpt.save_checkpoint(paths.ckpt_dir(), ckpt.device_get_state(state), ep_id)
    return state
