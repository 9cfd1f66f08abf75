"""CLI command implementations wiring drivers + data + checkpoints."""

from __future__ import annotations

import jax

from lidal_tpu.config import RunConfig
from lidal_tpu.runtime.paths import Paths


def _load_eval_variables(cfg: RunConfig):
    """Build the model and restore the round checkpoint for inference
    (reference evaluate.py:56-71, prob_inference.py:60-75)."""
    import jax.numpy as jnp
    import numpy as np

    from lidal_tpu.data.pipeline import prepare_train_batch
    from lidal_tpu.runtime import checkpoint as ckpt
    from lidal_tpu.runtime.train import init_state, make_optimizer, make_eval_step
    from lidal_tpu.runtime.train_loop import build_model

    data = cfg.data
    model = build_model(cfg)
    # init with a tiny synthetic batch (shapes don't matter for param shapes)
    rng = np.random.default_rng(0)
    b = 1
    xyz = jnp.asarray(rng.random((b, 1024, 3)).astype(np.float32) * 5)
    sig = jnp.zeros((b, 1024))
    valid = jnp.ones((b, 1024), bool)
    labels = jnp.zeros((b, 1024), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    small_caps = tuple(max(64, c // 128) for c in data.level_caps)
    tb = prepare_train_batch(keys, xyz, sig, valid, labels, level_caps=small_caps,
                             with_points=cfg.is_spvcnn)
    tx = make_optimizer()
    state = init_state(build_model(cfg), jax.random.PRNGKey(cfg.seed), tb, tx)
    paths = Paths(cfg)
    restored = ckpt.restore_checkpoint(paths.ckpt_dir(), state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {paths.ckpt_dir()}")
    state, _ = restored
    print(f"Restored from: {paths.ckpt_dir()}/current")
    return model, ckpt.variables_of(state), make_eval_step(model, cfg.is_spvcnn)


def _dataset_frames(cfg: RunConfig, split: str):
    """(files, read_fn, frame_id_fn) for the requested split ('train'|'val')."""
    if cfg.dataset_name == "SK":
        from lidal_tpu.data import semantic_kitti as sk

        data = cfg.data
        seqs = data.train_split if split == "train" else data.val_split
        files = sk.list_frames(cfg.data_root, seqs)
        return files, sk.read_frame, sk.frame_id

    from lidal_tpu.data import nuscenes as nu

    manifest = nu.build_manifest(
        cfg.nu_root, cache_path=f"{cfg.processing_root}/NU/manifest.pkl"
    )
    train, val = nu.load_splits(list(manifest), f"{cfg.nu_root}/splits.json")
    scenes = train if split == "train" else val
    files = [e | {"scene": s} for s in scenes for e in manifest[s]]

    def read(e, with_labels=True):
        return nu.read_frame(e, with_labels=with_labels)

    def fid(e):
        return e["scene"], e["token"]

    return files, read, fid


def evaluate_command(cfg: RunConfig) -> float:
    from lidal_tpu.data.loader import FrameBatchLoader
    from lidal_tpu.runtime.evaluate import run_eval

    model, variables, eval_step = _load_eval_variables(cfg)
    data = cfg.data
    files, read_fn, _ = _dataset_frames(cfg, "val")
    print("Validation samples:", len(files))
    loader = FrameBatchLoader(
        files,
        lambda p: read_fn(p, with_labels=True),
        point_cap=data.point_cap,
        # reference sk_dataloader.py:44-46 (2x train batch), per device
        batch_size=2 * data.batch_size * jax.device_count(),
    )
    return run_eval(cfg, eval_step, variables, loader)


def prob_inference_command(cfg: RunConfig) -> None:
    from lidal_tpu.parallel.mesh import process_shard
    from lidal_tpu.runtime.prob_inference import run_prob_inference

    model, variables, eval_step = _load_eval_variables(cfg)
    files, read_fn, frame_id_fn = _dataset_frames(cfg, "train")
    # contiguous per-host shard of the frame list (reference
    # sk_dataloader.py:196-198 sharded the score loader across ranks)
    lo, hi, step = process_shard(len(files))
    files = files[lo:hi:step]
    print("Score samples:", len(files))
    run_prob_inference(
        cfg,
        jax.jit(eval_step),
        variables,
        files,
        read_fn=lambda p: read_fn(p, with_labels=False),
        frame_id_fn=frame_id_fn,
        verbose=True,
    )


def fused_score_command(cfg: RunConfig) -> None:
    """Fused inference + LiDAL scoring round (``cfg.r_id`` >= 1): one streaming
    pass computes the previous round's multi-view prob maps on device and
    scores them without the npy round trip (same artifacts, bitwise-same
    selections as ``prob_inference_command`` + ``score_command``)."""
    from lidal_tpu.active.lidal_runner import _prev_cfg, run_fused_lidal_round

    inf_cfg = _prev_cfg(cfg)
    model, variables, eval_step = _load_eval_variables(inf_cfg)
    # enumeration order == run_prob_inference's files order (augmentation keys
    # derive from the global index)
    files, read_fn, frame_id_fn = _dataset_frames(cfg, "train")
    frame_index = {frame_id_fn(p): i for i, p in enumerate(files)}
    by_id = {frame_id_fn(p): p for p in files}

    def read_raw(seq: str, name: str):
        xyz, sig, _ = read_fn(by_id[(seq, name)], with_labels=False)
        return xyz, sig

    run_fused_lidal_round(
        cfg, jax.jit(eval_step), variables, read_raw,
        frame_index=frame_index, verbose=True,
    )


def score_command(cfg: RunConfig) -> None:
    m = cfg.metric_name
    if m.startswith("LiDAL"):
        from lidal_tpu.active.lidal_runner import run_lidal_round

        run_lidal_round(cfg, verbose=True)
    elif m == "ReDAL":
        from lidal_tpu.active.redal_runner import run_redal_round

        run_redal_round(cfg, verbose=True)
    elif cfg.label_unit == "sv" and m == "RAND":
        from lidal_tpu.active.redal_runner import run_sv_rand_round

        run_sv_rand_round(cfg)
    else:
        from lidal_tpu.active.frame_runner import run_frame_metric_round

        run_frame_metric_round(cfg, m, verbose=True)


def prep_command(cfg: RunConfig, stage: str) -> None:
    data = cfg.data
    if cfg.dataset_name == "NU":
        from lidal_tpu.data import nuscenes as nu
        from lidal_tpu.runtime.train_loop import nu_seq_frames

        seq_frames = nu_seq_frames(cfg)
        read_xyz = lambda e: nu.read_frame(e, with_labels=False)[0]  # noqa: E731
    else:
        from lidal_tpu.data import semantic_kitti as sk

        seq_frames = {s: sk.list_frames(cfg.data_root, [s]) for s in data.train_split}
        read_xyz = lambda p: sk.read_frame(p, with_labels=False)[0]  # noqa: E731

    if stage == "grids":
        if cfg.dataset_name == "NU":
            from lidal_tpu.prep.grid import prepare_nu_grids

            prepare_nu_grids(cfg, verbose=True)
        else:
            from lidal_tpu.prep.grid import prepare_sk_grids

            prepare_sk_grids(cfg, verbose=True)
    elif stage == "supervoxels":
        from lidal_tpu.prep.supervoxel_kmeans import prepare_supervoxels_kmeans

        prepare_supervoxels_kmeans(cfg, seq_frames, read_xyz, verbose=True)
    elif stage == "vccs":
        from lidal_tpu.prep.supervoxel_vccs import prepare_supervoxels_vccs

        prepare_supervoxels_vccs(cfg, seq_frames, read_xyz, verbose=True)
    elif stage == "boundary":
        from lidal_tpu.prep.surface_variation import prepare_surface_variation

        prepare_surface_variation(cfg, seq_frames, read_xyz, verbose=True)
    elif stage == "bootstrap":
        from lidal_tpu.data.selection import bootstrap_round0

        bootstrap_round0(cfg, seq_frames)
    else:
        raise ValueError(f"unknown prep stage: {stage}")


def import_torch_command(cfg: RunConfig, pt_path: str) -> None:
    """Convert a reference ``current.pt`` (released round-0 anchors,
    reference README.md:88-92) into this framework's checkpoint tree."""
    import jax.numpy as jnp

    from lidal_tpu.runtime import checkpoint as ckpt
    from lidal_tpu.runtime.import_torch import load_torch_checkpoint
    from lidal_tpu.runtime.paths import ensure_dir
    from lidal_tpu.runtime.train import TrainState, make_optimizer

    variables, iteration, ep_id = load_torch_checkpoint(pt_path, spvcnn=cfg.is_spvcnn)
    tx = make_optimizer()
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    state = TrainState(
        step=jnp.asarray(iteration, jnp.int32),
        params=params,
        batch_stats=jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
        opt_state=tx.init(params),
    )
    paths = Paths(cfg)
    ckpt.save_checkpoint(ensure_dir(paths.ckpt_dir()), ckpt.device_get_state(state), ep_id)
    print(f"Imported {pt_path} (iteration {iteration}) -> {paths.ckpt_dir()}/current")
