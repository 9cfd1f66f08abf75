"""Full active-learning round smoke test on a synthetic mini-SemanticKITTI:

prep (supervoxels, grids) -> round-0 bootstrap + train -> evaluate ->
prob-inference -> LiDAL scoring/selection -> round-1 sv training with masked
labels (incl. pseudo).  Everything on the CPU backend with tiny capacities —
the multi-stage filesystem contract of the reference, end to end.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

from tests.synth import make_mini_sk, mini_cfg

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_sk"))
    make_mini_sk(d, seqs=("00", "01"), frames_per_seq=6, points=700)
    return d


def test_full_round(workdir):
    import jax

    from lidal_tpu.active.lidal_runner import run_lidal_round
    from lidal_tpu.cli.commands import evaluate_command, prob_inference_command
    from lidal_tpu.data import semantic_kitti as sk
    from lidal_tpu.prep.grid import prepare_sk_grids
    from lidal_tpu.prep.supervoxel_kmeans import prepare_supervoxels_kmeans
    from lidal_tpu.runtime.train_loop import run_train, build_train_loader

    cfg = mini_cfg(workdir, r_id=0, metric_name="LiDAL", label_unit="sv", max_iter=2)
    data = cfg.data
    seq_frames = {s: sk.list_frames(cfg.data_root, [s]) for s in data.train_split}
    n_frames = sum(len(v) for v in seq_frames.values())
    assert n_frames == 12

    # ---- prep --------------------------------------------------------------------
    read_xyz = lambda p: sk.read_frame(p, with_labels=False)[0]  # noqa: E731
    prepare_supervoxels_kmeans(cfg, seq_frames, read_xyz, n_clusters=5)
    prepare_sk_grids(cfg)
    for s in data.train_split:
        assert len(glob.glob(os.path.join(cfg.processing_root, "SK", "super_voxel", "KMeans", s, "*.npz"))) == 6
        assert len(glob.glob(os.path.join(cfg.processing_root, "SK", "grid", s, "*.npz"))) == 6

    # ---- round 0: bootstrap + train ---------------------------------------------
    # The 1% bootstrap selects 0 of 6 frames on the mini dataset; patch the flags
    # to label the first 2 frames of each sequence before training.
    from lidal_tpu.data.selection import bootstrap_round0

    bootstrap_round0(cfg, seq_frames)
    ff_dir = os.path.join(cfg.processing_root, "SK", "frame_flag", "0r")
    for s in data.train_split:
        flag = np.load(os.path.join(ff_dir, f"{s}.npy"))
        flag[:] = False
        flag[:2] = True
        np.save(os.path.join(ff_dir, f"{s}.npy"), flag)
        svdir = os.path.join(cfg.processing_root, "SK", "sv_flag", "KMeans", "0r", s)
        names = sorted(os.listdir(svdir))
        assert len(names) == 6
        for i, name in enumerate(names):
            sv = np.load(os.path.join(svdir, name))
            sv[:] = 1 if i < 2 else 0
            np.save(os.path.join(svdir, name), sv)

    state0 = run_train(cfg, max_iter=2)
    assert int(state0.step) == 2
    ckpt_dir = os.path.join(cfg.checkpoint_root, "SK", "Mink", "0r", "current")
    assert os.path.exists(ckpt_dir)

    # ---- evaluate round 0 --------------------------------------------------------
    cfg_eval = dataclasses.replace(cfg, metric_name="LiDAL")
    miou = evaluate_command(cfg_eval)
    assert 0.0 <= miou <= 1.0

    # ---- prob inference (fr/0r tree) --------------------------------------------
    cfg_inf = dataclasses.replace(cfg, label_unit="fr", r_id=0)
    prob_inference_command(cfg_inf)
    for s in data.train_split:
        probs = glob.glob(os.path.join(cfg.processing_root, "SK", "prob_map", "Mink", "fr", "0r", s, "*.npy"))
        assert len(probs) == 6
        p0 = np.load(probs[0])
        assert p0.shape[1] == 19
        np.testing.assert_allclose(p0.sum(1), 1.0, rtol=1e-4)
        feats = glob.glob(os.path.join(cfg.processing_root, "SK", "outfeat", "Mink", "fr", "0r", s, "*.npy"))
        assert len(feats) == 6 and np.load(feats[0]).shape[1] == 96

    # ---- LiDAL scoring + selection round 1 ----------------------------------------
    cfg_score = dataclasses.replace(cfg, r_id=1, label_unit="sv", metric_name="LiDAL")
    total_points = sum(
        len(sk.read_frame(f, with_labels=False)[0]) for s in data.train_split for f in seq_frames[s]
    )
    res = run_lidal_round(cfg_score, train_point_num=total_points)
    assert (res.sv_flags == 1).sum() > 0
    flag_files = glob.glob(
        os.path.join(cfg.processing_root, "SK", "sv_flag", "KMeans", "Mink", "LiDAL", "1r", "*", "*.npy")
    )
    assert len(flag_files) == 12

    # ---- round 1 sv training (human labels only) ----------------------------------
    cfg_r1 = dataclasses.replace(cfg, r_id=1, label_unit="sv", metric_name="LiDAL")
    loader = build_train_loader(cfg_r1)
    assert len(loader.files) > 0
    state1 = run_train(cfg_r1, loader=loader, max_iter=1)
    assert int(state1.step) == 1

    # ---- round 1 sv training with pseudo labels -----------------------------------
    # 'LiDAL_pseudo' shares the 'LiDAL' artifact namespace (Paths.metric fixes
    # the reference's dangling path, SURVEY quirk 5) — no flag copying needed.
    cfg_ps = dataclasses.replace(cfg, r_id=1, label_unit="sv", metric_name="LiDAL_pseudo")
    loader_ps = build_train_loader(cfg_ps)
    state_ps = run_train(cfg_ps, loader=loader_ps, max_iter=1)
    assert int(state_ps.step) == 1


def test_full_round_spvcnn(tmp_path):
    """The same round pipeline with the SPVCNN model (point-branch plans flow
    through train/eval/prob-inference/scoring; two of the reference's four
    released round-0 anchors are SPVCNN — README.md:88-92)."""
    import dataclasses as dc

    from lidal_tpu.active.lidal_runner import run_lidal_round
    from lidal_tpu.cli.commands import evaluate_command, prob_inference_command
    from lidal_tpu.data import semantic_kitti as sk
    from lidal_tpu.data.selection import bootstrap_round0
    from lidal_tpu.prep.grid import prepare_sk_grids
    from lidal_tpu.prep.supervoxel_kmeans import prepare_supervoxels_kmeans
    from lidal_tpu.runtime.train_loop import run_train

    d = str(tmp_path / "mini_sk_spv")
    make_mini_sk(d, seqs=("00",), frames_per_seq=4, points=600)
    cfg = mini_cfg(d, seqs=("00",), model_name="SPVCNN", r_id=0,
                   metric_name="LiDAL", label_unit="sv", max_iter=2)
    seq_frames = {s: sk.list_frames(cfg.data_root, [s]) for s in cfg.data.train_split}

    read_xyz = lambda p: sk.read_frame(p, with_labels=False)[0]  # noqa: E731
    prepare_supervoxels_kmeans(cfg, seq_frames, read_xyz, n_clusters=5)
    prepare_sk_grids(cfg)
    bootstrap_round0(cfg, seq_frames)
    ff = os.path.join(cfg.processing_root, "SK", "frame_flag", "0r", "00.npy")
    flag = np.load(ff)
    flag[:] = False
    flag[:2] = True
    np.save(ff, flag)
    svdir = os.path.join(cfg.processing_root, "SK", "sv_flag", "KMeans", "0r", "00")
    for i, name in enumerate(sorted(os.listdir(svdir))):
        sv = np.load(os.path.join(svdir, name))
        sv[:] = 1 if i < 2 else 0
        np.save(os.path.join(svdir, name), sv)

    state0 = run_train(cfg, max_iter=2)
    assert int(state0.step) == 2
    assert os.path.exists(os.path.join(cfg.checkpoint_root, "SK", "SPVCNN", "0r", "current"))

    miou = evaluate_command(dc.replace(cfg, metric_name="LiDAL"))
    assert 0.0 <= miou <= 1.0

    prob_inference_command(dc.replace(cfg, label_unit="fr", r_id=0))
    probs = glob.glob(
        os.path.join(cfg.processing_root, "SK", "prob_map", "SPVCNN", "fr", "0r", "00", "*.npy")
    )
    assert len(probs) == 4
    np.testing.assert_allclose(np.load(probs[0]).sum(1), 1.0, rtol=1e-4)

    cfg_score = dc.replace(cfg, r_id=1, label_unit="sv", metric_name="LiDAL")
    total_points = sum(len(sk.read_frame(f, with_labels=False)[0]) for f in seq_frames["00"])
    res = run_lidal_round(cfg_score, train_point_num=total_points)
    assert (res.sv_flags == 1).sum() > 0
