"""Round orchestrators (frame-level metrics, ReDAL, sv-RAND) over synthetic
Processing_files trees — the filesystem contract of the reference."""

import dataclasses
import os

import numpy as np
import pytest

from tests.synth import mini_cfg

N_FRAMES = 8
N_POINTS = 120
N_CLASSES = 19
N_SV = 4


@pytest.fixture()
def artifact_tree(tmp_path):
    """Round-0 artifacts for 2 sequences x 8 frames: prob/pred/outfeat dumps,
    frame flags, KMeans+VCCS sv infos/flags, boundary npys."""
    rng = np.random.default_rng(0)
    cfg = mini_cfg(str(tmp_path), seqs=("00", "01"), r_id=1, metric_name="ENT", label_unit="fr")
    from lidal_tpu.data.selection import save_sv_info
    from lidal_tpu.runtime.paths import Paths, ensure_dir

    p0 = Paths(dataclasses.replace(cfg, r_id=0, label_unit="fr"))
    gid = {"KMeans": 0, "VCCS": 0}
    for seq in ("00", "01"):
        ensure_dir(p0.prob_dir(seq))
        ensure_dir(p0.pred_dir(seq))
        ensure_dir(p0.outfeat_dir(seq))
        ff_dir = ensure_dir(p0.frame_flag_dir(r_id=0))
        flag = np.zeros(N_FRAMES, bool)
        flag[0] = True
        np.save(os.path.join(ff_dir, f"{seq}.npy"), flag)
        for part in ("KMeans", "VCCS"):
            svi_dir = ensure_dir(p0.supervoxel_dir(seq, part))
            svf_dir = ensure_dir(
                os.path.join(cfg.processing_root, "SK", "sv_flag", part, "0r", seq)
            )
            for fi in range(N_FRAMES):
                name = f"{fi:06d}"
                prob = rng.dirichlet(np.ones(N_CLASSES), N_POINTS).astype(np.float32)
                np.save(os.path.join(p0.prob_dir(seq), f"{name}.npy"), prob)
                np.save(os.path.join(p0.pred_dir(seq), f"{name}.npy"), prob.argmax(1).astype(np.int32))
                np.save(
                    os.path.join(p0.outfeat_dir(seq), f"{name}.npy"),
                    rng.normal(size=(N_POINTS, 96)).astype(np.float32),
                )
                point2sv = rng.integers(0, N_SV, N_POINTS).astype(np.int32)
                sv_gid = np.arange(gid[part], gid[part] + N_SV, dtype=np.int64)
                gid[part] += N_SV
                save_sv_info(os.path.join(svi_dir, f"{name}.npz"), point2sv, sv_gid)
                sv_flag = np.full(N_SV, 1 if fi == 0 else 0, np.int32)
                np.save(os.path.join(svf_dir, f"{name}.npy"), sv_flag)
            bdir = ensure_dir(p0.boundary_dir(seq))
            for fi in range(N_FRAMES):
                np.save(
                    os.path.join(bdir, f"{fi:06d}.npy"),
                    rng.random(N_POINTS).astype(np.float32) * 0.1,
                )
    return cfg


@pytest.mark.parametrize("metric", ["ENT", "MAR", "CONF", "SEGENT", "CSET", "RAND"])
def test_frame_metric_rounds(artifact_tree, metric):
    from lidal_tpu.active.frame_runner import run_frame_metric_round
    from lidal_tpu.runtime.paths import Paths

    cfg = dataclasses.replace(artifact_tree, metric_name=metric, label_unit="fr")
    flags = run_frame_metric_round(cfg, metric, rng=np.random.default_rng(1))
    total = 2 * N_FRAMES
    # 2 frames were labeled at round 0; round adds round(0.01 * 16) = 0 -> at
    # least preserves; with our tiny set num_add == 0, so patch: use frac via
    # flags' invariants instead
    assert flags.shape == (total,)
    assert flags[0] and flags[N_FRAMES]  # round-0 labels preserved
    out_dir = Paths(cfg).frame_flag_dir(metric=metric)
    assert os.path.exists(os.path.join(out_dir, "00.npy"))
    assert os.path.exists(os.path.join(out_dir, "01.npy"))


@pytest.mark.parametrize("metric", ["ENT", "MAR", "CONF", "SEGENT"])
def test_reference_parity_mode_matches_reference_selection(tmp_path, metric):
    """``RunConfig.reference_parity`` golden test: on a synthetic round the
    parity-mode flags equal, index for index, a literal re-implementation of
    the reference scorer's selection flow (softmax_entropy.py:60-111 and
    siblings) — zero-prefix score array, unlabeled indexing into the zero
    prefix, argpartition direction per metric (CONF: kth=num_add,
    least_confidence_sampling.py:110)."""
    import dataclasses as dc

    from lidal_tpu.active.frame_runner import run_frame_metric_round
    from lidal_tpu.runtime.paths import Paths, ensure_dir

    rng = np.random.default_rng(3)
    n_frames = 300
    cfg = mini_cfg(str(tmp_path), seqs=("00", "01"), r_id=1, metric_name=metric,
                   label_unit="fr")
    cfg = dc.replace(cfg, reference_parity=True)
    p0 = Paths(dc.replace(cfg, r_id=0, label_unit="fr"))
    ff_dir = ensure_dir(p0.frame_flag_dir(r_id=0))
    seq_flags = {}
    for seq in ("00", "01"):
        flag = rng.random(n_frames) < 0.05
        seq_flags[seq] = flag
        np.save(os.path.join(ff_dir, f"{seq}.npy"), flag)

    got = run_frame_metric_round(cfg, metric)

    # ---- oracle: the reference's own flow, transcribed --------------------
    all_frame_flag = np.array([], dtype=bool)
    for seq in ("00", "01"):
        all_frame_flag = np.append(all_frame_flag, seq_flags[seq])
    all_scores = np.zeros_like(all_frame_flag, dtype=np.float32)  # quirk 1
    for seq in ("00", "01"):  # real scores are APPENDED past index N
        all_scores = np.append(all_scores, rng.random(n_frames).astype(np.float32))
    unlabeled_ids = np.where(all_frame_flag == False)[0]  # noqa: E712 (reference idiom)
    unlabeled_scores = all_scores[unlabeled_ids]
    num_add = round(0.01 * all_frame_flag.shape[0])
    if metric == "CONF":
        selected = np.argpartition(unlabeled_scores, num_add)[:num_add]
    else:
        selected = np.argpartition(unlabeled_scores, -num_add)[-num_add:]
    all_frame_flag[unlabeled_ids[selected]] = True

    np.testing.assert_array_equal(got, all_frame_flag)
    assert num_add == 6 and got.sum() == all_frame_flag.sum()


def test_cset_adds_most_distant(artifact_tree):
    # CSET with a controlled feature layout: frame 0 labeled; ensure selection
    # machinery returns the k-center greedy result through the runner
    from lidal_tpu.active import frame_level as fl

    rng = np.random.default_rng(2)
    feats = rng.normal(size=(10, 4))
    feats[7] += 100.0  # far outlier
    flag = np.zeros(10, bool)
    flag[0] = True
    out = fl.core_set_select(feats, flag, frac=0.1)
    assert out[7]


def test_redal_round(artifact_tree):
    from lidal_tpu.active.redal_runner import run_redal_round
    from lidal_tpu.runtime.paths import Paths

    cfg = dataclasses.replace(artifact_tree, metric_name="ReDAL", label_unit="sv")
    # 1% budget must cover at least a few ~30-point supervoxels
    res = run_redal_round(cfg, train_point_num=20_000)
    assert len(res.added) >= 1
    out_dir = Paths(cfg).sv_flag_dir("00")
    assert len(os.listdir(out_dir)) == N_FRAMES
    # stats cached for the next round
    assert os.path.exists(
        os.path.join(cfg.processing_root, "SK", "super_voxel", "VCCS", "sv_pnums.npy")
    )


def test_sv_rand_round(artifact_tree):
    from lidal_tpu.active.redal_runner import run_sv_rand_round

    cfg = dataclasses.replace(artifact_tree, metric_name="RAND", label_unit="sv")
    flags = run_sv_rand_round(cfg, train_point_num=20_000, rng=np.random.default_rng(3))
    before = 2 * N_SV  # frames 0 of both seqs
    added = (flags == 1).sum() - before
    assert added >= 1


def test_lidal_round_device_count_invariant(tmp_path):
    """run_lidal_round shards frames contiguously over local devices (the
    reference's Pool(24) / per-GPU loader split); the selection output must be
    BIT-IDENTICAL for any device count (per-frame scores are independent and
    supervoxel writes disjoint)."""
    import jax

    from lidal_tpu.active.lidal_runner import run_lidal_round
    from lidal_tpu.data.selection import save_sv_info
    from lidal_tpu.runtime.paths import Paths, ensure_dir

    rng = np.random.default_rng(7)
    n_frames, n_pts, n_cls, n_sv = 10, 150, 5, 3

    def build_tree(root):
        cfg = mini_cfg(
            str(root), seqs=("00",), r_id=1, metric_name="LiDAL", label_unit="sv"
        )
        p0 = Paths(dataclasses.replace(cfg, r_id=0, label_unit="fr"))
        paths = Paths(cfg)
        r = np.random.default_rng(7)  # same artifacts for both runs
        gid = 0
        seq = "00"
        ensure_dir(p0.prob_dir(seq))
        grid_dir = ensure_dir(paths.grid_dir(seq))
        svi_dir = ensure_dir(paths.supervoxel_dir(seq, "KMeans"))
        svf_dir = ensure_dir(paths.sv_flag_dir(seq, r_id=0))
        base = (r.random((n_pts, 3)) * 6.0).astype(np.float32)
        for fi in range(n_frames):
            name = f"{fi:06d}"
            xyz = base + np.array([0.4 * fi, 0, 0], np.float32)
            xyz += r.normal(scale=0.04, size=xyz.shape).astype(np.float32)
            np.savez_compressed(os.path.join(grid_dir, f"{name}.npz"), xyz=xyz)
            prob = r.dirichlet(np.ones(n_cls), n_pts).astype(np.float32)
            np.save(os.path.join(p0.prob_dir(seq), f"{name}.npy"), prob)
            point2sv = r.integers(0, n_sv, n_pts).astype(np.int32)
            sv_gid = np.arange(gid, gid + n_sv, dtype=np.int64)
            gid += n_sv
            save_sv_info(os.path.join(svi_dir, f"{name}.npz"), point2sv, sv_gid)
            np.save(
                os.path.join(svf_dir, f"{name}.npy"),
                np.full(n_sv, 1 if fi == 0 else 0, np.int32),
            )
        return cfg

    budget_pts = n_frames * n_pts * 40  # 1% budget covers several supervoxels
    cfg1 = build_tree(tmp_path / "a")
    res1 = run_lidal_round(cfg1, train_point_num=budget_pts,
                           devices=jax.devices()[:1])
    cfg4 = build_tree(tmp_path / "b")
    res4 = run_lidal_round(cfg4, train_point_num=budget_pts,
                           devices=jax.devices()[:4])
    np.testing.assert_array_equal(res1.sv_flags, res4.sv_flags)
    np.testing.assert_array_equal(res1.al_added, res4.al_added)
    np.testing.assert_array_equal(res1.sl_added, res4.sl_added)
    assert len(res1.al_added) > 0  # something was actually selected


def test_lidal_round_worker_failure_propagates(tmp_path):
    """A failure on any device's worker thread must fail the ROUND — a died
    thread would otherwise leave its frames silently scored zero and corrupt
    the selection (regression: thread exceptions were only printed)."""
    import jax

    from lidal_tpu.active.lidal_runner import run_lidal_round
    from lidal_tpu.data.selection import save_sv_info
    from lidal_tpu.runtime.paths import Paths, ensure_dir

    rng = np.random.default_rng(9)
    n_frames, n_pts, n_cls, n_sv = 8, 120, 5, 3
    cfg = mini_cfg(str(tmp_path), seqs=("00",), r_id=1, metric_name="LiDAL",
                   label_unit="sv")
    p0 = Paths(dataclasses.replace(cfg, r_id=0, label_unit="fr"))
    paths = Paths(cfg)
    seq = "00"
    ensure_dir(p0.prob_dir(seq))
    grid_dir = ensure_dir(paths.grid_dir(seq))
    svi_dir = ensure_dir(paths.supervoxel_dir(seq, "KMeans"))
    svf_dir = ensure_dir(paths.sv_flag_dir(seq, r_id=0))
    gid = 0
    for fi in range(n_frames):
        name = f"{fi:06d}"
        xyz = (rng.random((n_pts, 3)) * 6.0 + np.array([0.4 * fi, 0, 0])).astype(np.float32)
        np.savez_compressed(os.path.join(grid_dir, f"{name}.npz"), xyz=xyz)
        if fi != n_frames - 1:  # last frame's prob map is MISSING
            prob = rng.dirichlet(np.ones(n_cls), n_pts).astype(np.float32)
            np.save(os.path.join(p0.prob_dir(seq), f"{name}.npy"), prob)
        point2sv = rng.integers(0, n_sv, n_pts).astype(np.int32)
        save_sv_info(os.path.join(svi_dir, f"{name}.npz"), point2sv,
                     np.arange(gid, gid + n_sv, dtype=np.int64))
        gid += n_sv
        np.save(os.path.join(svf_dir, f"{name}.npy"),
                np.full(n_sv, 1 if fi == 0 else 0, np.int32))
    with pytest.raises(FileNotFoundError):
        run_lidal_round(cfg, train_point_num=n_frames * n_pts * 40,
                        devices=jax.devices()[:4])
