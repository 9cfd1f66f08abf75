"""VCCS prep pipeline: pruning semantics + artifact layout."""

import os

import numpy as np
import pytest

from lidal_tpu.prep.native import native_available
from lidal_tpu.prep.supervoxel_vccs import vccs_frame_info


def test_vccs_frame_info_pruning():
    # labels: 0 (unassigned), 1 (big), 2 (small), 3 (big)
    sv = np.concatenate([
        np.zeros(50, np.int64),
        np.full(150, 1, np.int64),
        np.full(80, 2, np.int64),
        np.full(200, 3, np.int64),
    ])
    point2sv, kept = vccs_frame_info(sv)
    assert kept == 2
    assert (point2sv[:50] == -1).all()  # label 0 pruned
    assert (point2sv[50:200] == 0).all()  # label 1 -> 0
    assert (point2sv[200:280] == -1).all()  # small pruned
    assert (point2sv[280:] == 1).all()  # label 3 -> 1


@pytest.mark.skipif(not native_available(), reason="liblidal_native.so not built")
def test_prepare_supervoxels_vccs_writes_tree(tmp_path):
    from tests.synth import make_mini_sk, mini_cfg
    from lidal_tpu.data import semantic_kitti as sk
    from lidal_tpu.data.selection import load_sv_info
    from lidal_tpu.prep.supervoxel_vccs import prepare_supervoxels_vccs

    d = str(tmp_path)
    make_mini_sk(d, seqs=("00",), frames_per_seq=2, points=3000)
    cfg = mini_cfg(d, seqs=("00",))
    seq_frames = {"00": sk.list_frames(cfg.data_root, ["00"])}
    read_xyz = lambda p: sk.read_frame(p, with_labels=False)[0]  # noqa: E731
    # mini frames span ~20 m: use a finer seed grid so clusters exist
    prepare_supervoxels_vccs(cfg, seq_frames, read_xyz, voxel_res=0.3, seed_res=4.0)
    base = os.path.join(cfg.processing_root, "SK", "super_voxel", "VCCS")
    files = sorted(os.listdir(os.path.join(base, "00")))
    assert files == ["000000.npz", "000001.npz"]
    p2s0, gid0 = load_sv_info(os.path.join(base, "00", "000000.npz"))
    p2s1, gid1 = load_sv_info(os.path.join(base, "00", "000001.npz"))
    # globally-unique consecutive ids across frames
    if len(gid0) and len(gid1):
        assert gid1[0] == gid0[-1] + 1
    assert os.path.exists(os.path.join(base, "id2sv.npz"))
    # pruning: every kept supervoxel has > 100 points
    for p2s in (p2s0, p2s1):
        for s in range(p2s.max() + 1):
            assert (p2s == s).sum() > 100
