"""CLI surface: prep -> bootstrap -> train -> evaluate through ``main(argv)``."""

import os

import numpy as np
import pytest

from tests.synth import make_mini_sk

pytestmark = pytest.mark.slow


def test_cli_round0(tmp_path, monkeypatch):
    d = str(tmp_path)
    make_mini_sk(d, seqs=("00",), frames_per_seq=4, points=600)
    monkeypatch.chdir(d)

    from lidal_tpu.cli.__main__ import main

    common = [
        "--dataset_name", "SK", "--model_name", "Mink",
        "--data_root", "sequences",
        "--processing_root", "Processing_files",
        "--checkpoint_root", "check_points",
        "--train_seqs", "00", "--val_seqs", "00", "--batch_size", "2",
        "--point_cap", "1024", "--level_caps", "1024,1024,512,256,64",
    ]
    assert main(["prep", "--stage", "supervoxels"] + common) == 0
    assert main(["prep", "--stage", "grids"] + common) == 0
    assert main(["prep", "--stage", "bootstrap"] + common) == 0

    # 1% of 4 frames rounds to zero: label the first two frames manually
    ff = "Processing_files/SK/frame_flag/0r/00.npy"
    f = np.load(ff)
    f[:2] = True
    np.save(ff, f)
    svdir = "Processing_files/SK/sv_flag/KMeans/0r/00"
    for i, name in enumerate(sorted(os.listdir(svdir))):
        p = os.path.join(svdir, name)
        sv = np.load(p)
        sv[:] = 1 if i < 2 else 0
        np.save(p, sv)

    args = ["--r_id", "0", "--label_unit", "sv", "--metric_name", "LiDAL"]
    assert main(["train", "--max_iter", "2"] + args + common) == 0
    assert os.path.exists("check_points/SK/Mink/0r/current")
    assert main(["evaluate"] + args + common) == 0
