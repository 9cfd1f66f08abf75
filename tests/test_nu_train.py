"""nuScenes end-to-end smoke: manifest -> bootstrap -> round-0 training, and
the NU prep stages (grids), over synthetic v1.0 JSON tables."""

import dataclasses
import json
import os

import numpy as np
import pytest

from tests.test_nuscenes import _make_mini_nu
from tests.synth import mini_cfg

pytestmark = pytest.mark.slow


def _nu_cfg(root, version):
    cfg = mini_cfg(root, seqs=("scene-0000", "scene-0001"), model_name="Mink")
    cfg = dataclasses.replace(
        cfg,
        dataset_name="NU",
        nu_root=root,
        data_override=dataclasses.replace(
            cfg.data_override, name="NU", num_classes=16, batch_size=2
        ),
    )
    # pin the splits so both scenes train
    with open(os.path.join(root, "splits.json"), "w") as f:
        json.dump({"train": ["scene-0000", "scene-0001"], "val": ["scene-0001"]}, f)
    return cfg


def test_nu_round0_train_and_grids(tmp_path, monkeypatch):
    root = str(tmp_path)
    version = _make_mini_nu(root, n_scenes=2, samples_per_scene=4, points=600)
    cfg = _nu_cfg(root, version)

    # build_manifest defaults to v1.0-trainval; point it at the mini version
    import lidal_tpu.data.nuscenes as nu

    orig = nu.build_manifest

    def patched(r, version_arg="v1.0-trainval", cache_path=None):
        return orig(r, version, cache_path=cache_path)

    monkeypatch.setattr(nu, "build_manifest", patched)

    from lidal_tpu.prep.grid import prepare_nu_grids
    from lidal_tpu.runtime.train_loop import build_train_loader, nu_seq_frames, run_train

    seq_frames = nu_seq_frames(cfg)
    assert set(seq_frames) == {"scene-0000", "scene-0001"}
    assert all(len(v) == 4 for v in seq_frames.values())

    prepare_nu_grids(cfg, seq_frames)
    gdir = os.path.join(cfg.processing_root, "NU", "grid", "scene-0000")
    assert len(os.listdir(gdir)) == 4

    # round 0: bootstrap picks round(0.01*4)=0 frames; patch flags like SK e2e
    from lidal_tpu.data.selection import bootstrap_round0

    bootstrap_round0(cfg, seq_frames)
    ff = os.path.join(cfg.processing_root, "NU", "frame_flag", "0r")
    for s in seq_frames:
        flag = np.load(os.path.join(ff, f"{s}.npy"))
        flag[:] = False
        flag[:2] = True
        np.save(os.path.join(ff, f"{s}.npy"), flag)

    loader = build_train_loader(cfg)
    assert len(loader.files) == 4
    state = run_train(cfg, loader=loader, max_iter=1)
    assert int(state.step) == 1
    assert os.path.exists(os.path.join(cfg.checkpoint_root, "NU", "Mink", "0r", "current"))
