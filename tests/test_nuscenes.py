"""nuScenes native parser tests over synthetic v1.0 JSON tables."""

import json
import os

import numpy as np

from lidal_tpu.data import nuscenes as nu


def _make_mini_nu(root, n_scenes=2, samples_per_scene=3, points=200, seed=0):
    rng = np.random.default_rng(seed)
    version = "v1.0-mini"
    vd = os.path.join(root, version)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(root, "lidarseg", version), exist_ok=True)
    os.makedirs(vd, exist_ok=True)

    scenes, samples, sample_datas, ego_poses, calibs, lidarsegs = [], [], [], [], [], []
    cal_tok = "cal0"
    calibs.append(
        {
            "token": cal_tok,
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "translation": [0.5, 0.0, 1.8],
        }
    )
    for si in range(n_scenes):
        stoks = [f"s{si}_{k}" for k in range(samples_per_scene)]
        scenes.append(
            {
                "token": f"scene{si}",
                "name": f"scene-{si:04d}",
                "first_sample_token": stoks[0],
            }
        )
        for k, tok in enumerate(stoks):
            samples.append(
                {
                    "token": tok,
                    "next": stoks[k + 1] if k + 1 < len(stoks) else "",
                    "prev": stoks[k - 1] if k > 0 else "",
                }
            )
            sd_tok = f"sd_{tok}"
            fname = f"samples/LIDAR_TOP/{tok}.pcd.bin"
            raw = rng.random((points, 5)).astype(np.float32)
            raw.tofile(os.path.join(root, fname))
            ep_tok = f"ep_{tok}"
            ego_poses.append(
                {
                    "token": ep_tok,
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "translation": [10.0 * k, 0.0, 0.0],
                }
            )
            ls_fname = f"lidarseg/{version}/{sd_tok}.bin"
            labels = rng.integers(0, 32, points).astype(np.uint8)
            labels.tofile(os.path.join(root, ls_fname))
            sample_datas.append(
                {
                    "token": sd_tok,
                    "sample_token": tok,
                    "is_key_frame": True,
                    "filename": fname,
                    "calibrated_sensor_token": cal_tok,
                    "ego_pose_token": ep_tok,
                }
            )
            lidarsegs.append({"sample_data_token": sd_tok, "filename": ls_fname})

    for name, table in (
        ("scene", scenes),
        ("sample", samples),
        ("sample_data", sample_datas),
        ("ego_pose", ego_poses),
        ("calibrated_sensor", calibs),
        ("lidarseg", lidarsegs),
    ):
        with open(os.path.join(vd, f"{name}.json"), "w") as f:
            json.dump(table, f)
    return version


def test_manifest_and_reader(tmp_path):
    root = str(tmp_path)
    version = _make_mini_nu(root)
    manifest = nu.build_manifest(root, version, cache_path=os.path.join(root, "cache.pkl"))
    assert set(manifest) == {"scene-0000", "scene-0001"}
    entries = manifest["scene-0000"]
    assert len(entries) == 3
    # frames ordered by the sample chain; ego translation grows with index
    for k, e in enumerate(entries):
        assert e["global_pose"][0, 3] == 10.0 * k + 0.5  # ego x + sensor offset
    xyz, sig, labels = nu.read_frame(entries[0])
    assert xyz.shape == (200, 3) and sig.shape == (200,)
    assert labels is not None and labels.shape == (200,)
    assert set(np.unique(labels)) <= set(range(16)) | {255}
    # cache round-trips
    manifest2 = nu.build_manifest(root, version, cache_path=os.path.join(root, "cache.pkl"))
    assert manifest2.keys() == manifest.keys()


def test_label_map_matches_reference_table():
    lm = nu.build_label_map()
    assert lm[9] == 0 and lm[14] == 1 and lm[15] == 2 and lm[16] == 2
    assert lm[17] == 3 and lm[24] == 10 and lm[30] == 15
    assert lm[0] == 255 and lm[31] == 255 and lm[99] == 255
    # exactly 16 classes present
    assert set(lm[lm != 255]) == set(range(16))


def test_quaternion_rotation_roundtrip():
    # 90 deg about z: w=cos(45), z=sin(45)
    import math

    q = [math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)]
    r = nu.quaternion_to_rotation(q)
    v = np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(r @ v, [0.0, 1.0, 0.0], atol=1e-9)


def test_splits_fallback(tmp_path):
    import pytest

    # names disjoint from the official val set -> last-resort 85/15 fallback
    names = [f"scene-{i:04d}" for i in range(1090, 1110)]
    with pytest.warns(UserWarning, match="85/15"):
        tr, va = nu.load_splits(names)
    assert len(tr) == 17 and len(va) == 3
    sp = {"train": names[:5], "val": names[5:8]}
    p = str(tmp_path / "splits.json")
    with open(p, "w") as f:
        json.dump(sp, f)
    tr2, va2 = nu.load_splits(names, p)
    assert tr2 == names[:5] and va2 == names[5:8]


def test_splits_official_constant():
    """The shipped OFFICIAL_VAL constant partitions scene sets the way the
    devkit split does: val membership by name, train = complement."""
    from lidal_tpu.data.nuscenes_splits import OFFICIAL_VAL, official_split

    assert len(OFFICIAL_VAL) == 150
    assert all(s.startswith("scene-") and len(s) == 10 for s in OFFICIAL_VAL)
    # a subset containing official-val scenes splits by membership
    names = [f"scene-{i:04d}" for i in range(20)]
    tr, va = nu.load_splits(names)
    assert set(va) == {s for s in names if s in OFFICIAL_VAL}
    assert set(tr) == {s for s in names if s not in OFFICIAL_VAL}
    assert len(va) == 8  # scene-0003, scene-0012..0018
    # a full 850-scene trainval table must carve exactly 700/150
    trainval = sorted(OFFICIAL_VAL) + [f"scene-{i:04d}" for i in range(2000, 2700)]
    tr, va = official_split(trainval)
    assert len(tr) == 700 and len(va) == 150
    # disjoint sets return None (caller falls back)
    assert official_split([f"scene-{i:04d}" for i in range(2000, 2010)]) is None
