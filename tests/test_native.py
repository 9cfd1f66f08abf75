"""Native C++ components: VCCS clustering + balanced k-means invariants."""

import numpy as np
import pytest

from lidal_tpu.prep.native import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="liblidal_native.so not built")


def _scene(rng, n=20_000, extent=25.0):
    """Ground plane + a few walls, LiDAR-ish."""
    n_g = n * 2 // 3
    g = np.stack(
        [
            rng.uniform(-extent, extent, n_g),
            rng.uniform(-extent, extent, n_g),
            0.05 * rng.standard_normal(n_g),
        ],
        1,
    )
    n_w = n - n_g
    cx = rng.uniform(-extent, extent, 8)
    cy = rng.uniform(-extent, extent, 8)
    wi = rng.integers(0, 8, n_w)
    w = np.stack(
        [
            cx[wi] + rng.normal(scale=1.0, size=n_w),
            cy[wi] + rng.normal(scale=1.0, size=n_w),
            rng.uniform(0, 5, n_w),
        ],
        1,
    )
    return np.concatenate([g, w]).astype(np.float32)


def test_vccs_basic_properties():
    from lidal_tpu.prep.native import vccs_cluster

    rng = np.random.default_rng(0)
    xyz = _scene(rng)
    labels = vccs_cluster(xyz)
    assert labels.shape == (len(xyz),)
    n_sv = labels.max()
    assert n_sv >= 15  # ~ (50/10)^2 seed cells on the ground alone
    # almost all points assigned
    assert (labels > 0).mean() > 0.85
    # supervoxels are spatially compact: intra-sv bbox diagonal bounded by the
    # growth horizon (~ seed_res)
    for sv in rng.choice(np.arange(1, n_sv + 1), size=10, replace=False):
        m = labels == sv
        if m.sum() < 2:
            continue
        ext = xyz[m].max(0) - xyz[m].min(0)
        assert np.linalg.norm(ext) < 2.5 * 10.0, sv
    # determinism
    labels2 = vccs_cluster(xyz)
    np.testing.assert_array_equal(labels, labels2)


def test_vccs_param_sensitivity():
    from lidal_tpu.prep.native import vccs_cluster

    rng = np.random.default_rng(1)
    xyz = _scene(rng, n=8000)
    coarse = vccs_cluster(xyz, seed_res=20.0)
    fine = vccs_cluster(xyz, seed_res=5.0)
    assert fine.max() > coarse.max()


def test_balanced_kmeans_native_sizes():
    from lidal_tpu.prep.native import balanced_kmeans_native

    rng = np.random.default_rng(2)
    xyz = _scene(rng, n=10_000)
    k = 20
    labels = balanced_kmeans_native(xyz, n_clusters=k, size_tol=0.05)
    assert labels.shape == (len(xyz),)
    assert set(np.unique(labels)) <= set(range(k))
    counts = np.bincount(labels, minlength=k)
    cap = max(int(len(xyz) * 1.05 / k), -(-len(xyz) // k))
    assert counts.max() <= cap
    assert counts.min() > 0
    # determinism
    labels2 = balanced_kmeans_native(xyz, n_clusters=k, size_tol=0.05)
    np.testing.assert_array_equal(labels, labels2)


def test_balanced_kmeans_locality_beats_random():
    from lidal_tpu.prep.native import balanced_kmeans_native

    rng = np.random.default_rng(3)
    xyz = _scene(rng, n=5000)
    labels = balanced_kmeans_native(xyz, n_clusters=10)

    def mean_spread(lab):
        s = 0.0
        for c in np.unique(lab):
            m = lab == c
            s += np.linalg.norm(xyz[m] - xyz[m].mean(0), axis=1).mean()
        return s / len(np.unique(lab))

    rand_lab = rng.integers(0, 10, len(xyz))
    assert mean_spread(labels) < 0.5 * mean_spread(rand_lab)


def test_python_fallback_matches_constraints():
    from lidal_tpu.prep.supervoxel_kmeans import balanced_kmeans

    rng = np.random.default_rng(4)
    xyz = _scene(rng, n=1500)
    lab_py = balanced_kmeans(xyz, n_clusters=8, prefer_native=False)
    lab_cc = balanced_kmeans(xyz, n_clusters=8, prefer_native=True)
    for lab in (lab_py, lab_cc):
        counts = np.bincount(lab, minlength=8)
        assert counts.max() <= max(int(len(xyz) * 1.05 / 8), -(-len(xyz) // 8))
        assert counts.min() > 0
