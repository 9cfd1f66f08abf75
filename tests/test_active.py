"""Active-selection tests: NN matching vs sklearn KDTree, LiDAL scoring vs a
scipy-based oracle, greedy selection invariants + handcrafted cases, frame-level
scorers vs scipy."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidal_tpu.active import frame_level as fl
from lidal_tpu.active import lidal, redal
from lidal_tpu.active.nn_match import build_grid, nn_query


def _cloud(rng, n, extent=5.0, offset=0.0):
    return (rng.random((n, 3)) * extent + offset).astype(np.float32)


# ----- nn_match vs sklearn KDTree ----------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_nn_query_matches_kdtree_within_threshold(seed):
    from sklearn.neighbors import KDTree

    rng = np.random.default_rng(seed)
    thresh = 0.1
    nei = _cloud(rng, 800, extent=4.0)
    q = _cloud(rng, 500, extent=4.2, offset=-0.1)
    grid = build_grid(jnp.asarray(nei), jnp.ones(len(nei), bool), cell=thresh)
    dist, nn_src, found = nn_query(grid, jnp.asarray(q), jnp.ones(len(q), bool), cell=thresh)
    dist, nn_src, found = np.asarray(dist), np.asarray(nn_src), np.asarray(found)

    tree = KDTree(nei)
    kd_d, kd_i = tree.query(q, k=1)
    kd_d, kd_i = kd_d[:, 0], kd_i[:, 0]
    kd_match = kd_d <= thresh
    our_match = found  # band-NN contract: found IS the within-threshold match set
    np.testing.assert_array_equal(our_match, kd_match)
    # where matched, the nearest point and distance agree
    np.testing.assert_allclose(dist[our_match], kd_d[kd_match], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(nn_src[our_match], kd_i[kd_match])


def test_nn_query_negative_coords_and_empty():
    rng = np.random.default_rng(2)
    nei = _cloud(rng, 100, extent=3.0, offset=-50.0)  # negative global coords
    q = nei[:20] + 0.03
    grid = build_grid(jnp.asarray(nei), jnp.ones(len(nei), bool), cell=0.1)
    dist, nn_src, found = nn_query(grid, jnp.asarray(q), jnp.ones(len(q), bool), cell=0.1)
    assert np.asarray(found).all()
    assert (np.asarray(dist) <= 0.1).all()
    # invalid queries are never found
    _, _, f2 = nn_query(grid, jnp.asarray(q), jnp.zeros(len(q), bool), cell=0.1)
    assert not np.asarray(f2).any()


# ----- LiDAL scoring vs scipy oracle -------------------------------------------------


def _oracle_score(q_prob, q_xyz, nei_probs, nei_xyzs, thresh=0.1):
    from scipy.special import kl_div
    from scipy.stats import entropy
    from sklearn.neighbors import KDTree

    eps = 1e-5
    p = q_prob.shape[0]
    sum_prob = q_prob.copy()
    interd = np.zeros(p)
    count = np.ones(p)
    for npb, nxyz in zip(nei_probs, nei_xyzs):
        tree = KDTree(nxyz)
        d, i = tree.query(q_xyz, k=1)
        d, i = d[:, 0], i[:, 0]
        m = d <= thresh
        sum_prob[m] += npb[i][m]
        interd[m] += np.sum(kl_div(q_prob[m] + eps, npb[i][m] + eps), axis=1)
        count[m] += 1
    sum_prob = sum_prob / count[:, None]
    intere = entropy(sum_prob, axis=1)
    mc = count - 1
    mm = mc > 0
    interd[mm] /= mc[mm]
    return interd, intere


def test_score_frame_matches_scipy_oracle():
    rng = np.random.default_rng(3)
    c = 7
    q_xyz = _cloud(rng, 300, extent=3.0)
    q_prob = rng.dirichlet(np.ones(c), 300).astype(np.float32)
    nei_xyzs, nei_probs, grids = [], [], []
    for k in range(4):
        nx = q_xyz + rng.normal(scale=0.06, size=q_xyz.shape).astype(np.float32)
        npb = rng.dirichlet(np.ones(c), 300).astype(np.float32)
        nei_xyzs.append(nx)
        nei_probs.append(npb)
        grids.append(lidal.make_neighbor_grid(nx))
    interd, intere = lidal.score_frame(q_prob, q_xyz, nei_probs, grids)
    od, oe = _oracle_score(q_prob.astype(np.float64), q_xyz, [p.astype(np.float64) for p in nei_probs], nei_xyzs)
    np.testing.assert_allclose(interd, od, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(intere, oe, rtol=2e-4, atol=2e-5)


def test_score_frame_dense_cluster_exact():
    """A saturated hash-grid cell (the case that overflowed the v2 kernel's
    candidate caps and required a re-scoring ladder): the band scan has no
    caps, so one pass must match the KD-tree oracle exactly."""
    rng = np.random.default_rng(11)
    c = 5
    n = 300
    q_xyz = _cloud(rng, n, extent=2.0)
    # dense cluster: ~70 neighbor points inside one 0.1 m cell column
    q_xyz[:40] = np.array([1.0, 1.0, 1.0], np.float32) + rng.normal(
        scale=0.02, size=(40, 3)
    ).astype(np.float32)
    q_prob = rng.dirichlet(np.ones(c), n).astype(np.float32)
    nei_xyzs, nei_probs, grids = [], [], []
    for k in range(2):
        nx = q_xyz + rng.normal(scale=0.01, size=q_xyz.shape).astype(np.float32)
        nx[:70] = np.array([1.0, 1.0, 1.0], np.float32) + rng.normal(
            scale=0.02, size=(70, 3)
        ).astype(np.float32)
        npb = rng.dirichlet(np.ones(c), n).astype(np.float32)
        nei_xyzs.append(nx)
        nei_probs.append(npb)
        grids.append(lidal.make_neighbor_grid(nx))
    interd, intere = lidal.score_frame(q_prob, q_xyz, nei_probs, grids)
    od, oe = _oracle_score(
        q_prob.astype(np.float64), q_xyz, [p.astype(np.float64) for p in nei_probs], nei_xyzs
    )
    np.testing.assert_allclose(interd, od, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(intere, oe, rtol=2e-4, atol=2e-5)


def test_neighbor_ids_reference_arithmetic():
    # middle of a long sequence: 12 before + 12 after
    ids = lidal.neighbor_ids(50, 1000)
    assert ids == list(range(49, 37, -1)) + list(range(51, 63))
    # start-of-sequence reflection quirk (LiDAL.py:41)
    ids0 = lidal.neighbor_ids(0, 1000)
    assert ids0[:12] == [13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24]
    # end-of-sequence quirk (LiDAL.py:42): nfiles - 2 - 12 - offset
    idsl = lidal.neighbor_ids(999, 1000)
    assert idsl[12:] == list(range(986, 974, -1))


# ----- greedy selection ---------------------------------------------------------------


def test_lidal_select_handcrafted():
    # 4 SVs far apart + 1 close pair; AL budget fits 2 SVs of 10 points each.
    centers = np.array(
        [[0, 0, 0], [100, 0, 0], [102, 0, 0], [200, 0, 0], [300, 0, 0]], np.float32
    )
    interd = np.array([5.0, 4.0, 3.0, 2.0, 1.0], np.float32)
    intere = np.array([0.1, 0.2, 0.9, 0.3, 0.4], np.float32)
    pnums = np.full(5, 10, np.int64)
    flags = np.zeros(5, np.int64)
    res = lidal.select(flags, interd, intere, pnums, centers, train_point_num=2000)
    # budget = 20 points = 2 SVs. Order by interd desc: 0 (add), 1 (add, budget
    # now 0), 2 within 5m of 1 and higher entropy -> swap 1 out, 3 would exceed.
    assert set(np.where(res.sv_flags == 1)[0]) == {0, 2}
    # SL: lowest nonzero divergence among remaining {1, 3, 4}: 4 (1.0) then 3 (2.0)
    assert set(np.where(res.sv_flags == 2)[0]) == {4, 3}


def test_lidal_select_skips_zero_divergence_for_sl():
    centers = np.array([[0, 0, 0], [100, 0, 0], [200, 0, 0]], np.float32)
    interd = np.array([3.0, 0.0, 1.0], np.float32)
    intere = np.array([0.5, 0.5, 0.5], np.float32)
    pnums = np.full(3, 10, np.int64)
    res = lidal.select(np.zeros(3, np.int64), interd, intere, pnums, centers, train_point_num=1000)
    assert res.sv_flags[1] == 0  # zero divergence never pseudo-labeled


def test_lidal_sl_excludes_previous_pseudo():
    centers = np.array([[0, 0, 0], [100, 0, 0], [200, 0, 0]], np.float32)
    interd = np.array([5.0, 1.0, 2.0], np.float32)
    intere = np.full(3, 0.5, np.float32)
    pnums = np.full(3, 10, np.int64)
    flags = np.array([0, 2, 0], np.int64)  # sv 1 was pseudo last round
    res = lidal.select(flags, interd, intere, pnums, centers, train_point_num=1000)
    # AL adds 0 (budget 10 points). SL candidates exclude sv 1 (old pseudo):
    # only sv 2 eligible.
    assert res.sv_flags[1] == 0
    assert res.sv_flags[2] == 2


def test_lidal_select_budget_invariant():
    rng = np.random.default_rng(4)
    n = 200
    centers = (rng.random((n, 3)) * 500).astype(np.float32)
    interd = rng.random(n).astype(np.float32) + 0.01
    intere = rng.random(n).astype(np.float32)
    pnums = rng.integers(50, 200, n)
    tpn = 100_000  # budget 1000 points
    res = lidal.select(np.zeros(n, np.int64), interd, intere, pnums, centers, tpn)
    for flag_val in (1, 2):
        sel = np.where(res.sv_flags == flag_val)[0]
        total = pnums[sel].sum()
        assert total <= 1000 + pnums.max()  # last add may cross then break
        # no two selected centers within 5 m
        for a in range(len(sel)):
            for b in range(a + 1, len(sel)):
                d = np.sqrt(np.square(centers[sel[a]] - centers[sel[b]]).sum())
                assert d >= 5.0


def test_sv_aggregate_matches_loop():
    rng = np.random.default_rng(5)
    p, n_sv = 300, 12
    p2s = rng.integers(-1, n_sv, p)
    interd = rng.random(p)
    intere = rng.random(p)
    xyz = rng.random((p, 3)).astype(np.float32)
    d, e, cnt, ctr = lidal.sv_aggregate(interd, intere, p2s, n_sv, xyz)
    for s in range(n_sv):
        m = p2s == s
        if m.sum():
            np.testing.assert_allclose(d[s], interd[m].mean(), rtol=1e-5)
            np.testing.assert_allclose(e[s], intere[m].mean(), rtol=1e-5)
            assert cnt[s] == m.sum()
            np.testing.assert_allclose(ctr[s], xyz[m].mean(0), rtol=1e-4)


# ----- frame-level -------------------------------------------------------------------


def test_frame_scores_match_scipy():
    from scipy.stats import entropy

    rng = np.random.default_rng(6)
    prob = rng.dirichlet(np.ones(19), 500).astype(np.float32)
    np.testing.assert_allclose(
        float(fl.entropy_score(jnp.asarray(prob))), entropy(prob, axis=1).mean(), rtol=1e-5
    )
    srt = np.sort(prob, axis=1)
    np.testing.assert_allclose(
        float(fl.margin_score(jnp.asarray(prob))), (srt[:, -1] - srt[:, -2]).mean(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(fl.least_confidence_score(jnp.asarray(prob))), prob.max(1).mean(), rtol=1e-5
    )


def test_segment_entropy_oracle():
    rng = np.random.default_rng(7)
    p, c = 400, 5
    pred = rng.integers(0, c, p)
    p2s = rng.integers(0, 8, p)
    got = fl.segment_entropy_score(pred, p2s, c)
    expect = 0.0
    for s in range(8):
        m = p2s == s
        sv_pred = pred[m]
        se = 0.0
        for cl in range(c):
            qc = (sv_pred == cl).sum() / sv_pred.shape[0]
            se += -qc * np.log2(qc + 1e-12)
        expect += se * sv_pred.shape[0] / p
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_select_top_frames_and_core_set():
    rng = np.random.default_rng(8)
    n = 200
    flag = np.zeros(n, bool)
    flag[:3] = True
    scores = rng.random(n).astype(np.float32)
    out = fl.select_top_frames(flag, scores, frac=0.05, largest=True)
    added = np.where(out & ~flag)[0]
    assert len(added) == 10
    unl = np.where(~flag)[0]
    thresh = np.sort(scores[unl])[-10]
    assert (scores[added] >= thresh).all()

    feats = rng.random((n, 16)).astype(np.float32)
    out2 = fl.core_set_select(feats, flag, frac=0.05)
    assert (out2 & ~flag).sum() == 10
    assert (out2 | ~flag).all() or True  # labeled stay labeled
    assert out2[flag].all()


def test_redal_select_budget_and_decay():
    rng = np.random.default_rng(9)
    n = 400
    flags = np.zeros(n, np.int64)
    flags[:10] = 1
    scores = rng.random(n).astype(np.float32)
    feats = rng.random((n, 8)).astype(np.float32)
    pnums = rng.integers(10, 50, n)
    res = redal.select(flags, scores, feats, pnums, train_point_num=50_000, num_clusters=5)
    added = res.added
    assert len(added) > 0
    assert pnums[added].sum() <= 500 + pnums.max()
    assert (res.sv_flags[:10] == 1).all()


def test_kmeans_labels_deterministic_and_clusters_blobs():
    """In-repo Lloyd (replacing the reference's sklearn KMeans,
    ReDAL.py:219-221): deterministic across calls, separates well-spaced
    blobs exactly, and matches sklearn's inertia within 5% when sklearn is
    available (optional cross-check)."""
    rng = np.random.default_rng(11)
    k, per = 6, 40
    centers = rng.normal(scale=50.0, size=(k, 8))
    x = (centers[:, None] + rng.normal(size=(k, per, 8))).reshape(-1, 8)

    lab1 = redal.kmeans_labels(x, k, seed=0)
    lab2 = redal.kmeans_labels(x, k, seed=0)
    np.testing.assert_array_equal(lab1, lab2)
    assert len(np.unique(lab1)) == k
    # each true blob lands in exactly one cluster
    for j in range(k):
        assert len(np.unique(lab1[j * per : (j + 1) * per])) == 1

    def inertia(labels):
        tot = 0.0
        for c in np.unique(labels):
            pts = x[labels == c]
            tot += np.square(pts - pts.mean(0)).sum()
        return tot

    try:
        from sklearn.cluster import KMeans
    except ImportError:
        return
    sk = KMeans(n_clusters=k, random_state=0, n_init=10).fit(x).labels_
    assert inertia(lab1) <= 1.05 * inertia(sk)


def test_sv_random_budget():
    rng = np.random.default_rng(10)
    n = 300
    pnums = rng.integers(5, 20, n)
    flags = redal.select_random_svs(np.zeros(n, np.int64), pnums, train_point_num=10_000, rng=rng)
    sel = np.where(flags == 1)[0]
    assert 0 < pnums[sel].sum() <= 100 + pnums.max()


def test_score_slot_matches_score_frame():
    """The zero-upload ring path (query scored FROM its resident slot,
    nn_match.prepared_from_grid) must reproduce the uploaded-query path
    bitwise on the valid prefix."""
    import jax.numpy as jnp

    from lidal_tpu.active.lidal_runner import NeighborRing

    rng = np.random.default_rng(21)
    c, n = 6, 220
    n_frames = 8
    frames = []
    base = _cloud(rng, n, extent=4.0)
    for i in range(n_frames):
        xyz = base + np.array([0.3 * i, 0, 0], np.float32)
        xyz += rng.normal(scale=0.05, size=xyz.shape).astype(np.float32)
        prob = rng.dirichlet(np.ones(c), n).astype(np.float32)
        frames.append((xyz, prob))

    fi = 4
    nei = lidal.neighbor_ids(fi, n_frames, nei_num=4)
    ring = NeighborRing(4 + 2, cap=n, device=None)
    ring.ensure([fi] + nei, lambda k: frames[k])
    w = jnp.asarray(ring.weights(nei))
    interd_s, intere_s = lidal.score_slot(ring.state, ring.key2slot[fi], w)  # [2, cap]

    q_xyz, q_prob = frames[fi]
    grids = [lidal.make_neighbor_grid(frames[k][0]) for k in nei]
    probs = [frames[k][1] for k in nei]
    interd_f, intere_f = lidal.score_frame(q_prob, q_xyz, probs, grids)

    np.testing.assert_array_equal(np.asarray(interd_s)[:n], interd_f[:n])
    np.testing.assert_array_equal(np.asarray(intere_s)[:n], intere_f[:n])
