"""Interpret-mode parity tests for the three Pallas kernels.

The kernels are gated off-TPU in production (``ops/conv.py``,
``merge_lookup._pallas_ok``); these tests run
them through Pallas interpret mode on the CPU suite so a Mosaic-side regression
cannot ship green.  Oracles:

* ``pallas_conv``  vs the XLA im2col gather path (integer data -> bit-exact
  despite the kernel's bf16 feature staging);
* ``pallas_merge`` vs ``np.searchsorted`` and the XLA bitonic-merge path;
* ``pallas_nnband`` vs the jnp band fallback (bitwise) and a brute-force NN.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lidal_tpu.ops.conv as conv_mod
import lidal_tpu.ops.merge_lookup as ml
import lidal_tpu.ops.pallas_conv as pconv
import lidal_tpu.ops.pallas_merge as pmerge
import lidal_tpu.ops.pallas_nnband as pnnband
from lidal_tpu.active import nn_match
from lidal_tpu.ops.hashing import SENTINEL_KEY

# --------------------------------------------------------------------------------------
# pallas_conv: banded gather-GEMM vs XLA im2col oracle
# --------------------------------------------------------------------------------------


def _int_feats(rng, n, c):
    # small integers: every product/partial sum is exactly representable in
    # bf16 (the kernel stages features/weights in bf16), so parity is exact
    return rng.integers(-4, 5, size=(n, c)).astype(np.float32)


def _sorted_nbr(rng, m, k, n, density):
    """Per-column sorted index maps with sentinel (== n) entries, mimicking
    rulebook columns (merge positions of sorted streams + sentinel tails)."""
    nbr = np.full((m, k), n, np.int32)
    for j in range(k):
        cnt = int(m * density)
        if cnt == 0:
            continue  # fully-sentinel column: the group band may be empty
        rows = np.sort(rng.choice(m, size=cnt, replace=False))
        vals = np.sort(rng.choice(n, size=min(cnt, n), replace=False))
        nbr[rows[: len(vals)], j] = vals
    return nbr


def _conv_oracle(feats, w, nbr):
    fx = np.concatenate([feats, np.zeros((1, feats.shape[1]), np.float32)])
    return np.einsum("mkc,kco->mo", fx[nbr], w)


@pytest.mark.parametrize(
    "seed,n,m,cin,cout,density",
    [
        (0, 256, 256, 8, 16, 0.9),
        (1, 512, 256, 16, 8, 0.5),
        (2, 256, 512, 8, 8, 0.1),
        (3, 512, 512, 32, 16, 0.7),
        (4, 256, 256, 8, 16, 0.0),  # all-sentinel: every band empty
        (5, 768, 256, 8, 8, 1.0),
        (6, 256, 768, 16, 16, 0.3),
    ],
)
def test_pallas_conv_subm27_matches_oracle(seed, n, m, cin, cout, density):
    rng = np.random.default_rng(seed)
    k = 27
    feats = _int_feats(rng, n, cin)
    w = rng.integers(-4, 5, size=(k, cin, cout)).astype(np.float32)
    nbr = _sorted_nbr(rng, m, k, n, density)
    out = pconv.subm_conv_pallas(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(nbr), groups=3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), _conv_oracle(feats, w, nbr))


@pytest.mark.parametrize(
    "seed,n,m,cin,cout,density",
    [
        (10, 256, 256, 8, 16, 0.8),
        (11, 512, 256, 16, 8, 0.4),
        (12, 256, 512, 8, 8, 1.0),
        (13, 512, 512, 8, 16, 0.05),
    ],
)
def test_pallas_conv_downup8_matches_oracle(seed, n, m, cin, cout, density):
    """kernel 8 / groups 2: the down/up conv (and their dX backward) shape."""
    rng = np.random.default_rng(seed)
    k = 8
    feats = _int_feats(rng, n, cin)
    w = rng.integers(-4, 5, size=(k, cin, cout)).astype(np.float32)
    nbr = _sorted_nbr(rng, m, k, n, density)
    out = pconv.subm_conv_pallas(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(nbr), groups=2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), _conv_oracle(feats, w, nbr))


@pytest.mark.parametrize(
    "seed,k,groups,relu,density",
    [
        (40, 27, 3, True, 0.8),
        (41, 27, 3, False, 0.4),
        (42, 8, 2, True, 0.6),
        (43, 8, 2, True, 0.0),  # all-sentinel rows: mask must re-zero the shift
    ],
)
def test_pallas_conv_fused_bn_epilogue(seed, k, groups, relu, density):
    """scale/shift(+ReLU) epilogue == conv -> affine -> mask-invalid-rows.

    Integer feats/weights with power-of-two scale/shift keep every value
    exactly representable, so the comparison is bitwise."""
    rng = np.random.default_rng(seed)
    n, m, cin, cout = 512, 256, 8, 16
    feats = _int_feats(rng, n, cin)
    w = rng.integers(-4, 5, size=(k, cin, cout)).astype(np.float32)
    nbr = _sorted_nbr(rng, m, k, n, density)
    scale = (2.0 ** rng.integers(-2, 3, cout)).astype(np.float32)
    shift = rng.integers(-8, 9, cout).astype(np.float32)
    out = pconv.subm_conv_pallas(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(nbr), groups=groups,
        scale=jnp.asarray(scale), shift=jnp.asarray(shift), relu=relu, interpret=True,
    )
    want = _conv_oracle(feats, w, nbr) * scale + shift
    if relu:
        want = np.maximum(want, 0.0)
    want *= (nbr.min(axis=1, keepdims=True) < n).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out), want)


def test_conv_bn_batched_fallback_matches_unfused():
    """The XLA fallback of subm/down/up_conv_bn_batched == unfused conv
    followed by the BN affine, with invalid rows zeroed (the MaskedBatchNorm
    eval-mode contract)."""
    from lidal_tpu.ops.conv import (
        down_conv_batched, down_conv_bn_batched,
        subm_conv_batched, subm_conv_bn_batched,
        up_conv_batched, up_conv_bn_batched,
    )

    rng = np.random.default_rng(44)
    b, nf, nc, cin, cout = 2, 64, 32, 8, 16
    x = rng.standard_normal((b, nf, cin)).astype(np.float32)
    xc = rng.standard_normal((b, nc, cin)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    shift = rng.normal(scale=0.3, size=cout).astype(np.float32)

    w3 = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
    nbr = np.full((b, nf, 27), nf, np.int32)
    for bi in range(b):
        for j in range(27):
            rows = rng.choice(nf, size=nf // 2, replace=False)
            nbr[bi, np.sort(rows), j] = np.sort(rng.choice(nf, nf // 2, replace=False))
    nbr[:, :, 13] = np.arange(nf)  # center tap: all rows valid except the last 4
    nbr[:, -4:, :] = nf
    y = subm_conv_bn_batched(jnp.asarray(x), jnp.asarray(w3), jnp.asarray(nbr),
                             jnp.asarray(scale), jnp.asarray(shift), relu=True)
    ref = np.asarray(subm_conv_batched(jnp.asarray(x), jnp.asarray(w3), jnp.asarray(nbr)))
    ref = np.maximum(ref * scale + shift, 0.0)
    ref[np.asarray(nbr).min(-1) >= nf] = 0.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    w2 = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.1
    child = np.full((b, nc, 8), nf, np.int32)
    parent = np.full((b, nf), nc, np.int32)
    pdelta = np.zeros((b, nf), np.int32)
    for bi in range(b):
        for ci in range(nc - 2):  # last 2 coarse rows invalid
            kids = rng.choice(nf, size=2, replace=False)
            child[bi, ci, rng.integers(0, 8, 2)] = kids
            parent[bi, kids] = ci
            pdelta[bi, kids] = rng.integers(0, 8, 2)
    y = down_conv_bn_batched(jnp.asarray(x), jnp.asarray(w2), jnp.asarray(child),
                             jnp.asarray(scale), jnp.asarray(shift), relu=False)
    ref = np.asarray(down_conv_batched(jnp.asarray(x), jnp.asarray(w2),
                                       jnp.asarray(child), jnp.asarray(parent),
                                       jnp.asarray(pdelta)))
    ref = ref * scale + shift
    ref[np.asarray(child).min(-1) >= nf] = 0.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    y = up_conv_bn_batched(jnp.asarray(xc), jnp.asarray(w2), jnp.asarray(parent),
                           jnp.asarray(pdelta), jnp.asarray(scale), jnp.asarray(shift),
                           relu=True)
    ref = np.asarray(up_conv_batched(jnp.asarray(xc), jnp.asarray(w2), jnp.asarray(child),
                                     jnp.asarray(parent), jnp.asarray(pdelta)))
    ref = np.maximum(ref * scale + shift, 0.0)
    ref[np.asarray(parent) >= nc] = 0.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_pallas_conv_band_edges():
    """Indices hugging block boundaries (0, TN-1, TN, n-1) and single-row bands."""
    rng = np.random.default_rng(20)
    n, m, cin, cout, k = 512, 256, 8, 8, 27
    feats = _int_feats(rng, n, cin)
    w = rng.integers(-2, 3, size=(k, cin, cout)).astype(np.float32)
    nbr = np.full((m, k), n, np.int32)
    edge_vals = [0, 1, 255, 256, 257, 510, 511]
    for j in range(k):
        rows = np.sort(rng.choice(m, size=len(edge_vals), replace=False))
        nbr[rows, j] = np.sort(rng.permutation(edge_vals))
    out = pconv.subm_conv_pallas(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(nbr), groups=3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), _conv_oracle(feats, w, nbr))


def test_conv_ops_route_through_pallas(monkeypatch):
    """subm/down/up_conv + their custom-VJP backwards through the (interpret)
    Pallas path match the XLA path bit-for-bit on integer data."""
    import jax

    monkeypatch.setattr(
        pconv, "subm_conv_pallas", functools.partial(pconv.subm_conv_pallas, interpret=True)
    )
    monkeypatch.setattr(
        pconv, "conv_dx_dw_pallas", functools.partial(pconv.conv_dx_dw_pallas, interpret=True)
    )
    rng = np.random.default_rng(30)
    n = m = 256
    cin, cout = 8, 8

    # subm (27 taps, groups 3) — the custom VJP's dX AND dW both rely on the
    # mirror identity nbr[i,k]=j <=> nbr[j,K-1-k]=i, which only holds for
    # coordinate-derived rulebooks: build one from real coords.
    from lidal_tpu.ops.kernel_map import build_subm_nbr
    from lidal_tpu.ops.voxelize import unique_voxels

    coords = rng.integers(0, 8, size=(400, 3)).astype(np.int32)
    uv = unique_voxels(jnp.asarray(coords), jnp.ones(400, bool), n)
    nbr = np.asarray(build_subm_nbr(uv.coords, uv.valid))
    feats = _int_feats(rng, n, cin) * np.asarray(uv.valid)[:, None]
    w = rng.integers(-3, 4, size=(27, cin, cout)).astype(np.float32)
    dy = _int_feats(rng, m, cout) * np.asarray(uv.valid)[:, None]

    def run(use_pallas):
        monkeypatch.setattr(conv_mod, "USE_PALLAS", use_pallas)
        out, vjp = jax.vjp(
            lambda f, ww: conv_mod.subm_conv(f, ww, jnp.asarray(nbr)),
            jnp.asarray(feats),
            jnp.asarray(w),
        )
        df, dw = vjp(jnp.asarray(dy))
        return np.asarray(out), np.asarray(df), np.asarray(dw)

    o_p, df_p, dw_p = run(True)
    o_x, df_x, dw_x = run(False)
    np.testing.assert_array_equal(o_p, o_x)
    np.testing.assert_array_equal(df_p, df_x)
    np.testing.assert_array_equal(dw_p, dw_x)

    # down + up (8 taps, groups 2) with a consistent (child, parent, pdelta)
    nf = nc = 256
    parent = np.full(nf, nc, np.int32)
    pdelta = np.zeros(nf, np.int32)
    child = np.full((nc, 8), nf, np.int32)
    per_parent = {}
    for f in sorted(rng.choice(nf, size=180, replace=False)):
        p_ = int(rng.integers(0, nc))
        d_ = per_parent.setdefault(p_, [])
        if len(d_) < 8:
            parent[f] = p_
            pdelta[f] = len(d_)
            d_.append(f)
    for p_, fs in per_parent.items():
        for d_, f in enumerate(fs):
            child[p_, d_] = f
    child = np.sort(child, axis=0)  # columns sorted, as the plan builder emits
    # re-derive (parent, pdelta) from the sorted child map so they stay paired
    parent = np.full(nf, nc, np.int32)
    pdelta = np.zeros(nf, np.int32)
    for p_ in range(nc):
        for d_ in range(8):
            f = child[p_, d_]
            if f < nf:
                parent[f] = p_
                pdelta[f] = d_

    xf = _int_feats(rng, nf, cin)
    wd = rng.integers(-3, 4, size=(8, cin, cout)).astype(np.float32)
    dyc = _int_feats(rng, nc, cout)

    def run_down(use_pallas):
        monkeypatch.setattr(conv_mod, "USE_PALLAS", use_pallas)
        out, vjp = jax.vjp(
            lambda f, ww: conv_mod.down_conv(
                f, ww, jnp.asarray(child), jnp.asarray(parent), jnp.asarray(pdelta)
            ),
            jnp.asarray(xf),
            jnp.asarray(wd),
        )
        df, dw = vjp(jnp.asarray(dyc))
        return np.asarray(out), np.asarray(df), np.asarray(dw)

    for a, b in zip(run_down(True), run_down(False)):
        np.testing.assert_array_equal(a, b)

    xc = _int_feats(rng, nc, cin)
    dyf = _int_feats(rng, nf, cout)

    def run_up(use_pallas):
        monkeypatch.setattr(conv_mod, "USE_PALLAS", use_pallas)
        out, vjp = jax.vjp(
            lambda f, ww: conv_mod.up_conv(
                f, ww, jnp.asarray(child), jnp.asarray(parent), jnp.asarray(pdelta)
            ),
            jnp.asarray(xc),
            jnp.asarray(wd),
        )
        df, dw = vjp(jnp.asarray(dyf))
        return np.asarray(out), np.asarray(df), np.asarray(dw)

    for a, b in zip(run_up(True), run_up(False)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "seed,n,m,c_src,c_dst,c_f,k,groups,density",
    [
        (40, 256, 256, 8, 16, 8, 27, 3, 0.8),
        (41, 512, 256, 16, 8, 16, 27, 3, 0.4),
        (42, 256, 512, 8, 8, 16, 8, 2, 1.0),
        (43, 512, 512, 16, 16, 8, 8, 2, 0.0),  # all-sentinel: zero grads
        (44, 768, 256, 8, 8, 8, 27, 3, 0.15),
    ],
)
def test_conv_dx_dw_matches_oracle(seed, n, m, c_src, c_dst, c_f, k, groups, density):
    """The combined backward kernel vs direct XLA formulations of both
    products (integer data: bf16-exact, so parity is bitwise)."""
    rng = np.random.default_rng(seed)
    src = _int_feats(rng, n, c_src)
    w2 = rng.integers(-3, 4, size=(k, c_src, c_dst)).astype(np.float32)
    f = _int_feats(rng, m, c_f)
    nbr = _sorted_nbr(rng, m, k, n, density)
    dx, dwg = pconv.conv_dx_dw_pallas(
        jnp.asarray(src), jnp.asarray(w2), jnp.asarray(nbr), jnp.asarray(f),
        groups=groups, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(dx), _conv_oracle(src, w2, nbr))
    sx = np.concatenate([src, np.zeros((1, c_src), np.float32)])
    want_dwg = np.einsum("mf,mks->kfs", f, sx[nbr])
    np.testing.assert_array_equal(np.asarray(dwg), want_dwg)


# --------------------------------------------------------------------------------------
# pallas_merge: bitonic merge-rank vs searchsorted + the XLA merge path
# --------------------------------------------------------------------------------------


@pytest.fixture
def pallas_merge_on(monkeypatch):
    monkeypatch.setattr(
        pmerge, "merge_rank_pallas", functools.partial(pmerge.merge_rank_pallas, interpret=True)
    )
    monkeypatch.setattr(ml, "USE_PALLAS", True)
    yield
    monkeypatch.setattr(ml, "USE_PALLAS", None)


def _sorted_keys(rng, n, cap, lo_range=1 << 12):
    """[cap] sorted UNIQUE (hi, lo) int32 key arrays with a sentinel tail."""
    hi = rng.integers(0, 50, size=n).astype(np.int64)
    lo = rng.integers(0, lo_range, size=n).astype(np.int64)
    packed = np.unique(hi * lo_range + lo)[: cap]
    hi = (packed // lo_range).astype(np.int32)
    lo = (packed % lo_range).astype(np.int32)
    pad = cap - len(hi)
    hi = np.concatenate([hi, np.full(pad, SENTINEL_KEY, np.int32)])
    lo = np.concatenate([lo, np.full(pad, SENTINEL_KEY, np.int32)])
    return hi, lo


def _lb_oracle(t_hi, t_lo, q_hi, q_lo):
    """Lower bound of each (hi, lo) query in the lexicographic table order."""
    tt = t_hi.astype(np.int64) * (1 << 32) + (t_lo.astype(np.int64) & 0xFFFFFFFF)
    qq = q_hi.astype(np.int64) * (1 << 32) + (q_lo.astype(np.int64) & 0xFFFFFFFF)
    return np.searchsorted(tt, qq, side="left").astype(np.int32)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("shape", [(200, 120), (256, 256), (500, 300), (90, 600)])
def test_pallas_merge_lower_bound_matches_searchsorted(pallas_merge_on, seed, shape):
    n, m = shape
    rng = np.random.default_rng(seed)
    t_hi, t_lo = _sorted_keys(rng, n, n)
    g = 3
    q_hi = np.empty((g, m), np.int32)
    q_lo = np.empty((g, m), np.int32)
    for gi in range(g):
        nq = m - rng.integers(0, m // 3)  # sentinel tails of varying length
        qh, qlo = _sorted_keys(rng, nq, m)
        q_hi[gi], q_lo[gi] = qh, qlo
    got = np.asarray(
        ml.lower_bound_sorted_many(
            jnp.asarray(t_hi), jnp.asarray(t_lo), jnp.asarray(q_hi), jnp.asarray(q_lo)
        )
    )
    for gi in range(g):
        real = q_hi[gi] != SENTINEL_KEY
        oracle = _lb_oracle(t_hi[: np.sum(t_hi != SENTINEL_KEY)], t_lo[: np.sum(t_hi != SENTINEL_KEY)], q_hi[gi], q_lo[gi])
        np.testing.assert_array_equal(got[gi][real], oracle[real])


@pytest.mark.parametrize("seed", range(4))
def test_pallas_merge_lookup_found_matches_xla(seed):
    """with_found path (unique queries): Pallas kernel == XLA merge, bit-for-bit,
    including misses (-> n) and sentinel handling."""
    rng = np.random.default_rng(100 + seed)
    n, cap, m = 300, 384, 384
    t_hi, t_lo = _sorted_keys(rng, n, cap)
    # unique strictly-increasing query keys: a constant offset of the table
    # (the rulebook pattern) plus sentinel tail
    d_hi, d_lo = 1, 7
    q_hi = np.where(t_hi[:m] != SENTINEL_KEY, t_hi[:m] + d_hi, SENTINEL_KEY).astype(np.int32)
    q_lo = np.where(t_hi[:m] != SENTINEL_KEY, t_lo[:m] + d_lo, SENTINEL_KEY).astype(np.int32)

    def run(use_pallas):
        import unittest.mock as mock

        with mock.patch.object(ml, "USE_PALLAS", use_pallas), mock.patch.object(
            pmerge,
            "merge_rank_pallas",
            functools.partial(pmerge.merge_rank_pallas, interpret=True),
        ):
            return np.asarray(
                ml.lookup_sorted_many(
                    jnp.asarray(t_hi),
                    jnp.asarray(t_lo),
                    jnp.asarray(q_hi)[None],
                    jnp.asarray(q_lo)[None],
                    unique_queries=True,
                )[0]
            )

    np.testing.assert_array_equal(run(True), run(False))


def test_pallas_merge_grouped_tables(pallas_merge_on):
    """Per-stream tables (the 24-neighbor fusion shape): each stream's result
    matches its own searchsorted oracle."""
    rng = np.random.default_rng(7)
    s, n, m = 5, 256, 256
    t_hi = np.empty((s, n), np.int32)
    t_lo = np.empty((s, n), np.int32)
    q_hi = np.empty((s, m), np.int32)
    q_lo = np.empty((s, m), np.int32)
    for si in range(s):
        t_hi[si], t_lo[si] = _sorted_keys(rng, n - rng.integers(0, 100), n)
        q_hi[si], q_lo[si] = _sorted_keys(rng, m - rng.integers(0, 100), m)
    got = np.asarray(
        ml.lower_bound_sorted_grouped(
            jnp.asarray(t_hi), jnp.asarray(t_lo), jnp.asarray(q_hi), jnp.asarray(q_lo)
        )
    )
    for si in range(s):
        nt = int(np.sum(t_hi[si] != SENTINEL_KEY))
        real = q_hi[si] != SENTINEL_KEY
        oracle = _lb_oracle(t_hi[si][:nt], t_lo[si][:nt], q_hi[si], q_lo[si])
        np.testing.assert_array_equal(got[si][real], oracle[real])


def test_pallas_merge_empty_and_duplicate_keys(pallas_merge_on):
    # empty table: every lower bound is 0
    t_hi = np.full(128, SENTINEL_KEY, np.int32)
    t_lo = np.full(128, SENTINEL_KEY, np.int32)
    q_hi = np.sort(np.random.default_rng(8).integers(0, 40, 128)).astype(np.int32)
    q_lo = np.zeros(128, np.int32)
    got = np.asarray(
        ml.lower_bound_sorted_many(
            jnp.asarray(t_hi), jnp.asarray(t_lo), jnp.asarray(q_hi[None]), jnp.asarray(q_lo[None])
        )[0]
    )
    assert (got == 0).all()
    # heavy duplicates in both table and queries
    t_hi2 = np.sort(np.array([3] * 40 + [7] * 40 + [9] * 48, np.int32))
    t_lo2 = np.zeros(128, np.int32)
    q_hi2 = np.sort(np.array([3] * 30 + [5] * 30 + [9] * 68, np.int32))
    q_lo2 = np.zeros(128, np.int32)
    got2 = np.asarray(
        ml.lower_bound_sorted_many(
            jnp.asarray(t_hi2), jnp.asarray(t_lo2), jnp.asarray(q_hi2[None]), jnp.asarray(q_lo2[None])
        )[0]
    )
    np.testing.assert_array_equal(got2, _lb_oracle(t_hi2, t_lo2, q_hi2, q_lo2))


# --------------------------------------------------------------------------------------
# pallas_nnband: band pairwise NN scan vs the XLA fallback + brute force
# --------------------------------------------------------------------------------------


def _nn_pair(rng, p, cap, n_nei, n_q, extent, cluster=None):
    nei = (rng.random((cap, 3)) * extent).astype(np.float32)
    q = (rng.random((p, 3)) * extent).astype(np.float32)
    if cluster is not None:
        k, radius = cluster
        center = np.full(3, extent / 2, np.float32)
        nei[:k] = center + rng.normal(scale=radius, size=(k, 3)).astype(np.float32)
        q[: k // 2] = center + rng.normal(scale=radius, size=(k // 2, 3)).astype(np.float32)
    nv = np.zeros(cap, bool)
    nv[:n_nei] = True
    qv = np.zeros(p, bool)
    qv[:n_q] = True
    return nei, nv, q, qv


def _brute_nn(nei, nv, q, qv, thresh):
    d2 = np.sum((q[:, None, :].astype(np.float64) - nei[None].astype(np.float64)) ** 2, axis=2)
    d2[:, ~nv] = np.inf
    idx = np.argmin(d2, axis=1)
    dist = np.sqrt(d2[np.arange(len(q)), idx])
    match = qv & (dist <= thresh)
    return dist, idx, match


@pytest.mark.parametrize(
    "seed,p,cap,n_nei,n_q,extent",
    [
        (0, 256, 256, 256, 256, 4.0),
        (1, 256, 512, 400, 200, 3.0),  # sentinel tails both sides
        (2, 512, 256, 100, 512, 6.0),  # sparse table
        (3, 512, 512, 512, 512, 2.0),  # dense: large bands
        (4, 256, 256, 0, 256, 4.0),  # empty table
        (5, 256, 256, 256, 0, 4.0),  # no valid queries
        (6, 512, 512, 512, 512, 40.0),  # spread out: almost no matches
        (7, 512, 2048, 2048, 512, 3.0),  # multi-block bands
        (8, 256, 256, 200, 256, 0.5),  # everything in a handful of cells
    ],
)
def test_nnband_kernel_matches_xla_fallback(seed, p, cap, n_nei, n_q, extent):
    """Interpret-mode kernel vs the jnp fallback must agree BITWISE (same band
    rounding, same f32 arithmetic, same lowest-row tie rule), and both must
    reproduce brute-force KD-tree matching at the match level."""
    rng = np.random.default_rng(seed)
    nei, nv, q, qv = _nn_pair(rng, p, cap, n_nei, n_q, extent)
    grid = nn_match.build_grid(jnp.asarray(nei), jnp.asarray(nv), cell=0.1)
    gs = nn_match.stack_grids([grid])
    pq = nn_match.prepare_queries(jnp.asarray(q), jnp.asarray(qv), cell=0.1)
    k_d2, k_row = nn_match.nn_query_band(gs, pq, interpret=True)
    blo, nb = nn_match.band_bounds(gs, pq)
    x_d2, x_row = pnnband.nn_band_xla(gs.planar, pq.q_t, blo, nb)
    np.testing.assert_array_equal(np.asarray(k_d2), np.asarray(x_d2))
    np.testing.assert_array_equal(np.asarray(k_row), np.asarray(x_row))

    if n_nei and n_q:
        dist, nn_src, found = (
            np.asarray(a)
            for a in nn_match.nn_query(grid, jnp.asarray(q), jnp.asarray(qv), cell=0.1)
        )
        bd, bi, bm = _brute_nn(nei, nv, q, qv, 0.1)
        np.testing.assert_array_equal(found, bm)
        np.testing.assert_allclose(dist[bm], bd[bm], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(nn_src[bm], bi[bm])


def test_nnband_dense_cluster_exact_without_caps():
    """The v2 kernel needed a candidate-cap ladder for saturated cells; the
    band scan has no caps — a dense cluster must be exact on the first pass."""
    rng = np.random.default_rng(40)
    p = cap = 256
    nei, nv, q, qv = _nn_pair(rng, p, cap, 256, 256, 2.0, cluster=(80, 0.02))
    grid = nn_match.build_grid(jnp.asarray(nei), jnp.asarray(nv), cell=0.1)
    dist, nn_src, found = (
        np.asarray(a)
        for a in nn_match.nn_query(grid, jnp.asarray(q), jnp.asarray(qv), cell=0.1)
    )
    bd, bi, bm = _brute_nn(nei, nv, q, qv, 0.1)
    np.testing.assert_array_equal(found, bm)
    np.testing.assert_allclose(dist[bm], bd[bm], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(nn_src[bm], bi[bm])


@pytest.mark.parametrize("seed", range(6))
def test_nnband_random_sweep_kernel_bitwise(seed):
    """Seeded random sweep over shapes/densities: kernel == fallback bitwise."""
    rng = np.random.default_rng(100 + seed)
    p = 256 * int(rng.integers(1, 4))
    cap = 256 * int(rng.integers(1, 9))
    n_nei = int(rng.integers(0, cap + 1))
    n_q = int(rng.integers(0, p + 1))
    extent = float(rng.uniform(0.3, 30.0))
    nei, nv, q, qv = _nn_pair(rng, p, cap, n_nei, n_q, extent)
    g1 = nn_match.build_grid(jnp.asarray(nei), jnp.asarray(nv), cell=0.1)
    g2 = nn_match.build_grid(jnp.asarray(nei[::-1].copy()), jnp.asarray(nv), cell=0.1)
    gs = nn_match.stack_grids([g1, g2])
    pq = nn_match.prepare_queries(jnp.asarray(q), jnp.asarray(qv), cell=0.1)
    k_d2, k_row = nn_match.nn_query_band(gs, pq, interpret=True)
    blo, nb = nn_match.band_bounds(gs, pq)
    x_d2, x_row = pnnband.nn_band_xla(gs.planar, pq.q_t, blo, nb)
    np.testing.assert_array_equal(np.asarray(k_d2), np.asarray(x_d2))
    np.testing.assert_array_equal(np.asarray(k_row), np.asarray(x_row))


# --------------------------------------------------------------------------------------
# pallas_gather8: banded weighted 8-tap gather (SPVCNN point branch) vs XLA oracle
# --------------------------------------------------------------------------------------


@pytest.fixture
def pallas_gather8_on(monkeypatch):
    import lidal_tpu.ops.pallas_gather8 as pg8

    monkeypatch.setattr(
        pg8, "gather8_pallas", functools.partial(pg8.gather8_pallas, interpret=True)
    )
    import lidal_tpu.ops.conv as conv_mod

    monkeypatch.setattr(conv_mod, "USE_PALLAS", True)


def _gather8_oracle(feats, nbr, w8):
    fx = np.concatenate([feats, np.zeros((1, feats.shape[1]), np.float32)])
    return np.einsum("mk,mkc->mc", w8, fx[nbr])


@pytest.mark.parametrize(
    "seed,n,m,c,density",
    [
        (0, 256, 256, 32, 0.9),
        (1, 512, 256, 96, 0.5),  # sparse columns, sentinel tails
        (2, 256, 512, 128, 1.0),  # m > n (tri maps: many points per voxel)
        (3, 256, 256, 8, 0.0),  # all-sentinel: exact zeros
        (4, 1024, 512, 64, 0.7),
    ],
)
def test_gather8_matches_oracle(pallas_gather8_on, seed, n, m, c, density):
    from lidal_tpu.ops.pallas_gather8 import gather8_pallas

    rng = np.random.default_rng(seed)
    feats = _int_feats(rng, n, c)
    nbr = _sorted_nbr(rng, m, 8, n, density)
    w8 = rng.integers(0, 5, size=(m, 8)).astype(np.float32) / 4.0  # bf16-exact weights
    got = np.asarray(gather8_pallas(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w8)))
    want = _gather8_oracle(feats, nbr, w8)
    np.testing.assert_array_equal(got, want)  # integer data + quarter weights: exact


def test_gather8_float_weights_close(pallas_gather8_on):
    from lidal_tpu.ops.pallas_gather8 import gather8_pallas

    rng = np.random.default_rng(7)
    n, m, c = 512, 512, 96
    feats = rng.standard_normal((n, c)).astype(np.float32)
    nbr = _sorted_nbr(rng, m, 8, n, 0.8)
    w8 = rng.random((m, 8)).astype(np.float32)
    got = np.asarray(gather8_pallas(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w8)))
    # oracle on bf16-rounded features, f32 weights — the kernel's exact contract
    fb = np.asarray(jnp.asarray(feats).astype(jnp.bfloat16)).astype(np.float32)
    want = _gather8_oracle(fb, nbr, w8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather8_grad_matches_oracle(pallas_gather8_on):
    """The custom VJP's d/dfeats equals the XLA oracle's (weights are plan
    data: their cotangent is zero by contract)."""
    from lidal_tpu.ops.pallas_gather8 import gather8

    rng = np.random.default_rng(9)
    n, m, c = 256, 256, 32
    feats = jnp.asarray(_int_feats(rng, n, c))
    nbr = jnp.asarray(_sorted_nbr(rng, m, 8, n, 0.8))
    w8 = jnp.asarray((rng.integers(0, 5, size=(m, 8)) / 4.0).astype(np.float32))
    cot = jnp.asarray(_int_feats(rng, m, c))

    got = jax.grad(lambda f: (gather8(f, nbr, w8) * cot).sum())(feats)

    def oracle(f):
        fx = jnp.concatenate([f, jnp.zeros((1, c))])
        return (jnp.einsum("mk,mkc->mc", w8, fx[nbr]) * cot).sum()

    want = jax.grad(oracle)(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_p2v_child_sum_grad_matches_scatter_path(pallas_gather8_on):
    """The gather-only child-sum VJP (dx[f] = dy[parent[f]]) equals the
    XLA scatter-add formulation's gradient on a real synthetic plan."""
    from lidal_tpu.data.pipeline import prepare_eval_batch
    from lidal_tpu.ops.batching import map_frames
    from lidal_tpu.ops.devoxelize import point_to_voxel_avg, point_to_voxel_avg_batched

    rng = np.random.default_rng(11)
    B, P = 2, 1024
    caps = (1024, 512, 256, 256, 256)
    xyz = (rng.random((B, P, 3)) * 8.0).astype(np.float32)
    sig = rng.random((B, P)).astype(np.float32)
    valid = np.ones((B, P), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    eb = prepare_eval_batch(
        keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid),
        level_caps=caps, with_points=True,
    )
    c = 8
    pf = jnp.asarray(_int_feats(rng, B * caps[0], c).reshape(B, caps[0], c))
    pf = pf * np.asarray(eb.plan.levels[0].valid)[:, :, None]
    cot = jnp.asarray(_int_feats(rng, B * caps[2], c).reshape(B, caps[2], c))

    g_pallas = jax.grad(
        lambda x: (point_to_voxel_avg_batched(x, eb.plan.downs, eb.pplan.avg2, levels=2) * cot).sum()
    )(pf)
    g_xla = jax.grad(
        lambda x: (map_frames(point_to_voxel_avg, x, eb.pplan.avg2) * cot).sum()
    )(pf)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-4)


def test_spvcnn_point_ops_batched_match_per_frame(pallas_gather8_on):
    """devoxelize_trilinear_batched + point_to_voxel_avg_batched (Pallas path,
    interpret) vs the per-frame XLA formulations on a real synthetic plan."""
    from lidal_tpu.data.pipeline import prepare_eval_batch
    from lidal_tpu.ops.batching import map_frames
    from lidal_tpu.ops.devoxelize import (
        devoxelize_trilinear,
        devoxelize_trilinear_batched,
        point_to_voxel_avg,
        point_to_voxel_avg_batched,
    )

    rng = np.random.default_rng(3)
    B, P = 2, 2048
    caps = (2048, 1024, 512, 256, 256)
    xyz = (rng.random((B, P, 3)) * 10.0).astype(np.float32)
    sig = rng.random((B, P)).astype(np.float32)
    valid = np.ones((B, P), bool)
    valid[:, 1900:] = False
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    eb = prepare_eval_batch(
        keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid),
        level_caps=caps, with_points=True,
    )
    c = 16
    vf4 = jnp.asarray(rng.standard_normal((B, caps[4], c)).astype(np.float32))
    got = devoxelize_trilinear_batched(vf4, eb.pplan.tri4)
    want = map_frames(devoxelize_trilinear, vf4, eb.pplan.tri4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)

    pf = jnp.asarray(rng.standard_normal((B, caps[0], c)).astype(np.float32))
    pf = pf * np.asarray(eb.plan.levels[0].valid)[:, :, None]
    got = point_to_voxel_avg_batched(pf, eb.plan.downs, eb.pplan.avg4, levels=4)
    want = map_frames(point_to_voxel_avg, pf, eb.pplan.avg4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)


# --------------------------------------------------------------------------------------
# scatter8_pallas: transposed banded weighted gather-sum (gather8's backward)
# --------------------------------------------------------------------------------------


def _scatter8_oracle(dy, nbr, w8, n):
    out = np.zeros((n, dy.shape[1]), np.float64)
    m, k = nbr.shape
    for i in range(m):
        for j in range(k):
            t = nbr[i, j]
            if t < n:
                out[t] += w8[i, j] * dy[i]
    return out.astype(np.float32)


def test_transpose_band_bounds_cover_all_positions():
    """Property: every (position, tap) with a real target lies inside the
    covering band of that target's output tile."""
    from lidal_tpu.ops.pallas_gather8 import TILE_M, TILE_N, transpose_band_bounds

    rng = np.random.default_rng(3)
    n, m = 1024, 1536
    for density in (1.0, 0.6, 0.05, 0.0):
        nbr = _sorted_nbr(rng, m, 8, n, density)
        # shuffle a few rows to exercise the near-sorted (not sorted) contract
        if density > 0:
            sw = rng.choice(m - 1, size=8, replace=False)
            nbr[sw], nbr[sw + 1] = nbr[sw + 1].copy(), nbr[sw].copy()
        lo, nb = (np.asarray(a) for a in transpose_band_bounds(jnp.asarray(nbr), n))
        for j in range(8):
            for i in range(m):
                t = nbr[i, j]
                if t >= n:
                    continue
                tile = t // TILE_M
                blk = i // TILE_N
                assert lo[j, tile] <= blk < lo[j, tile] + nb[j, tile], (j, i, t)


@pytest.mark.parametrize(
    "seed,n,m,c,density",
    [
        (0, 256, 256, 32, 0.9),
        (1, 512, 256, 96, 0.5),
        (2, 256, 512, 128, 1.0),  # m > n (tri maps: many points per voxel)
        (3, 256, 256, 8, 0.0),  # all-sentinel: exact zeros
        (4, 1024, 512, 64, 0.7),
        (5, 256, 1024, 16, 0.3),
    ],
)
def test_scatter8_matches_oracle(seed, n, m, c, density):
    from lidal_tpu.ops.pallas_gather8 import scatter8_pallas

    rng = np.random.default_rng(seed)
    dy = _int_feats(rng, m, c)
    nbr = _sorted_nbr(rng, m, 8, n, density)
    w8 = rng.integers(0, 5, size=(m, 8)).astype(np.float32) / 4.0  # bf16-exact
    got = np.asarray(
        scatter8_pallas(jnp.asarray(dy), jnp.asarray(nbr), jnp.asarray(w8), n, interpret=True)
    )
    want = _scatter8_oracle(dy, nbr, w8, n)
    np.testing.assert_array_equal(got, want)  # integer data: exact


def test_scatter8_float_close():
    from lidal_tpu.ops.pallas_gather8 import scatter8_pallas

    rng = np.random.default_rng(7)
    n, m, c = 512, 512, 96
    dy = rng.standard_normal((m, c)).astype(np.float32)
    nbr = _sorted_nbr(rng, m, 8, n, 0.8)
    w8 = rng.random((m, 8)).astype(np.float32)
    got = np.asarray(
        scatter8_pallas(jnp.asarray(dy), jnp.asarray(nbr), jnp.asarray(w8), n, interpret=True)
    )
    # oracle on bf16-rounded dy AND weights — the kernel's staging contract
    dyb = np.asarray(jnp.asarray(dy).astype(jnp.bfloat16)).astype(np.float32)
    w8b = np.asarray(jnp.asarray(w8).astype(jnp.bfloat16)).astype(np.float32)
    want = _scatter8_oracle(dyb, nbr, w8b, n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gather8_grad_via_scatter_kernel_matches_xla(monkeypatch):
    """gather8's custom VJP with the Pallas transposed kernel enabled equals
    the XLA scatter-add backward (bf16-exact data: bitwise)."""
    import lidal_tpu.ops.pallas_gather8 as pg8

    rng = np.random.default_rng(9)
    n, m, c = 256, 512, 32
    feats = jnp.asarray(_int_feats(rng, n, c))
    nbr = jnp.asarray(_sorted_nbr(rng, m, 8, n, 0.8))
    w8 = jnp.asarray((rng.integers(0, 5, size=(m, 8)) / 4.0).astype(np.float32))
    cot = jnp.asarray(_int_feats(rng, m, c))

    def loss(f):
        return (pg8.gather8(f, nbr, w8) * cot).sum()

    monkeypatch.setattr(
        pg8, "gather8_pallas", functools.partial(pg8.gather8_pallas, interpret=True)
    )
    monkeypatch.setattr(
        pg8, "scatter8_pallas", functools.partial(pg8.scatter8_pallas, interpret=True)
    )
    monkeypatch.setattr(pg8, "USE_PALLAS_BWD", True)
    got = jax.grad(loss)(feats)
    monkeypatch.setattr(pg8, "USE_PALLAS_BWD", False)
    want = jax.grad(loss)(feats)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
