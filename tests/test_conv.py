"""Sparse conv + kernel-map tests against by-definition numpy oracles,
plus custom-VJP gradient checks against plain autodiff implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from lidal_tpu.ops.conv import down_conv, subm_conv, up_conv, _gather_im2col
from lidal_tpu.ops.kernel_map import (
    K2,
    K3,
    OFFSETS2,
    OFFSETS3,
    build_down,
    build_subm_nbr,
    build_unet_plan_frame,
)
from lidal_tpu.ops.voxelize import append_zero_row, unique_voxels


def _voxel_set(rng, n, cap, extent=10):
    coords = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
    valid = np.ones(n, bool)
    uv = unique_voxels(jnp.asarray(coords), jnp.asarray(valid), cap)
    return uv


def test_offsets_mirror_property():
    for k in range(K3):
        assert tuple(-np.array(OFFSETS3[k])) == OFFSETS3[K3 - 1 - k]


def test_subm_nbr_matches_dict_oracle():
    rng = np.random.default_rng(0)
    cap = 256
    uv = _voxel_set(rng, 300, cap, extent=8)
    nu = int(uv.num_unique)
    coords = np.asarray(uv.coords)[:nu]
    nbr = np.asarray(build_subm_nbr(uv.coords, uv.valid))
    table = {tuple(c): i for i, c in enumerate(coords)}
    for i in range(nu):
        for k, off in enumerate(OFFSETS3):
            q = tuple(coords[i] + np.array(off))
            assert nbr[i, k] == table.get(q, cap), (i, k, off)
    assert (nbr[nu:] == cap).all()


def test_down_maps_match_oracle():
    rng = np.random.default_rng(1)
    cap_f, cap_c = 256, 128
    uv = _voxel_set(rng, 300, cap_f, extent=8)
    nu = int(uv.num_unique)
    coords = np.asarray(uv.coords)[:nu]
    uvc, down = build_down(uv.coords, uv.valid, cap_c)
    nc = int(uvc.num_unique)
    ccoords = np.asarray(uvc.coords)[:nc]
    np.testing.assert_array_equal(ccoords, np.unique(coords >> 1, axis=0))
    parent = np.asarray(down.parent)
    pdelta = np.asarray(down.pdelta)
    child = np.asarray(down.child)
    ctable = {tuple(c): i for i, c in enumerate(ccoords)}
    for f in range(nu):
        p = ctable[tuple(coords[f] >> 1)]
        assert parent[f] == p
        d = ((coords[f, 0] & 1) << 2) | ((coords[f, 1] & 1) << 1) | (coords[f, 2] & 1)
        assert pdelta[f] == d
        assert child[p, d] == f
    assert (parent[nu:] == cap_c).all()
    # every child slot either sentinel or round-trips
    for o in range(nc):
        for d in range(K2):
            f = child[o, d]
            if f != cap_f:
                assert parent[f] == o and pdelta[f] == d
            else:
                q = tuple(2 * ccoords[o] + np.array(OFFSETS2[d]))
                assert q not in {tuple(c) for c in coords}


def test_subm_conv_matches_oracle():
    rng = np.random.default_rng(2)
    cap, cin, cout = 128, 5, 7
    uv = _voxel_set(rng, 200, cap, extent=6)
    nu = int(uv.num_unique)
    nbr = build_subm_nbr(uv.coords, uv.valid)
    feats = rng.normal(size=(cap, cin)).astype(np.float32)
    feats[nu:] = 0
    w = rng.normal(size=(K3, cin, cout)).astype(np.float32)
    out = np.asarray(subm_conv(jnp.asarray(feats), jnp.asarray(w), nbr))

    nbr_np = np.asarray(nbr)
    fx = np.concatenate([feats, np.zeros((1, cin), np.float32)])
    expect = np.zeros((cap, cout), np.float32)
    for k in range(K3):
        expect += fx[nbr_np[:, k]] @ w[k]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
    assert (np.abs(out[nu:]) == 0).all()


def test_down_and_up_conv_match_oracle():
    rng = np.random.default_rng(3)
    cap_f, cap_c, cin, cout = 128, 64, 4, 6
    uv = _voxel_set(rng, 200, cap_f, extent=6)
    nu = int(uv.num_unique)
    uvc, down = build_down(uv.coords, uv.valid, cap_c)
    nc = int(uvc.num_unique)
    feats = rng.normal(size=(cap_f, cin)).astype(np.float32)
    feats[nu:] = 0
    w = rng.normal(size=(K2, cin, cout)).astype(np.float32)
    out = np.asarray(down_conv(jnp.asarray(feats), jnp.asarray(w), down.child, down.parent, down.pdelta))
    child = np.asarray(down.child)
    fx = np.concatenate([feats, np.zeros((1, cin), np.float32)])
    expect = np.zeros((cap_c, cout), np.float32)
    for d in range(K2):
        expect += fx[child[:, d]] @ w[d]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    cfeats = rng.normal(size=(cap_c, cout)).astype(np.float32)
    cfeats[nc:] = 0
    w2 = rng.normal(size=(K2, cout, cin)).astype(np.float32)
    up = np.asarray(up_conv(jnp.asarray(cfeats), jnp.asarray(w2), down.child, down.parent, down.pdelta))
    parent = np.asarray(down.parent)
    pdelta = np.asarray(down.pdelta)
    cx = np.concatenate([cfeats, np.zeros((1, cout), np.float32)])
    expect_up = np.einsum("fc,fco->fo", cx[parent], w2[pdelta])
    np.testing.assert_allclose(up, expect_up, rtol=1e-4, atol=1e-4)
    assert (np.abs(up[nu:]) == 0).all()


def _plain_subm(feats, w, nbr):
    k, cin, cout = w.shape
    return _gather_im2col(feats, nbr) @ w.reshape(k * cin, cout)


def _plain_down(feats, w, child):
    k, cin, cout = w.shape
    return _gather_im2col(feats, child) @ w.reshape(k * cin, cout)


def _plain_up(feats, w, parent, pdelta):
    fx = append_zero_row(feats)
    tmp = jnp.einsum("nc,dco->dno", fx, w)
    return tmp[pdelta, parent]


def test_custom_vjps_match_autodiff():
    rng = np.random.default_rng(4)
    cap_f, cap_c, cin, cout = 96, 48, 3, 5
    uv = _voxel_set(rng, 150, cap_f, extent=5)
    nbr = build_subm_nbr(uv.coords, uv.valid)
    uvc, down = build_down(uv.coords, uv.valid, cap_c)

    feats = jnp.asarray(rng.normal(size=(cap_f, cin)).astype(np.float32))
    feats = feats * uv.valid[:, None]
    w3 = jnp.asarray(rng.normal(size=(K3, cin, cout)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(cap_f, cout)).astype(np.float32))

    def loss_custom(f, w):
        return (subm_conv(f, w, nbr) * cot).sum()

    def loss_plain(f, w):
        return (_plain_subm(f, w, nbr) * cot).sum()

    gc = jax.grad(loss_custom, argnums=(0, 1))(feats, w3)
    gp = jax.grad(loss_plain, argnums=(0, 1))(feats, w3)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gp[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gp[1]), rtol=1e-4, atol=1e-4)

    w2 = jnp.asarray(rng.normal(size=(K2, cin, cout)).astype(np.float32))
    cot_c = jnp.asarray(rng.normal(size=(cap_c, cout)).astype(np.float32))

    gc = jax.grad(lambda f, w: (down_conv(f, w, down.child, down.parent, down.pdelta) * cot_c).sum(), (0, 1))(feats, w2)
    gp = jax.grad(lambda f, w: (_plain_down(f, w, down.child) * cot_c).sum(), (0, 1))(feats, w2)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gp[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gp[1]), rtol=1e-4, atol=1e-4)

    cfeats = jnp.asarray(rng.normal(size=(cap_c, cin)).astype(np.float32)) * uvc.valid[:, None]
    cot_f = jnp.asarray(rng.normal(size=(cap_f, cout)).astype(np.float32))
    gc = jax.grad(lambda f, w: (up_conv(f, w, down.child, down.parent, down.pdelta) * cot_f).sum(), (0, 1))(cfeats, w2)
    gp = jax.grad(lambda f, w: (_plain_up(f, w, down.parent, down.pdelta) * cot_f).sum(), (0, 1))(cfeats, w2)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gp[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gp[1]), rtol=1e-4, atol=1e-4)


def test_build_unet_plan_frame_shapes():
    rng = np.random.default_rng(5)
    caps = (256, 128, 64, 32, 16)
    uv = _voxel_set(rng, 300, caps[0], extent=16)
    plan = jax.jit(lambda c, v: build_unet_plan_frame(c, v, caps))(uv.coords, uv.valid)
    assert len(plan.levels) == 5 and len(plan.downs) == 4
    for l, cap in enumerate(caps):
        assert plan.levels[l].coords.shape == (cap, 3)
        assert plan.levels[l].nbr3.shape == (cap, K3)
    # voxel counts shrink monotonically
    counts = [int(l.num_valid) for l in plan.levels]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] >= 1
