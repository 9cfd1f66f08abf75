"""SPVCNN + point-branch op tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from lidal_tpu.models.spvcnn import SPVCNN
from lidal_tpu.ops.devoxelize import (
    build_point_plan,
    build_point_plan_frame,
    devoxelize_trilinear,
    point_to_voxel_avg,
)
from lidal_tpu.ops.kernel_map import OFFSETS2, build_unet_plan, build_unet_plan_frame
from lidal_tpu.ops.voxelize import unique_voxels

CAPS = (512, 512, 256, 128, 32)


def _frame(rng, n=400, extent=16):
    coords = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
    uv = unique_voxels(jnp.asarray(coords), jnp.ones(n, bool), CAPS[0])
    plan = build_unet_plan_frame(uv.coords, uv.valid, CAPS)
    return plan


def test_point_plan_ancestors_and_counts():
    rng = np.random.default_rng(0)
    plan = _frame(rng)
    pp = build_point_plan_frame(plan.levels, plan.downs)
    coords0 = np.asarray(plan.levels[0].coords)
    valid0 = np.asarray(plan.levels[0].valid)
    nv = valid0.sum()
    for l, avg in ((2, pp.avg2), (4, pp.avg4)):
        lc = np.asarray(plan.levels[l].coords)
        lvd = np.asarray(plan.levels[l].valid)
        table = {tuple(c): i for i, c in enumerate(lc[lvd])}
        anc = np.asarray(avg.anc)
        for i in np.where(valid0)[0][:50]:
            assert anc[i] == table[tuple(coords0[i] >> l)]
        assert (anc[~valid0] == CAPS[l]).all()
        assert int(np.asarray(avg.counts).sum()) == nv


def test_trilinear_weights_sum_and_oracle():
    rng = np.random.default_rng(1)
    plan = _frame(rng)
    pp = build_point_plan_frame(plan.levels, plan.downs)
    coords0 = np.asarray(plan.levels[0].coords)
    valid0 = np.asarray(plan.levels[0].valid)
    lc = np.asarray(plan.levels[2].coords)
    lvd = np.asarray(plan.levels[2].valid)
    table = {tuple(c): i for i, c in enumerate(lc[lvd])}
    idx8 = np.asarray(pp.tri2.idx8)
    w8 = np.asarray(pp.tri2.w8)
    s = 4
    for i in np.where(valid0)[0][:50]:
        c = coords0[i]
        u = (c & (s - 1)) / s
        base = c >> 2
        for d, off in enumerate(OFFSETS2):
            corner = tuple(base + np.array(off))
            expect_w = np.prod(np.where(np.array(off) > 0, u, 1 - u))
            if corner in table:
                assert idx8[i, d] == table[corner]
                np.testing.assert_allclose(w8[i, d], expect_w, rtol=1e-5, atol=1e-6)
            else:
                assert idx8[i, d] == CAPS[2]
                assert w8[i, d] == 0
    # invalid points: all weights zero
    assert (w8[~valid0] == 0).all()
    # the base corner (delta 0) always exists for valid points -> weight sums in (0, 1]
    sums = w8[valid0].sum(1)
    assert (sums > 0).all() and (sums <= 1 + 1e-5).all()


def test_devox_and_p2v_roundtrip_constant_field():
    rng = np.random.default_rng(2)
    plan = _frame(rng)
    pp = build_point_plan_frame(plan.levels, plan.downs)
    # constant feature field at level 2 -> devoxelized points get w_sum * const
    c = 3.0
    vf = jnp.where(plan.levels[2].valid[:, None], c, 0.0) * jnp.ones((CAPS[2], 4))
    out = np.asarray(devoxelize_trilinear(vf, pp.tri2))
    wsum = np.asarray(pp.tri2.w8).sum(1)
    np.testing.assert_allclose(out, np.broadcast_to(c * wsum[:, None], out.shape), rtol=1e-5, atol=1e-6)
    # p2v average of a constant point field is that constant on non-empty voxels
    valid0 = plan.levels[0].valid
    pf = jnp.where(valid0[:, None], 2.5, 0.0) * jnp.ones((CAPS[0], 4))
    vavg = np.asarray(point_to_voxel_avg(pf, pp.avg2))
    nonempty = np.asarray(pp.avg2.counts) > 0
    np.testing.assert_allclose(vavg[nonempty], 2.5, rtol=1e-6)
    assert (vavg[~nonempty] == 0).all()


@pytest.mark.slow  # full SPVCNN compile (multi-minute cold on CPU)
def test_spvcnn_forward_and_grads():
    rng = np.random.default_rng(3)
    b, n = 2, 300
    coords = rng.integers(0, 16, size=(b, n, 3)).astype(np.int32)
    uv = jax.vmap(lambda c, v: unique_voxels(c, v, CAPS[0]))(
        jnp.asarray(coords), jnp.ones((b, n), bool)
    )
    plan = build_unet_plan(uv.coords, uv.valid, CAPS)
    pplan = build_point_plan(plan)
    feats = jnp.asarray(rng.normal(size=(b, CAPS[0], 4)).astype(np.float32))
    feats = feats * plan.levels[0].valid[..., None]

    model = SPVCNN(num_classes=19)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, pplan, train=False)
    logits, z3 = model.apply(variables, feats, plan, pplan, train=False)
    assert logits.shape == (b, CAPS[0], 19)
    assert z3.shape == (b, CAPS[0], 96)
    inval = ~np.asarray(plan.levels[0].valid)
    assert (np.asarray(logits)[inval] == 0).all()
    assert np.isfinite(np.asarray(logits)).all()

    def loss_fn(params):
        (lg, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats,
            plan,
            pplan,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.square(lg).sum()

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero / len(leaves) > 0.9
