"""MinkUNet: shapes, masking invariants, train/eval modes, gradients."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from lidal_tpu.models.minkunet import MinkUNet
from lidal_tpu.ops.kernel_map import build_unet_plan
from lidal_tpu.ops.voxelize import unique_voxels

CAPS = (512, 512, 256, 128, 32)


def _batch(rng, b=2, n=400, extent=16):
    coords = rng.integers(0, extent, size=(b, n, 3)).astype(np.int32)
    valid = np.ones((b, n), bool)
    uv = jax.vmap(lambda c, v: unique_voxels(c, v, CAPS[0]))(
        jnp.asarray(coords), jnp.asarray(valid)
    )
    plan = build_unet_plan(uv.coords, uv.valid, CAPS)
    feats = rng.normal(size=(b, CAPS[0], 4)).astype(np.float32)
    feats = jnp.asarray(feats) * plan.levels[0].valid[..., None]
    return plan, feats


@pytest.mark.slow
def test_minkunet_forward_shapes_and_masking():
    rng = np.random.default_rng(0)
    plan, feats = _batch(rng)
    model = MinkUNet(num_classes=19)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=False)
    logits, feat96 = model.apply(variables, feats, plan, train=False)
    assert logits.shape == (2, CAPS[0], 19)
    assert feat96.shape == (2, CAPS[0], 96)
    inval = ~np.asarray(plan.levels[0].valid)
    assert (np.asarray(logits)[inval] == 0).all()
    assert np.isfinite(np.asarray(logits)).all()
    # params exist for every block; batch_stats collected
    assert "params" in variables and "batch_stats" in variables


@pytest.mark.slow
def test_minkunet_train_updates_batch_stats_and_grads_flow():
    rng = np.random.default_rng(1)
    plan, feats = _batch(rng)
    model = MinkUNet(num_classes=19)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=True)

    def loss_fn(params):
        (logits, _), updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats,
            plan,
            train=True,
            mutable=["batch_stats"],
        )
        valid = plan.levels[0].valid
        return (jnp.square(logits) * valid[..., None]).sum(), updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # most parameters receive nonzero gradient
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero / len(leaves) > 0.9
    # running stats moved away from init
    bs_new = jax.tree_util.tree_leaves(updates["batch_stats"])
    bs_old = jax.tree_util.tree_leaves(variables["batch_stats"])
    moved = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(bs_new, bs_old))
    assert moved


@pytest.mark.slow  # model-sized CPU compile (~3 min); redundant with the
# sharded bit-equality assertions in test_parallel_drivers for fast runs
def test_minkunet_eval_deterministic():
    rng = np.random.default_rng(2)
    plan, feats = _batch(rng, b=1, n=200)
    model = MinkUNet(num_classes=19)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=False)
    f = jax.jit(lambda v, x: model.apply(v, x, plan, train=False)[0])
    a = np.asarray(f(variables, feats))
    b = np.asarray(f(variables, feats))
    np.testing.assert_array_equal(a, b)
