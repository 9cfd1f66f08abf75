"""Pipeline, IoU, checkpoint, and multi-device (8-CPU mesh) tests."""

import dataclasses
import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from lidal_tpu.data.pipeline import IGNORE_LABEL, prepare_eval_batch, prepare_train_batch
from lidal_tpu.utils.iou import confusion_matrix, confusion_matrix_np, evaluate, per_class_iou

CAPS = (512, 512, 256, 128, 32)


def _points(rng, b=2, p=400):
    xyz = (rng.random((b, p, 3)) * 10 - 5).astype(np.float32)
    sig = rng.random((b, p)).astype(np.float32)
    valid = rng.random((b, p)) > 0.1
    labels = rng.integers(0, 19, (b, p)).astype(np.int32)
    labels[~valid] = IGNORE_LABEL
    return xyz, sig, valid, labels


def test_prepare_train_batch_label_first_point_semantics():
    rng = np.random.default_rng(0)
    xyz, sig, valid, labels = _points(rng)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    tb = prepare_train_batch(
        keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid), jnp.asarray(labels),
        level_caps=CAPS, augment=False,
    )
    lv = np.asarray(tb.labels)
    vmask = np.asarray(tb.plan.levels[0].valid)
    # labels on invalid rows are IGNORE; valid rows carry a real label or IGNORE
    assert (lv[~vmask] == IGNORE_LABEL).all()
    assert ((lv[vmask] < 19) | (lv[vmask] == IGNORE_LABEL)).all()
    # voxel features: 4th column is the signal of the first contributing point
    feats = np.asarray(tb.feats)
    assert feats.shape[-1] == 4
    assert np.isfinite(feats).all()


def test_prepare_eval_batch_inverse_roundtrip():
    rng = np.random.default_rng(1)
    xyz, sig, valid, _ = _points(rng, b=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    eb = prepare_eval_batch(
        keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid),
        level_caps=CAPS, augment=False,
    )
    inv = np.asarray(eb.inverse[0])
    pv = np.asarray(eb.point_valid[0])
    nvox = int(np.asarray(eb.plan.levels[0].valid.sum()))
    assert (inv[pv] < nvox).all()
    assert (inv[~np.asarray(valid[0])] == CAPS[0]).all()
    # every valid voxel is referenced by at least one point
    assert len(np.unique(inv[pv])) == nvox


def test_confusion_matrix_device_matches_numpy():
    rng = np.random.default_rng(2)
    pred = rng.integers(0, 19, 5000).astype(np.int32)
    gt = rng.integers(0, 19, 5000).astype(np.int32)
    gt[rng.random(5000) < 0.2] = 255
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), 19))
    expect = confusion_matrix_np(pred, gt, 19)
    np.testing.assert_array_equal(got, expect)
    # perfect predictions give IoU 1 on present classes
    conf = confusion_matrix_np(gt.clip(0, 18), gt, 19)
    iou, _, _ = per_class_iou(conf)
    assert np.nanmin(iou) > 0.99
    miou = evaluate(conf)
    assert miou > 0.99


def test_cross_entropy_matches_torch_semantics():
    from lidal_tpu.runtime.train import cross_entropy_ignore

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 50, 19)).astype(np.float32)
    labels = rng.integers(0, 19, (2, 50)).astype(np.int32)
    labels[0, :10] = IGNORE_LABEL
    got = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    # numpy oracle
    m = labels != IGNORE_LABEL
    lp = logits - logits.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    nll = -np.take_along_axis(lp, np.where(m, labels, 0)[..., None], axis=-1)[..., 0]
    expect = nll[m].mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_checkpoint_roundtrip_and_warm_start(tmp_path):
    from tests.synth import mini_cfg
    from lidal_tpu.runtime import checkpoint as ckpt
    from lidal_tpu.runtime.paths import Paths
    from lidal_tpu.runtime.train import TrainState, make_optimizer

    tx = make_optimizer()
    params = {"w": jnp.arange(4.0)}
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"bn": jnp.ones(3)},
        opt_state=tx.init(params),
    )
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, state, ep_id=3)
    template = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"w": jnp.zeros(4)},
        batch_stats={"bn": jnp.zeros(3)},
        opt_state=tx.init({"w": jnp.zeros(4)}),
    )
    restored, ep = ckpt.restore_checkpoint(d, template)
    assert ep == 3 and int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))
    warm = ckpt.restore_weights(d, template)
    assert int(warm.step) == 0  # fresh optimizer/step
    np.testing.assert_array_equal(np.asarray(warm.params["w"]), np.arange(4.0))

    # resume_or_warm_start: r1 falls back to the 0r directory
    cfg = mini_cfg(str(tmp_path), r_id=1, metric_name="LiDAL", label_unit="sv")
    paths = Paths(cfg)
    os.makedirs(os.path.dirname(paths.warm_start_ckpt_dir()), exist_ok=True)
    ckpt.save_checkpoint(paths.warm_start_ckpt_dir(), state, ep_id=1)
    got, ep0 = ckpt.resume_or_warm_start(paths, template)
    assert ep0 == 0 and int(got.step) == 0
    np.testing.assert_array_equal(np.asarray(got.params["w"]), np.arange(4.0))


@pytest.mark.slow
def test_multichip_dryrun_on_cpu_mesh():
    import __graft_entry__ as g

    assert len(jax.devices()) == 8
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    logits = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(logits)).all()
