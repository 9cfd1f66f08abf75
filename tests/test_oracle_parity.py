"""Network parity vs an independent dense numpy oracle of the REFERENCE
semantics (tests/ts_oracle.py).

A random TORCH-layout state dict (reference module names, torchsparse-1.4 tap
enumeration, [out, in] linears) is fed (a) through ``runtime/import_torch``
into the flax models and (b) directly into the oracle's re-implementation of
the reference forward (``network/minkunet.py:97-122``,
``network/spvcnn.py:112-155``).  Logits must match on a realistic voxelized
frame — this fails if tap order, gather direction, stride semantics, BN
layout, residual/skip wiring, the point branch, or the state-dict name map
ever diverge from reference semantics (the round-trip tests alone cannot catch
an error shared by export and import)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidal_tpu.data.pipeline import prepare_train_batch
from lidal_tpu.models import MinkUNet
from lidal_tpu.runtime.import_torch import (
    convert_minkunet_state_dict,
    convert_spvcnn_state_dict,
)
from tests import ts_oracle

pytestmark = pytest.mark.slow  # model-sized CPU compiles

# Surface-like frames don't shrink 8x per stride; equal caps keep every level
# lossless (the parity comparison needs zero overflow).
CAPS = (2048, 2048, 2048, 2048, 2048)
B = 2


def _batch(with_points: bool = False):
    rng = np.random.default_rng(0)
    p = 2048
    oxyz = np.zeros((B, p, 3), np.float32)
    osig = np.zeros((B, p), np.float32)
    ovalid = np.zeros((B, p), bool)
    olab = np.full((B, p), 255, np.int32)
    for bi in range(B):
        n = 1200 + 100 * bi
        r = rng.uniform(2, 40, n)
        th = rng.uniform(0, 2 * np.pi, n)
        oxyz[bi, :n] = np.stack(
            [r * np.cos(th), r * np.sin(th), 0.1 * rng.standard_normal(n)], 1
        )
        osig[bi, :n] = rng.random(n)
        ovalid[bi, :n] = True
        olab[bi, :n] = rng.integers(0, 19, n)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    tb = prepare_train_batch(
        keys, jnp.asarray(oxyz), jnp.asarray(osig), jnp.asarray(ovalid),
        jnp.asarray(olab), level_caps=CAPS, with_points=with_points,
    )
    assert int(np.asarray(tb.overflow).sum()) == 0  # parity needs lossless caps
    return tb


def _oracle_inputs(tb):
    """Level-0 voxel table -> oracle (coords [N,4] with batch col, feats [N,4],
    plus (frame, row) index pairs for aligning outputs)."""
    coords = np.asarray(tb.plan.levels[0].coords)
    valid = np.asarray(tb.plan.levels[0].valid)
    feats = np.asarray(tb.feats)
    rows, cs, fs = [], [], []
    for bi in range(coords.shape[0]):
        idx = np.where(valid[bi])[0]
        rows.extend((bi, int(i)) for i in idx)
        cs.append(np.concatenate(
            [coords[bi, idx], np.full((len(idx), 1), bi, coords.dtype)], axis=1))
        fs.append(feats[bi, idx])
    return np.concatenate(cs), np.concatenate(fs), rows


def test_minkunet_matches_reference_oracle():
    tb = _batch()
    sd = ts_oracle.random_minkunet_state_dict(np.random.default_rng(1))
    variables = convert_minkunet_state_dict(sd)

    model = MinkUNet(num_classes=19)
    logits_f, feat_f = jax.jit(model.apply, static_argnames=("train",))(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tb.feats, tb.plan, train=False,
    )
    logits_f = np.asarray(logits_f)
    feat_f = np.asarray(feat_f)

    coords0, feats0, rows = _oracle_inputs(tb)
    logits_o, feat_o = ts_oracle.Oracle(sd).minkunet_forward(coords0, feats0)

    got_l = np.stack([logits_f[bi, ri] for bi, ri in rows])
    got_y = np.stack([feat_f[bi, ri] for bi, ri in rows])
    np.testing.assert_allclose(got_y, feat_o, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_l, logits_o, rtol=2e-3, atol=2e-3)
    # class decisions agree except at numerically-tied argmax rows
    agree = (got_l.argmax(1) == logits_o.argmax(1)).mean()
    assert agree > 0.999, agree


def test_spvcnn_matches_reference_oracle():
    from lidal_tpu.models.spvcnn import SPVCNN

    tb = _batch(with_points=True)
    sd = ts_oracle.random_spvcnn_state_dict(np.random.default_rng(2))
    variables = convert_spvcnn_state_dict(sd)

    model = SPVCNN(num_classes=19)
    logits_f, feat_f = jax.jit(model.apply, static_argnames=("train",))(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tb.feats, tb.plan, tb.pplan, train=False,
    )
    logits_f = np.asarray(logits_f)
    feat_f = np.asarray(feat_f)

    coords0, feats0, rows = _oracle_inputs(tb)
    logits_o, feat_o = ts_oracle.Oracle(sd).spvcnn_forward(coords0, feats0)

    got_l = np.stack([logits_f[bi, ri] for bi, ri in rows])
    got_y = np.stack([feat_f[bi, ri] for bi, ri in rows])
    np.testing.assert_allclose(got_y, feat_o, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_l, logits_o, rtol=2e-3, atol=2e-3)
    agree = (got_l.argmax(1) == logits_o.argmax(1)).mean()
    assert agree > 0.999, agree
