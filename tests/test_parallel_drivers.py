"""Data-parallel drivers vs single-device: exact-math equivalence on the
8-device CPU mesh (VERDICT round-1 items 2 and 8)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-sized CPU compiles (multi-minute cold)

from lidal_tpu.config import RunConfig, SK_CONFIG
from lidal_tpu.data.loader import FrameBatchLoader
from lidal_tpu.runtime.evaluate import make_eval_conf_fn
from lidal_tpu.runtime.train import init_state, make_eval_step
from lidal_tpu.runtime.train_loop import make_train_fn

CAPS = (2048, 1024, 512, 256, 128)
P = 2048


def _cfg(tmp):
    data = dataclasses.replace(SK_CONFIG, point_cap=P, level_caps=CAPS, batch_size=1)
    return RunConfig(
        metric_name="full",
        r_id=1,
        processing_root=os.path.join(str(tmp), "proc"),
        checkpoint_root=os.path.join(str(tmp), "ckpt"),
        data_override=data,
    )


def _points(b, seed=0):
    rng = np.random.default_rng(seed)
    n = int(P * 0.9)
    xyz = np.zeros((b, P, 3), np.float32)
    sig = np.zeros((b, P), np.float32)
    valid = np.zeros((b, P), bool)
    labels = np.full((b, P), 255, np.int32)
    for i in range(b):
        r = rng.uniform(2, 40, n)
        th = rng.uniform(0, 2 * np.pi, n)
        xyz[i, :n] = np.stack([r * np.cos(th), r * np.sin(th), 0.1 * rng.standard_normal(n)], 1)
        sig[i, :n] = rng.random(n)
        valid[i, :n] = True
        labels[i, :n] = rng.integers(0, 19, n)
    return (jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid), jnp.asarray(labels))


@pytest.mark.parametrize("model_name", ["Mink", "SPVCNN"])
def test_sharded_train_step_matches_single_device(tmp_path, model_name):
    b = 8
    cfg = dataclasses.replace(_cfg(tmp_path), model_name=model_name)
    xyz, sig, valid, labels = _points(b)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    rng = jax.random.PRNGKey(2)

    model1, tx1, prep1, fn1 = make_train_fn(cfg, n_devices=1)
    tb = prep1(keys, xyz, sig, valid, labels)
    state1 = init_state(model1, jax.random.PRNGKey(1), tb, tx1)
    s1, loss1, ovf1 = fn1(state1, keys, xyz, sig, valid, labels, rng)

    model8, tx8, prep8, fn8 = make_train_fn(cfg, n_devices=8)
    state8 = init_state(model8, jax.random.PRNGKey(1), tb, tx8)
    s8, loss8, ovf8 = fn8(state8, keys, xyz, sig, valid, labels, rng)

    # identical init (bn_axis does not change the param tree)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # dense synthetic frames saturate the tiny deep-level caps — the
    # counters must agree across sharding (and prove the plumbing works)
    assert int(ovf1) == int(ovf8) > 0
    # Gradient parity, scale-sensitive: Adam's moments are direct images of the
    # (psum'd vs single-device) gradients — a missing/extra reduction would be
    # off by the shard count.  (Post-Adam params are a weak check: near-zero
    # grads normalize to +-lr on reduction-order noise alone.)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s1.opt_state), jax.tree_util.tree_leaves(s8.opt_state)
    ):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        # per-leaf scale-aware atol: grad components formed by cancellation can
        # be tiny with large relative noise; a missing psum would shift the
        # whole leaf by the shard count (800% of scale) and still trip this.
        # 5e-2: SPVCNN's deeper point-branch BN chain leaves ~0.01% of elements
        # at ~3e-2 of leaf scale from f32 reduction-order noise alone.
        scale = max(np.abs(a).max(), np.abs(b_).max(), 1e-12)
        if scale < 1e-8:
            # noise-only leaf: SPVCNN's PointTransform Linear biases feed
            # straight into BatchNorm, whose mean subtraction makes their true
            # gradient EXACTLY zero — both layouts compute ~1e-10 f32
            # cancellation noise with no common structure.  (A real gradient
            # leaf cannot be this small; a missing psum scales, not shrinks.)
            continue
        np.testing.assert_allclose(a, b_, rtol=1e-2, atol=5e-2 * scale)
    # params drift bounded by the learning rate on sign flips of ~0 grads
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-3)
    # sync-BN: batch stats must match the global single-device stats
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s1.batch_stats), jax.tree_util.tree_leaves(s8.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-6)


def test_sharded_eval_confusion_matches_single_device(tmp_path):
    b = 8
    cfg = _cfg(tmp_path)
    xyz, sig, valid, labels = _points(b, seed=3)
    keys = jax.random.split(jax.random.PRNGKey(5), b)

    model1, tx1, prep1, _ = make_train_fn(cfg, n_devices=1)
    tb = prep1(keys, xyz, sig, valid, labels)
    state = init_state(model1, jax.random.PRNGKey(1), tb, tx1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(model1, with_points=False)

    conf1, ovf1 = make_eval_conf_fn(cfg, eval_step, n_devices=1)(
        variables, keys, xyz, sig, valid, labels
    )
    conf8, ovf8 = make_eval_conf_fn(cfg, eval_step, n_devices=8)(
        variables, keys, xyz, sig, valid, labels
    )
    np.testing.assert_array_equal(np.asarray(conf1), np.asarray(conf8))
    assert int(ovf1) == int(ovf8)


def test_loader_pads_final_batch_for_sharding():
    files = list(range(5))

    def read_fn(i):
        rng = np.random.default_rng(i)
        n = 100
        return (
            rng.random((n, 3)).astype(np.float32),
            rng.random(n).astype(np.float32),
            np.zeros(n, np.int32),
        )

    loader = FrameBatchLoader(files, read_fn, point_cap=128, batch_size=8, num_workers=1)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["xyz"].shape[0] == 8  # padded to the full (shardable) size
    assert batches[0]["n_frames"] == 5
    assert not batches[0]["valid"][5:].any()


def test_overflow_counter_detects_capacity_saturation(tmp_path):
    """Dense random coords saturate tiny caps; the counter must go nonzero."""
    import dataclasses as dc

    from lidal_tpu.data.pipeline import prepare_train_batch

    data = dc.replace(SK_CONFIG, point_cap=P, level_caps=(256, 128, 64, 64, 64), batch_size=1)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-50, 50, (1, P, 3)).astype(np.float32))
    sig = jnp.zeros((1, P))
    valid = jnp.ones((1, P), bool)
    labels = jnp.zeros((1, P), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    tb = prepare_train_batch(keys, xyz, sig, valid, labels, level_caps=data.level_caps)
    assert int(np.asarray(tb.overflow).sum()) > 0


def test_multi_step_train_scan_matches_per_step(tmp_path):
    """steps_per_call > 1 (on-device lax.scan over stacked batches) must follow
    the same trajectory as per-step dispatch, including the ragged tail."""
    import dataclasses as dc

    from lidal_tpu.runtime.train_loop import run_train

    def make(tag):
        cfg = _cfg(os.path.join(str(tmp_path), tag))
        xyz, sig, valid, labels = _points(4, seed=1)

        def read_fn(i):
            n = int(np.asarray(valid[i]).sum())
            return (
                np.asarray(xyz[i][:n]),
                np.asarray(sig[i][:n]),
                np.asarray(labels[i][:n]),
            )

        loader = FrameBatchLoader(
            list(range(4)), read_fn, point_cap=P, batch_size=2, num_workers=1
        )
        return cfg, loader

    cfg_a, loader_a = make("a")
    s_a = run_train(cfg_a, loader=loader_a, max_iter=5, n_devices=1, steps_per_call=1)
    cfg_b, loader_b = make("b")
    s_b = run_train(cfg_b, loader=loader_b, max_iter=5, n_devices=1, steps_per_call=3)

    assert int(s_a.step) == int(s_b.step) == 5
    for a, b in zip(
        jax.tree_util.tree_leaves(s_a.params), jax.tree_util.tree_leaves(s_b.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prob_inference_device_count_invariant(tmp_path):
    """run_prob_inference shards the frame list over local devices (reference
    sk_dataloader.py:196-198); augmentation keys derive from the global frame
    index, so outputs must be identical for any device count."""
    from lidal_tpu.runtime.prob_inference import run_prob_inference
    from lidal_tpu.runtime.train_loop import build_model

    cfg = _cfg(tmp_path)
    model = build_model(cfg)
    xyz, sig, valid, labels = _points(6, seed=3)
    xyz_n, sig_n = np.asarray(xyz), np.asarray(sig)

    from lidal_tpu.data.pipeline import prepare_train_batch

    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    tb = prepare_train_batch(keys, xyz[:1], sig[:1], valid[:1], labels[:1], level_caps=CAPS)
    from lidal_tpu.runtime.train import make_optimizer

    state = init_state(model, jax.random.PRNGKey(1), tb, make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(model, cfg.is_spvcnn)

    files = list(range(6))

    def read_fn(i):
        n = int(np.asarray(valid[i]).sum())
        return xyz_n[i, :n], sig_n[i, :n], None

    def frame_id_fn(i):
        return "00", f"{i:06d}"

    kw = dict(files=files, read_fn=read_fn, frame_id_fn=frame_id_fn, save=False)
    r1 = run_prob_inference(cfg, eval_step, variables, devices=jax.devices()[:1], **kw)
    r4 = run_prob_inference(cfg, eval_step, variables, devices=jax.devices()[:4], **kw)
    # unblocked dispatch (frames_per_dispatch=1): the lax.map frame blocking
    # (default 4; 6 frames -> a padded tail block) must be bitwise neutral
    rf1 = run_prob_inference(
        dataclasses.replace(cfg, frames_per_dispatch=1),
        eval_step, variables, devices=jax.devices()[:1], **kw,
    )
    assert set(r1) == set(r4) == set(rf1) and len(r1) == 6
    for k in r1:
        for r in (r4, rf1):
            np.testing.assert_array_equal(r1[k][0], r[k][0])
            np.testing.assert_array_equal(r1[k][1], r[k][1])
            np.testing.assert_array_equal(r1[k][2], r[k][2])


def test_multiview_chunk_invariant(tmp_path):
    """Chunked multi-view inference (cfg.view_chunk < inf_reps, lax.map over
    view chunks — the HBM-fitting production shape) must equal the monolithic
    all-views graph: the view MEAN is invariant to any chunking of the sum."""
    from lidal_tpu.runtime.prob_inference import make_multiview_fn
    from lidal_tpu.runtime.train import make_optimizer
    from lidal_tpu.runtime.train_loop import build_model

    from lidal_tpu.data.pipeline import prepare_train_batch

    cfg = _cfg(tmp_path)
    model = build_model(cfg)
    xyz, sig, valid, labels = _points(1, seed=5)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    tb = prepare_train_batch(keys, xyz, sig, valid, labels, level_caps=CAPS)
    state = init_state(model, jax.random.PRNGKey(1), tb, make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(model, cfg.is_spvcnn)

    reps = 4
    vkeys = jax.random.split(jax.random.PRNGKey(3), reps)
    args = (variables, vkeys, xyz[0], sig[0], valid[0])
    outs = {}
    for vc in (reps, 2, 3):  # monolithic; exact divisor; non-divisor (-> 2)
        cfg_c = dataclasses.replace(cfg, inf_reps=reps, view_chunk=vc)
        prob, pred, feat = make_multiview_fn(cfg_c, eval_step, with_feat=True)(*args)
        outs[vc] = (np.asarray(prob), np.asarray(pred), np.asarray(feat))
    for vc in (2, 3):
        np.testing.assert_allclose(outs[vc][0], outs[reps][0], atol=1e-6)
        np.testing.assert_allclose(outs[vc][2], outs[reps][2], atol=1e-5)
        assert (outs[vc][1] == outs[reps][1]).mean() > 0.999  # fp-tied argmax rows
    # with_feat=False (LiDAL rounds >= 1): same prob/pred, feature path dropped
    cfg_c = dataclasses.replace(cfg, inf_reps=reps, view_chunk=2)
    prob_nf, pred_nf, feat_nf = make_multiview_fn(cfg_c, eval_step, with_feat=False)(*args)
    assert feat_nf is None
    np.testing.assert_allclose(np.asarray(prob_nf), outs[2][0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pred_nf), outs[2][1])


def test_fused_round_matches_staged(tmp_path):
    """The FUSED single-pass round (inference feeds the scoring ring on
    device, ``active/lidal_runner.run_fused_lidal_round``) must be bitwise
    identical to the staged reference pipeline (``run_prob_inference`` writing
    prob npys, then ``run_lidal_round`` reading them) — selections, flags, AND
    the prob/pred npy artifacts — for any device count."""
    from lidal_tpu.active.lidal_runner import run_fused_lidal_round, run_lidal_round
    from lidal_tpu.data.selection import save_sv_info
    from lidal_tpu.runtime.paths import Paths, ensure_dir
    from lidal_tpu.runtime.prob_inference import run_prob_inference
    from lidal_tpu.runtime.train import make_optimizer

    from lidal_tpu.data.pipeline import prepare_train_batch
    from lidal_tpu.runtime.train_loop import build_model

    n_frames, n_sv, seq = 6, 4, "00"
    rng = np.random.default_rng(11)
    names = [f"{i:06d}" for i in range(n_frames)]
    frames = {}
    for i in range(n_frames):
        n = int(P * 0.8)
        r = rng.uniform(2, 30, n)
        th = rng.uniform(0, 2 * np.pi, n)
        xyz = np.stack(
            [r * np.cos(th), r * np.sin(th), 0.1 * rng.standard_normal(n)], 1
        ).astype(np.float32)
        frames[names[i]] = (xyz, rng.random(n).astype(np.float32))

    def build_tree(root):
        """r_id=2 scoring tree: r1 flags + grids + sv info (no prob npys)."""
        cfg2 = dataclasses.replace(
            _cfg(root), metric_name="LiDAL", label_unit="sv", r_id=2,
            inf_reps=2, view_chunk=2,
        )
        paths = Paths(cfg2)
        p1 = Paths(dataclasses.replace(cfg2, r_id=1))
        grid_dir = ensure_dir(paths.grid_dir(seq))
        svi_dir = ensure_dir(paths.supervoxel_dir(seq, "KMeans"))
        svf_dir = ensure_dir(p1.sv_flag_dir(seq))
        gid = 0
        for i, name in enumerate(names):
            xyz = frames[name][0]
            # "registered" coords: raw + per-frame drift (any consistent map works)
            np.savez_compressed(
                os.path.join(grid_dir, f"{name}.npz"),
                xyz=xyz + np.array([0.3 * i, 0, 0], np.float32),
            )
            point2sv = (np.arange(len(xyz), dtype=np.int32) * n_sv) // len(xyz)
            save_sv_info(
                os.path.join(svi_dir, f"{name}.npz"),
                point2sv,
                np.arange(gid, gid + n_sv, dtype=np.int64),
            )
            gid += n_sv
            np.save(
                os.path.join(svf_dir, f"{name}.npy"),
                np.full(n_sv, 1 if i == 0 else 0, np.int32),
            )
        return cfg2

    cfg0 = build_tree(tmp_path / "staged")
    model = build_model(cfg0)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    xyz0, sig0, valid0, labels0 = _points(1, seed=1)
    tb = prepare_train_batch(keys, xyz0, sig0, valid0, labels0, level_caps=CAPS)
    state = init_state(model, jax.random.PRNGKey(1), tb, make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(model, with_points=False)
    budget_pts = n_frames * P * 40

    def read_raw(s, name):
        return frames[name]

    frame_index = {(seq, n): i for i, n in enumerate(names)}

    # ---- staged: prob_inference (fd=4 blocks) then run_lidal_round ----------
    inf_cfg = dataclasses.replace(cfg0, r_id=1)
    run_prob_inference(
        inf_cfg, eval_step, variables, names,
        read_fn=lambda name: frames[name] + (None,),
        frame_id_fn=lambda name: (seq, name),
        save=True, devices=jax.devices()[:1],
    )
    res_staged = run_lidal_round(
        cfg0, train_split=(seq,), train_point_num=budget_pts, devices=jax.devices()[:1]
    )

    # ---- fused single-pass round, 1 device then 2 ---------------------------
    for nd in (1, 2):
        cfgf = build_tree(tmp_path / f"fused{nd}")
        res_fused = run_fused_lidal_round(
            cfgf, eval_step, variables, read_raw, train_split=(seq,),
            train_point_num=budget_pts, devices=jax.devices()[:nd],
            frame_index=frame_index,
        )
        np.testing.assert_array_equal(res_staged.sv_flags, res_fused.sv_flags)
        np.testing.assert_array_equal(res_staged.al_added, res_fused.al_added)
        np.testing.assert_array_equal(res_staged.sl_added, res_fused.sl_added)
        # prob/pred npy artifacts must match the staged dumps bitwise
        p1s = Paths(dataclasses.replace(cfg0, r_id=1))
        p1f = Paths(dataclasses.replace(cfgf, r_id=1))
        for name in names:
            for d_s, d_f in (
                (p1s.prob_dir(seq), p1f.prob_dir(seq)),
                (p1s.pred_dir(seq), p1f.pred_dir(seq)),
            ):
                a = np.load(os.path.join(d_s, f"{name}.npy"))
                b = np.load(os.path.join(d_f, f"{name}.npy"))
                np.testing.assert_array_equal(a, b)
    assert len(res_staged.al_added) > 0


def test_fused_round_propagates_writer_failure(tmp_path, monkeypatch):
    """A failed prob/pred artifact write inside the fused round's async writer
    thread must fail the ROUND (the staged pipeline propagates writer
    failures; silently losing dumps would corrupt a later resumed/staged
    run that reads them)."""
    import numpy

    from lidal_tpu.active.lidal_runner import run_fused_lidal_round
    from lidal_tpu.data.selection import save_sv_info
    from lidal_tpu.runtime.paths import Paths, ensure_dir
    from lidal_tpu.runtime.train import make_optimizer

    from lidal_tpu.data.pipeline import prepare_train_batch
    from lidal_tpu.runtime.train_loop import build_model

    n_frames, n_sv, seq = 3, 4, "00"
    rng = np.random.default_rng(5)
    names = [f"{i:06d}" for i in range(n_frames)]
    frames = {}
    for i in range(n_frames):
        n = int(P * 0.8)
        r = rng.uniform(2, 30, n)
        th = rng.uniform(0, 2 * np.pi, n)
        xyz = np.stack(
            [r * np.cos(th), r * np.sin(th), 0.1 * rng.standard_normal(n)], 1
        ).astype(np.float32)
        frames[names[i]] = (xyz, rng.random(n).astype(np.float32))

    cfg2 = dataclasses.replace(
        _cfg(tmp_path), metric_name="LiDAL", label_unit="sv", r_id=2,
        inf_reps=2, view_chunk=2,
    )
    paths = Paths(cfg2)
    p1 = Paths(dataclasses.replace(cfg2, r_id=1))
    grid_dir = ensure_dir(paths.grid_dir(seq))
    svi_dir = ensure_dir(paths.supervoxel_dir(seq, "KMeans"))
    svf_dir = ensure_dir(p1.sv_flag_dir(seq))
    gid = 0
    for i, name in enumerate(names):
        xyz = frames[name][0]
        np.savez_compressed(
            os.path.join(grid_dir, f"{name}.npz"),
            xyz=xyz + np.array([0.3 * i, 0, 0], np.float32),
        )
        point2sv = (np.arange(len(xyz), dtype=np.int32) * n_sv) // len(xyz)
        save_sv_info(
            os.path.join(svi_dir, f"{name}.npz"),
            point2sv,
            np.arange(gid, gid + n_sv, dtype=np.int64),
        )
        gid += n_sv
        np.save(
            os.path.join(svf_dir, f"{name}.npy"),
            np.full(n_sv, 1 if i == 0 else 0, np.int32),
        )

    model = build_model(cfg2)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    xyz0, sig0, valid0, labels0 = _points(1, seed=1)
    tb = prepare_train_batch(keys, xyz0, sig0, valid0, labels0, level_caps=CAPS)
    state = init_state(model, jax.random.PRNGKey(1), tb, make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(model, with_points=False)

    real_save = numpy.save

    def failing_save(file, arr, *a, **kw):
        if f"{os.sep}prob_map{os.sep}" in str(file):
            raise OSError("disk full (synthetic)")
        return real_save(file, arr, *a, **kw)

    monkeypatch.setattr(numpy, "save", failing_save)
    with pytest.raises(OSError, match="disk full"):
        run_fused_lidal_round(
            cfg2, eval_step, variables, lambda s, name: frames[name],
            train_split=(seq,), train_point_num=n_frames * P * 40,
            devices=jax.devices()[:1],
        )
