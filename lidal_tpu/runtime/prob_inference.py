"""Multi-view probability inference over the train split.

Reference parity: ``score/prob_inference.py:21-133`` — for every train frame run
``inf_reps`` (8) independently-augmented forward passes, softmax, average over
views, save per-point ``prob_map`` / ``pred`` / optional ``outfeat`` npy per
(seq, frame).  TPU-natively the 8 views are a vmapped leading axis prepared and
reduced entirely on device; only the final [P, C] arrays cross to host for saving.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidal_tpu.config import RunConfig
from lidal_tpu.data.pipeline import prepare_eval_batch
from lidal_tpu.runtime.evaluate import project_logits_to_points
from lidal_tpu.runtime.paths import Paths, ensure_dir


def wants_outfeat(cfg: RunConfig) -> bool:
    """reference prob_inference.py:103,116,131: r0 or metric in {ReDAL, CSET}."""
    return cfg.r_id == 0 or cfg.metric_name in ("ReDAL", "CSET")


def make_multiview_fn(cfg: RunConfig, eval_step: Callable):
    """Builds jitted (variables, keys [R], xyz [P,3], sig, valid) ->
    (prob_mean [P,C] f32, pred [P] i32, outfeat_mean [P,F] f32)."""
    data = cfg.data

    @jax.jit
    def run(variables, keys, xyz, sig, valid):
        reps = keys.shape[0]
        xyz_r = jnp.broadcast_to(xyz, (reps,) + xyz.shape)
        sig_r = jnp.broadcast_to(sig, (reps,) + sig.shape)
        val_r = jnp.broadcast_to(valid, (reps,) + valid.shape)
        eb = prepare_eval_batch(
            keys,
            xyz_r,
            sig_r,
            val_r,
            level_caps=data.level_caps,
            scale=data.scale,
            full_scale=data.full_scale,
            with_points=cfg.is_spvcnn,
        )
        if cfg.is_spvcnn:
            logits, feat = eval_step(variables, eb.feats, eb.plan, eb.pplan)
        else:
            logits, feat = eval_step(variables, eb.feats, eb.plan)
        logits_p = jax.vmap(project_logits_to_points)(logits, eb.inverse)  # [R, P, C]
        prob = jax.nn.softmax(logits_p.astype(jnp.float32), axis=-1)
        prob_mean = prob.mean(axis=0)
        pred = jnp.argmax(prob_mean, axis=-1).astype(jnp.int32)
        feat_p = jax.vmap(project_logits_to_points)(feat, eb.inverse).astype(jnp.float32)
        feat_mean = feat_p.mean(axis=0)
        return prob_mean, pred, feat_mean

    return run


def run_prob_inference(
    cfg: RunConfig,
    eval_step: Callable,
    variables,
    files: Sequence[str],
    read_fn: Callable,  # path -> (xyz, sig, labels-or-None)
    frame_id_fn: Callable,  # path -> (seq, frame)
    point_cap: Optional[int] = None,
    save: bool = True,
    verbose: bool = False,
):
    """Run the full multi-view dump; returns {(seq, frame): (prob, pred, feat|None)}
    when ``save`` is False (for tests), else writes npy files and returns None."""
    from lidal_tpu.data.pipeline import pad_points

    paths = Paths(cfg)
    data = cfg.data
    cap = point_cap or data.point_cap
    with_feat = wants_outfeat(cfg)
    fn = make_multiview_fn(cfg, eval_step)
    rng = jax.random.PRNGKey(cfg.seed)
    results = {} if not save else None

    for path in files:
        xyz, sig, _ = read_fn(path)
        n = len(xyz)
        oxyz, osig, ovalid, _ = pad_points(xyz, sig, None, cap)
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, cfg.inf_reps)
        prob, pred, feat = fn(variables, keys, jnp.asarray(oxyz), jnp.asarray(osig), jnp.asarray(ovalid))
        prob = np.asarray(prob)[:n]
        pred = np.asarray(pred)[:n]
        feat_np = np.asarray(feat)[:n] if with_feat else None
        seq, frame = frame_id_fn(path)
        if save:
            np.save(os.path.join(ensure_dir(paths.prob_dir(seq)), f"{frame}.npy"), prob)
            np.save(os.path.join(ensure_dir(paths.pred_dir(seq)), f"{frame}.npy"), pred)
            if with_feat:
                np.save(os.path.join(ensure_dir(paths.outfeat_dir(seq)), f"{frame}.npy"), feat_np)
        else:
            results[(seq, frame)] = (prob, pred, feat_np)
        if verbose:
            print(f"Processing {seq}/{frame}")
    return results
