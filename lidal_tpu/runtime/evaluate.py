"""Validation driver: voxel->point projection + device confusion matrix + mIoU.

Reference parity: ``evaluate.py:18-128`` — val loader (2x batch), forward, project
logits through the voxelization inverse, confusion over gt < 100, all-reduce, table
print.  The confusion matrix is accumulated on device (a [C, C] int32), and under a
mesh the per-shard sums combine via compiler-inserted psum — the explicit
``dist.all_reduce`` (evaluate.py:117-119) disappears.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidal_tpu.config import RunConfig
from lidal_tpu.data.loader import FrameBatchLoader
from lidal_tpu.data.pipeline import prepare_eval_batch
from lidal_tpu.utils.iou import confusion_matrix, evaluate as print_iou


def project_logits_to_points(logits_v: jnp.ndarray, inverse: jnp.ndarray) -> jnp.ndarray:
    """[cap0, C] voxel logits -> [P, C] point logits via the dedup inverse
    (reference evaluate.py:104-107); sentinel rows gather zeros."""
    ext = jnp.concatenate([logits_v, jnp.zeros_like(logits_v[:1])], axis=0)
    return ext[inverse]


@partial(jax.jit, static_argnames=("num_classes",))
def batch_confusion(
    logits_v: jnp.ndarray,  # [B, cap0, C]
    inverse: jnp.ndarray,  # [B, P]
    point_valid: jnp.ndarray,  # [B, P]
    labels_p: jnp.ndarray,  # [B, P]
    num_classes: int,
) -> jnp.ndarray:
    logits_p = jax.vmap(project_logits_to_points)(logits_v, inverse)
    pred = jnp.argmax(logits_p, axis=-1).astype(jnp.int32)
    gt = jnp.where(point_valid, labels_p, 255)
    return confusion_matrix(pred.reshape(-1), gt.reshape(-1), num_classes)


def make_eval_conf_fn(cfg: RunConfig, eval_step: Callable, n_devices: Optional[int] = None):
    """(variables, keys, xyz, sig, valid, labels) -> confusion [C, C].

    With >1 device the batch shards over a data mesh and the per-shard
    confusion matrices psum over ICI — the TPU-native form of the reference's
    explicit ``dist.all_reduce`` (``evaluate.py:117-119``)."""
    data = cfg.data
    c = data.num_classes

    def one(variables, keys, xyz, sig, valid, labels):
        eb = prepare_eval_batch(
            keys,
            xyz,
            sig,
            valid,
            level_caps=data.level_caps,
            scale=data.scale,
            full_scale=data.full_scale,
            with_points=cfg.is_spvcnn,
        )
        if cfg.is_spvcnn:
            logits, _ = eval_step(variables, eb.feats, eb.plan, eb.pplan)
        else:
            logits, _ = eval_step(variables, eb.feats, eb.plan)
        return batch_confusion(logits, eb.inverse, eb.point_valid, labels, c), eb.overflow.sum()

    n_dev = n_devices if n_devices is not None else jax.device_count()
    if n_dev > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from lidal_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:n_dev])

        def sharded(variables, keys, xyz, sig, valid, labels):
            conf, ovf = one(variables, keys, xyz, sig, valid, labels)
            return jax.lax.psum(conf, "data"), jax.lax.psum(ovf, "data")

        return jax.jit(
            shard_map(
                sharded,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data")),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )
    return jax.jit(one)


# Batches between deferred overflow-warning drains in run_eval: large enough
# that the drained scalars belong to long-retired dispatches (no pipeline
# stall), small enough that a long eval is never blind to overflow for more
# than ~a minute of batches.
_OVF_DRAIN = 64


def run_eval(
    cfg: RunConfig,
    eval_step: Callable,  # (variables, feats, plan[, pplan]) -> (logits, feat96)
    variables,
    loader: FrameBatchLoader,
    seed: int = 1,
    verbose: bool = True,
    n_devices: Optional[int] = None,
) -> float:
    """Evaluate over a val loader; returns mean IoU.  Batches shard over all
    local devices (size the loader's batch accordingly).

    Capacity-overflow warnings are DEFERRED: pulling the per-batch overflow
    scalar immediately would host-sync every dispatch, so warnings drain in
    windows of ``_OVF_DRAIN`` batches (the drained scalars are from already-
    retired batches, so the pull is cheap) and the final partial window after
    the loop — an in-flight run goes at most ``_OVF_DRAIN`` batches without
    an overflow signal."""
    data = cfg.data
    c = data.num_classes
    conf_fn = make_eval_conf_fn(cfg, eval_step, n_devices)
    conf = jnp.zeros((c, c), jnp.int32)
    ovfs: list = []
    rng = jax.random.PRNGKey(seed)
    start = time.time()

    def drain_ovfs() -> None:
        for bi, ovf, trunc in ovfs:
            if int(ovf) or trunc:
                print(
                    f"WARNING: capacity overflow (voxels {int(ovf)}, "
                    f"points {trunc}) in eval batch {bi}"
                )
        ovfs.clear()

    for bi, batch in enumerate(loader):
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, batch["xyz"].shape[0])
        bconf, ovf = conf_fn(
            variables,
            keys,
            jnp.asarray(batch["xyz"]),
            jnp.asarray(batch["sig"]),
            jnp.asarray(batch["valid"]),
            jnp.asarray(batch["labels"]),
        )
        conf = conf + bconf
        # do NOT pull ovf here: a host sync per batch would serialize dispatch
        # (the next batch can't be enqueued while this one drains); stale
        # entries drain in windows instead, bounding both the warning-blind
        # stretch and the retained device scalars.
        ovfs.append((bi, ovf, batch.get("trunc_points", 0)))
        if len(ovfs) >= _OVF_DRAIN:
            drain_ovfs()
    conf_np = np.asarray(jax.device_get(conf))
    drain_ovfs()
    if verbose:
        miou = print_iou(conf_np)
        print(time.time() - start)
    else:
        from lidal_tpu.utils.iou import per_class_iou

        iou, _, _ = per_class_iou(conf_np)
        miou = float(np.nan_to_num(iou, nan=0.0).mean())
    return miou
