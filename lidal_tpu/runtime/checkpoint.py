"""Checkpointing with round warm-start semantics.

Reference behavior (``train.py:59-87,148-155``): save {model_state, iteration,
ep_id} to ``<dir>/current.pt`` every 500 iters; on start, resume same-round
``current`` if present, else warm-start weights (not optimizer/step) from the
previous round (round 1 from ``0r``).  Here the checkpoint is an orbax PyTree of
{params, batch_stats, opt_state, step, ep_id} at ``<dir>/current``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from lidal_tpu.runtime.paths import Paths, ensure_dir
from lidal_tpu.runtime.train import TrainState


def _ckpt_path(directory: str) -> str:
    return os.path.abspath(os.path.join(directory, "current"))


def save_checkpoint(directory: str, state: TrainState, ep_id: int) -> None:
    ensure_dir(directory)
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "ep_id": ep_id,
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_path(directory), tree, force=True)


def restore_checkpoint(directory: str, template: TrainState) -> Optional[Tuple[TrainState, int]]:
    """Full resume (params + opt state + step).  Returns None if absent."""
    path = _ckpt_path(directory)
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    tmpl = {
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
        "step": template.step,
        "ep_id": 0,
    }
    tree = ckptr.restore(path, item=tmpl)
    state = TrainState(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
    return state, int(tree["ep_id"])


def restore_weights(directory: str, template: TrainState) -> Optional[TrainState]:
    """Warm start: weights + BN stats only, fresh optimizer/step (train.py:73-85)."""
    restored = restore_checkpoint(directory, template)
    if restored is None:
        return None
    full, _ = restored
    return template._replace(params=full.params, batch_stats=full.batch_stats)


def resume_or_warm_start(paths: Paths, template: TrainState) -> Tuple[TrainState, int]:
    """The reference's resume policy: same-round current -> previous round -> fresh."""
    r = restore_checkpoint(paths.ckpt_dir(), template)
    if r is not None:
        return r
    if paths.cfg.r_id > 0:
        warm = restore_weights(paths.warm_start_ckpt_dir(), template)
        if warm is not None:
            return warm, 0
    return template, 0


def variables_of(state: TrainState) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats}


def device_get_state(state: TrainState) -> TrainState:
    return jax.device_get(state)
