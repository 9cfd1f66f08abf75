"""pjit'd training: Adam + masked cross-entropy, data-parallel over the mesh.

Replaces the reference's DDP loop (``train.py:17-160``): gradient all-reduce,
loss averaging, and BN statistics all become XLA collectives inserted by the
compiler from sharding annotations — no wrapper module, no explicit NCCL calls.
Optimizer matches ``optim.Adam(model.parameters())`` defaults
(lr=1e-3, betas=(0.9, 0.999), eps=1e-8 — reference ``train.py:56``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from lidal_tpu.data.pipeline import IGNORE_LABEL, TrainBatch


class TrainState(NamedTuple):
    step: jnp.ndarray  # [] int32
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, axis_name: Optional[str] = None
) -> jnp.ndarray:
    """Mean CE over labels != 255 (reference ``train.py:136``:
    F.cross_entropy(ignore_index=255, reduction='mean')).

    With ``axis_name`` (data-parallel shard_map) the mean is over the GLOBAL
    valid count: the local value is local_sum / global_count, so psumming the
    per-shard losses (and gradients) reproduces the single-device step exactly.
    """
    mask = (labels != IGNORE_LABEL).astype(jnp.float32)
    safe_labels = jnp.where(labels == IGNORE_LABEL, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    cnt = mask.sum()
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
    return (nll * mask).sum() / jnp.maximum(cnt, 1.0)


def init_state(model, rng, batch: TrainBatch, tx: optax.GradientTransformation) -> TrainState:
    # Always jit the init: un-jitted tracing dispatches thousands of tiny ops
    # one-by-one (minutes over the remote-compile TPU tunnel).
    init = jax.jit(model.init, static_argnames=("train",))
    if batch.pplan is not None:
        variables = init(rng, batch.feats, batch.plan, batch.pplan, train=False)
    else:
        variables = init(rng, batch.feats, batch.plan, train=False)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
    )


def make_train_step(
    model, tx: optax.GradientTransformation, with_points: bool, axis_name: Optional[str] = None
):
    """Returns train_step(state, batch, dropout_rng) -> (state, loss).

    Without ``axis_name``: jit/pjit-able single-device step.  With it: the
    per-shard body for a data-parallel ``shard_map`` — gradients and the loss
    psum over the mesh axis (the TPU-native DDP all-reduce; reference
    ``train.py:49-53``), and the model must be built with the same ``bn_axis``
    so batch statistics sync too.  The sharded step then matches the
    single-device step bit-for-modulo-reduction-order.
    """

    def train_step(
        state: TrainState,
        batch: TrainBatch,
        dropout_rng: jax.Array,
        dropout_keys: jax.Array | None = None,  # [B] per-frame keys (SPVCNN only)
    ):
        def loss_fn(params):
            var_in = {"params": params, "batch_stats": state.batch_stats}
            args = (batch.feats, batch.plan) + ((batch.pplan,) if with_points else ())
            kw = {"dropout_keys": dropout_keys} if with_points and dropout_keys is not None else {}
            (logits, _), updates = model.apply(
                var_in,
                *args,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
                **kw,
            )
            loss = cross_entropy_ignore(logits, batch.labels, axis_name)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            loss = jax.lax.psum(loss, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            loss,
        )

    return train_step


def make_eval_step(model, with_points: bool):
    """Returns eval_step(variables, feats, plan[, pplan]) -> (logits, feats96)."""

    def eval_step(variables, feats, plan, pplan: Optional[Any] = None):
        args = (feats, plan) + ((pplan,) if with_points else ())
        return model.apply(variables, *args, train=False)

    return eval_step
