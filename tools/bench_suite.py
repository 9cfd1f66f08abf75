"""Measurement harness encoding the axon-TPU timing methodology (BENCH_NOTES):

* the measured loop lives ON DEVICE (``lax.scan``) — per-call dispatch through
  the tunneled backend costs ~1 ms-1 s and is orchestration, not op time;
* the benched function receives the iteration index and must fold it into its
  inputs (e.g. shift all keys by ``i & 1``) so XLA cannot CSE the iterations;
  the carry accumulates a scalar from every output so nothing is dead;
* completion is forced by pulling the final scalar to the host
  (``block_until_ready`` can return early on this backend);
* the loop is timed ``reps`` times and the best rep wins (queued warmup work
  pollutes the first timing after compilation).

Usage::

    from tools.bench_suite import device_time
    ms = device_time(lambda i, x: my_op(x + (i & 1)), (x0,), iters=50)
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _to_scalar(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + leaf.ravel()[0].astype(jnp.float32)
    return acc


def device_time(
    fn: Callable,
    args: Sequence,
    iters: int = 50,
    reps: int = 2,
) -> float:
    """Milliseconds per call of ``fn(i, *args)``, measured via an on-device scan.

    ``fn`` MUST make its computation depend on the int32 iteration index ``i``
    (a cheap input perturbation that preserves validity), or XLA will hoist the
    whole body out of the loop.
    """

    @jax.jit
    def run(args):
        def step(carry, i):
            out = fn(i, *args)
            return carry + _to_scalar(out), None

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return acc

    args = tuple(jnp.asarray(a) if hasattr(a, "shape") else a for a in args)
    float(run(args))  # compile + drain
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    return best
