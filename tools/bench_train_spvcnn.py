"""SPVCNN train-step throughput, A/B-ing the point-branch backward:
scatter8_pallas (banded transposed gather-sum) vs the XLA scatter-add."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
import lidal_tpu.ops.pallas_gather8 as pg8
from lidal_tpu.data.pipeline import prepare_train_batch
from lidal_tpu.models import SPVCNN
from lidal_tpu.runtime.train import init_state, make_optimizer, make_train_step
from bench import synthetic_sk_frame

rng = np.random.default_rng(0)
B, P = 4, 131072
caps = (131072, 49152, 16384, 6144, 2048)
xyz = np.zeros((B, P, 3), np.float32)
sig = np.zeros((B, P), np.float32)
valid = np.zeros((B, P), bool)
labels = np.full((B, P), 255, np.int32)
for b in range(B):
    x, s = synthetic_sk_frame(rng, 120000)
    xyz[b, :120000], sig[b, :120000], valid[b, :120000] = x, s, True
    labels[b, :120000] = rng.integers(0, 19, 120000)
keys = jax.random.split(jax.random.PRNGKey(0), B)
tb = prepare_train_batch(
    keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid),
    jnp.asarray(labels), level_caps=caps, with_points=True,
)
model = SPVCNN(num_classes=19)
tx = make_optimizer()
state0 = init_state(model, jax.random.PRNGKey(1), tb, tx)

for label, flag in [("scatter8-pallas", True), ("xla-scatter", False)]:
    pg8.USE_PALLAS_BWD = flag
    step = jax.jit(make_train_step(model, tx, with_points=True))
    state, loss = step(state0, tb, jax.random.PRNGKey(2))
    print(f"{label}: first loss {float(loss):.4f}", flush=True)
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        state, loss = step(state, tb, jax.random.PRNGKey(3 + rep))
        _ = float(loss)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: best step {best:.2f}s -> {B * 120000 / best / 1e3:.0f}k pts/s", flush=True)
