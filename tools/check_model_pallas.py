"""Model-level Pallas-vs-XLA parity on the real TPU: forward logits + one
train-step loss/grad-norm for MinkUNet at SemanticKITTI scale, with every conv
(subm/down/up, fwd+bwd) routed through the banded Pallas kernel vs the XLA
gather path."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.data.pipeline import prepare_train_batch
from lidal_tpu.models import MinkUNet
from lidal_tpu.ops import conv as conv_mod
from lidal_tpu.runtime.train import cross_entropy_ignore


def synth_frame(rng, n=120_000):
    n_g = int(n * 0.6)
    n_w = n - n_g
    r = 2 + 78 * rng.random(n_g) ** 1.5
    th = rng.uniform(0, 2 * np.pi, n_g)
    ground = np.stack([r * np.cos(th), r * np.sin(th), 0.05 * rng.standard_normal(n_g)], 1)
    cx, cy = rng.uniform(-60, 60, (2, 24))
    wi = rng.integers(0, 24, n_w)
    walls = np.stack(
        [cx[wi] + rng.normal(scale=2.0, size=n_w), cy[wi] + rng.normal(scale=2.0, size=n_w), rng.uniform(0, 4, n_w)], 1
    )
    return np.concatenate([ground, walls]).astype(np.float32)


B, P = 2, 131072
caps = (131072, 49152, 16384, 6144, 2048)
rng = np.random.default_rng(0)
xyz = np.zeros((B, P, 3), np.float32)
sig = np.zeros((B, P), np.float32)
valid = np.zeros((B, P), bool)
labels = np.full((B, P), 255, np.int32)
for b in range(B):
    f = synth_frame(rng)
    xyz[b, : len(f)] = f
    sig[b, : len(f)] = rng.random(len(f))
    valid[b, : len(f)] = True
    labels[b, : len(f)] = rng.integers(0, 19, len(f))

keys = jax.random.split(jax.random.PRNGKey(0), B)
tb = prepare_train_batch(
    keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid), jnp.asarray(labels),
    level_caps=caps,
)
model = MinkUNet(num_classes=19)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(1), tb.feats, tb.plan, train=False
)


def loss_fn(params, bs):
    (logits, _), upd = model.apply(
        {"params": params, "batch_stats": bs},
        tb.feats,
        tb.plan,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    return cross_entropy_ignore(logits, tb.labels)


results = {}
for use_pallas in (True, False):
    conv_mod.USE_PALLAS = use_pallas
    fwd = jax.jit(lambda v: model.apply(v, tb.feats, tb.plan, train=False)[0])
    grad = jax.jit(lambda p, bs: jax.value_and_grad(loss_fn)(p, bs))
    t0 = time.perf_counter()
    logits = fwd(variables)
    logits.block_until_ready()
    print(f"pallas={use_pallas} fwd compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    loss, g = grad(variables["params"], variables["batch_stats"])
    gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(g)))
    results[use_pallas] = (np.asarray(logits), float(loss), float(gn))
    print(f"pallas={use_pallas} loss={float(loss):.6f} gradnorm={float(gn):.4f}", flush=True)
conv_mod.USE_PALLAS = None

la, lb = results[True][0], results[False][0]
scale = np.abs(lb).max()
print("logits rel err:", np.abs(la - lb).max() / scale, flush=True)
print("loss diff:", abs(results[True][1] - results[False][1]), flush=True)
print("gradnorm rel diff:", abs(results[True][2] - results[False][2]) / (results[False][2] + 1e-9), flush=True)
assert np.abs(la - lb).max() / scale < 0.05
assert abs(results[True][1] - results[False][1]) < 0.02
print("PARITY OK", flush=True)
