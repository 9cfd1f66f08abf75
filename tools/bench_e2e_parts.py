"""End-to-end inference decomposition with on-device scan timing (B=4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.data.augment import augment_and_voxelize
from lidal_tpu.data.pipeline import prepare_eval_batch
from lidal_tpu.models import MinkUNet
from lidal_tpu.ops.kernel_map import build_unet_plan
from tools.bench_suite import device_time

def synth(rng, n=120_000):
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


B, P = 4, 131072
caps = (131072, 49152, 16384, 6144, 2048)
rng = np.random.default_rng(0)
xyz = np.zeros((B, P, 3), np.float32)
sig = np.zeros((B, P), np.float32)
valid = np.zeros((B, P), bool)
for b in range(B):
    f = synth(rng)
    xyz[b, : len(f)] = f
    sig[b, : len(f)] = rng.random(len(f))
    valid[b, : len(f)] = True
xyz_j, sig_j, valid_j = jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid)

model = MinkUNet(num_classes=19)
keys0 = jax.random.split(jax.random.PRNGKey(0), B)
eb0 = prepare_eval_batch(keys0, xyz_j, sig_j, valid_j, level_caps=caps)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(1), eb0.feats, eb0.plan, train=False
)


def p(name, ms):
    print(f"{name:40s} {ms:8.2f} ms/batch", flush=True)


def keys_of(i):
    return jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), B)


# 1. augment + voxelize only
def aug_only(i, xyz, sig, valid):
    vf = jax.vmap(
        lambda k, x, s, v: augment_and_voxelize(k, x, s, v, caps[0], 20.0, 8192, True)
    )(keys_of(i), xyz, sig, valid)
    return vf.uv.coords, vf.feats


p("augment+voxelize (B=4)", device_time(aug_only, (xyz_j, sig_j, valid_j), iters=10))


# 2. + plan build
def aug_plan(i, xyz, sig, valid):
    vf = jax.vmap(
        lambda k, x, s, v: augment_and_voxelize(k, x, s, v, caps[0], 20.0, 8192, True)
    )(keys_of(i), xyz, sig, valid)
    plan = build_unet_plan(vf.uv.coords, vf.uv.valid, caps)
    return plan.levels[0].nbr3[:, :, :2], vf.feats


p("augment+voxelize+plan (B=4)", device_time(aug_plan, (xyz_j, sig_j, valid_j), iters=10))


# 3. forward only (prebuilt batch)
def fwd(i, feats, plan):
    f2 = feats + (i & 1).astype(feats.dtype) * 1e-30  # iteration dependence
    return model.apply(variables, f2, plan, train=False)[0]


p("forward only (B=4)", device_time(fwd, (eb0.feats, eb0.plan), iters=10))


# 4. full e2e
def e2e(i, xyz, sig, valid):
    eb = prepare_eval_batch(keys_of(i), xyz, sig, valid, level_caps=caps)
    return model.apply(variables, eb.feats, eb.plan, train=False)[0]


p("end-to-end (B=4)", device_time(e2e, (xyz_j, sig_j, valid_j), iters=10))
