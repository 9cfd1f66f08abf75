"""Honest plan-build decomposition (consumes EVERY output leaf so XLA cannot
DCE any stage; the e2e-parts probe's plan number only kept one leaf)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.data.augment import augment_and_voxelize
from lidal_tpu.ops.batching import map_frames
from lidal_tpu.ops.kernel_map import build_down, build_subm_nbr_batched, build_unet_plan
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

keys = jax.random.split(jax.random.PRNGKey(0), B)
vf = jax.jit(
    jax.vmap(lambda k, x, s, v: augment_and_voxelize(k, x, s, v, caps[0], 20.0, 8192, True))
)(keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid))
coords0, valid0 = vf.uv.coords, vf.uv.valid


def consume(tree):
    acc = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(tree):
        acc = acc + leaf.ravel()[0].astype(jnp.float32) + leaf.ravel()[-1].astype(jnp.float32)
    return acc


def pert(i, c):
    return c + (i & 1)


def p(name, ms):
    print(f"{name:44s} {ms:8.2f} ms/batch", flush=True)


# full plan, every leaf consumed
p(
    "full plan (ALL leaves)",
    device_time(lambda i, c, v: consume(build_unet_plan(pert(i, c), v, caps)), (coords0, valid0), iters=10),
)

# per-level: subm nbr build on the level-l coord sets
cur_c, cur_v = coords0, valid0
level_sets = [(cur_c, cur_v)]
for l in range(len(caps) - 1):
    uvc, down = jax.jit(
        lambda c, v, cc=caps[l + 1]: map_frames(lambda cc_, vv_: build_down(cc_, vv_, cc), c, v)
    )(cur_c, cur_v)[0], None
    cur_c, cur_v = uvc.coords, uvc.valid
    level_sets.append((cur_c, cur_v))

for l, (c, v) in enumerate(level_sets):
    p(
        f"subm nbr build L{l} (cap {c.shape[1]})",
        device_time(lambda i, c_, v_: consume(build_subm_nbr_batched(pert(i, c_), v_)), (c, v), iters=10),
    )

for l in range(len(caps) - 1):
    c, v = level_sets[l]
    p(
        f"down build L{l}->L{l+1}",
        device_time(
            lambda i, c_, v_, cc=caps[l + 1]: consume(
                map_frames(lambda cc_, vv_: build_down(cc_, vv_, cc), pert(i, c_), v_)
            ),
            (c, v),
            iters=10,
        ),
    )
