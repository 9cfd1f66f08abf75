import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.conv import subm_conv
from lidal_tpu.ops.kernel_map import build_subm_nbr
from lidal_tpu.ops.pallas_conv import subm_conv_pallas
from lidal_tpu.ops.voxelize import unique_voxels

rng = np.random.default_rng(0)
N = 131072
n_pts = 200000
r = 2 + 78 * rng.random(n_pts) ** 1.5
th = rng.uniform(0, 2 * np.pi, n_pts)
ground = np.stack([r * np.cos(th), r * np.sin(th), 0.05 * rng.standard_normal(n_pts)], 1)
xyz = (ground * 20 + 4096).astype(np.float32)
pad = np.zeros((262144, 3), np.int32)
pad[:n_pts] = xyz.astype(np.int32)
valid = np.zeros(262144, bool)
valid[:n_pts] = True
uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(pad), jnp.asarray(valid), N)
print("unique:", int(uv.num_unique), flush=True)
nbr = jax.jit(build_subm_nbr)(uv.coords, uv.valid)
print("mean tap hit rate:", float((np.asarray(nbr) < N).mean()), flush=True)

cin, cout, K = 32, 32, 27
feats = jnp.asarray(rng.normal(size=(N, cin)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32) * 0.1)
outp = subm_conv_pallas(feats, w, nbr)
outx = subm_conv(feats, w, nbr)
print("rel err:", float(jnp.max(jnp.abs(outp - outx)) / (jnp.max(jnp.abs(outx)) + 1e-9)), flush=True)


def t_pull(name, fn, iters=20):
    x = fn()
    float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + fn()[0, 0]
    float(acc)
    print(f"{name:42s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


import lidal_tpu.ops.conv as conv_mod

def xla_conv(f, ww, i):
    conv_mod.USE_PALLAS = False
    try:
        return conv_mod.subm_conv(f, ww, i)
    finally:
        conv_mod.USE_PALLAS = None

t_pull("pallas conv c32 (1st)", lambda: subm_conv_pallas(feats, w, nbr))
t_pull("xla conv c32", lambda: xla_conv(feats, w, nbr))
t_pull("pallas conv c32 (2nd)", lambda: subm_conv_pallas(feats, w, nbr))
cin2 = cout2 = 96
feats2 = jnp.asarray(rng.normal(size=(N, cin2)).astype(np.float32))
w2 = jnp.asarray(rng.normal(size=(K, cin2, cout2)).astype(np.float32) * 0.05)
t_pull("pallas conv c96", lambda: subm_conv_pallas(feats2, w2, nbr))
t_pull("xla conv c96", lambda: xla_conv(feats2, w2, nbr))
