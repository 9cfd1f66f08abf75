import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from lidal_tpu.tpu_init import setup
setup()
from lidal_tpu.ops.voxelize import unique_voxels
from lidal_tpu.ops.kernel_map import build_subm_nbr, build_unet_plan_frame

rng = np.random.default_rng(0)
N = 131072
n_pts = 200000
r = 2 + 78 * rng.random(n_pts) ** 1.5
th = rng.uniform(0, 2*np.pi, n_pts)
xyz = (np.stack([r*np.cos(th), r*np.sin(th), 0.05*rng.standard_normal(n_pts)], 1) * 20 + 4096)
pad = np.zeros((262144, 3), np.int32); pad[:n_pts] = xyz.astype(np.int32)
valid = np.zeros(262144, bool); valid[:n_pts] = True
uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(pad), jnp.asarray(valid), N)

def t_pull(name, fn, *args, iters=10):
    fn_j = jax.jit(fn)
    x = fn_j(*args); float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + fn_j(*args).ravel()[0].astype(jnp.float32)
    float(acc)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)

t_pull("build_subm_nbr (fused 26)", lambda c, v: build_subm_nbr(c, v)[:, :3], uv.coords, uv.valid)
caps = (131072, 49152, 16384, 6144, 2048)
t_pull("build_unet_plan_frame", lambda c, v: build_unet_plan_frame(c, v, caps).levels[0].nbr3[:, :3],
       uv.coords, uv.valid, iters=5)
